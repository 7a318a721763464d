package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` deterministic global shuffle + shard assignment — the final
  * serving step of a training-data pipeline: the corpus must reach the
  * trainer in a reproducible pseudo-random order, cut into N shard
  * files a data-loader can stream independently. `orderBy(rand(seed))`
  * fails both requirements (the draw sequence depends on partitioning,
  * and a single global sort is the one thing you never do to 100 TB);
  * hashing each id gives both: order IS md5("shuf:<seed>:" + id), so
  * any engine, any partitioning, any rerun produces the same
  * permutation, and a new seed is a fresh epoch-independent permutation.
  *
  * Scale shape: shard = hash prefix mod N is a narrow map; the only
  * wide op is ONE hash-partitioned exchange on `shard` and a per-shard
  * sort for positions (each shard is corpus/N — executor-sized by
  * choosing N, exactly how the shard files must come out anyway). There
  * is deliberately NO global position column: a corpus-wide row_number
  * is a single-partition window (the anti-pattern q_collocations'
  * vocabulary window avoids); (shard, pos) is already a total order —
  * readers interleave shards round-robin, which is itself a fixed
  * permutation.
  */
object GlobalShuffle extends QueryPack {

  /** Per-document assignment: (…, skey, shard, pos) with pos dense
    * 1..|shard| in hash order. `seed` names the epoch permutation.
    */
  def shuffleAssignments(docs: DataFrame, seed: String = "epoch0",
                         nShards: Int = 8,
                         idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("skey",
        md5(concat(lit(s"shuf:$seed:"), col(idCol).cast("string"))
          .cast("binary")))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 8), 16, 10).cast("long")
          % nShards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("skey"), col(idCol))))

  /** One task sorts and writes one whole shard, so the shard size is the
    * unit of executor memory/disk this operator commits to. Default
    * ~4M rows/shard (a few GB of typical documents) — tune to the
    * deployment, but never let it follow the corpus unbounded.
    */
  val defaultTargetRowsPerShard = 4000000L

  /** Shard count that holds every shard under `targetRowsPerShard` for a
    * corpus of `nRows` — how `nShards` should be derived, so a 100×
    * corpus gets 100× shards rather than 100× shard size.
    */
  def shardsFor(nRows: Long,
                targetRowsPerShard: Long = defaultTargetRowsPerShard): Int = {
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    math.max(1L, math.min(Int.MaxValue.toLong,
      (nRows + targetRowsPerShard - 1) / targetRowsPerShard)).toInt
  }

  /** Materialize the shuffle as shard files: one directory per shard,
    * rows already in serving order (`repartition` on the shard key +
    * in-partition sort, so each output file streams its shard's
    * permutation without any reader-side sort). Returns the shard count
    * used. `nShards = 0` (default) derives it from the corpus row count
    * via [[shardsFor]]; an explicit `nShards` is GUARDED against the
    * corpus — a caller can no longer ask 8 shards of a 100 TB corpus
    * and hand one task a 12 TB sort.
    */
  def writeShards(docs: DataFrame, path: String, seed: String = "epoch0",
                  nShards: Int = 0, idCol: String = "doc_id",
                  targetRowsPerShard: Long = defaultTargetRowsPerShard): Int = {
    val nRows = docs.count()
    val shards =
      if (nShards <= 0) shardsFor(nRows, targetRowsPerShard)
      else {
        require(nRows / nShards <= targetRowsPerShard,
          s"nShards=$nShards puts ~${nRows / nShards} rows in one task's " +
            s"sort (target $targetRowsPerShard); use nShards >= " +
            s"${shardsFor(nRows, targetRowsPerShard)} or raise targetRowsPerShard")
        nShards
      }
    shuffleAssignments(docs, seed, shards, idCol)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shards
  }

  /** Driver query: the per-shard serving manifest — size, the first
    * document each loader will see, and an exact order checksum
    * (Σ pos·(doc_id+1) — any transposition of the permutation changes
    * it) the oracle recomputes from its own md5 ordering.
    */
  def globalShuffleQuery(s: SparkSession, dir: String): DataFrame =
    shuffleAssignments(Tables.documents(s, dir))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(when(col("pos") === 1, col("doc_id"))).as("first_doc"),
        sum(col("pos") * (col("doc_id") + 1L)).as("order_checksum"))
      .orderBy(col("shard"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_global_shuffle" -> (globalShuffleQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_global_shuffle" ->
      """WITH a AS (
        |  SELECT doc_id, md5(concat('shuf:epoch0:', doc_id::VARCHAR)) AS skey
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, skey,
        |    CAST(('0x' || substring(skey, 1, 8)) AS BIGINT) % 8 AS shard
        |  FROM a
        |), p AS (
        |  SELECT doc_id, shard, row_number() OVER (
        |    PARTITION BY shard ORDER BY skey, doc_id) AS pos
        |  FROM b
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc,
        |  CAST(sum(pos * (doc_id + 1)) AS BIGINT) AS order_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin)
}
