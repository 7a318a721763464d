package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` partition-scoped parquet upsert — MERGE INTO for a plain
  * partitioned table, without a table format: new/changed rows replace
  * same-key rows, and ONLY partitions the update batch touches are
  * rewritten. The daily-fact-refresh shape: at 100 TB a delta touching
  * yesterday's partition must not rewrite (or even read) the other
  * 3 650.
  *
  * Per affected partition (affected = distinct partition values in the
  * update batch — the ONLY driver-side list, partition-count-bounded,
  * never row-scale):
  *
  *  1. read THAT partition (partition-pruned scan — untouched partitions
  *     contribute zero IO);
  *  2. anti-join out keys the batch replaces, union the batch's rows for
  *     that partition;
  *  3. write to a staging sibling, then swap atomically via a
  *     two-rename discipline: park live dir as `__ups_old_<part>`,
  *     rename staging in, delete the parked copy.
  *
  * Crash recovery: a parked
  * `__ups_old_` whose live dir is missing marks a crash between the
  * renames — renamed back, the upsert of that partition simply didn't
  * happen (the batch is re-appliable: upsert is idempotent per batch).
  * One whose live dir exists is cleanup debris — removed. Stale staging
  * dirs are always safe to remove. [[openMergedTable]] heals on the
  * read path, so a crashed swap is fixed by the first reader.
  *
  * An update row may MOVE a key across partitions (the partition value
  * is part of the row, not the match condition). Movers whose old
  * partition is itself in the batch's affected set are handled by the
  * anti-join; movers whose OLD partition would otherwise be untouched
  * were the classic silent gap of partition-scoped merging (Hive/Delta
  * dynamic-partition overwrite shares it): the stale row survived as a
  * duplicate key. [[upsertByKey]] now DETECTS them — one column-pruned
  * (key, partition) scan of the unaffected partitions, semi-joined to
  * the batch's keys — and AUTO-WIDENS the affected set with the old
  * partitions it finds, so the stale copies are anti-joined out. The
  * detection scan reads two columns of the rest of the table (cheap in
  * columnar storage, zero rewrite for clean batches); callers that can
  * PROVE keys never change partition (e.g. the partition value is
  * derived from the key) can pass `detectMovers = false` to skip it.
  */
object Upsert extends QueryPack {

  /** Apply `updates` to the partitioned table at `dir`. Returns
    * (partitions rewritten, rows replaced, rows inserted).
    */
  def upsertByKey(spark: SparkSession, dir: String, updates: DataFrame,
                  keyCol: String, partCol: String,
                  detectMovers: Boolean = true,
                  knownSchema: Option[org.apache.spark.sql.types.StructType] = None): (Long, Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverUpsertLeftovers(fs, dir, partCol)
    val batchParts = updates.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // ONE resolution of the pre-upsert table shared by the movers scan
    // and the merge target: both must read the SAME immutable pre-swap
    // state, and a second spark.read.parquet(dir) would re-list and
    // re-infer the partitioned layout on the driver for no new facts.
    // `knownSchema` (callers that know the table's fixed layout — the
    // upsert preserves schema by construction) additionally skips the
    // footer-merge inference JOB the schema-less reader runs per call.
    val current = knownSchema.fold(spark.read)(st => spark.read.schema(st))
      .parquet(dir)
    // cross-partition movers: batch keys still living in partitions the
    // batch doesn't name — widen the affected set so their stale copies
    // are anti-joined out instead of surviving as duplicate keys. The
    // scan is column-pruned to (key, partition) over the complement.
    val moverParts =
      if (!detectMovers) Seq.empty
      else current
        .filter(!col(partCol).isin(batchParts: _*))
        .select(col(keyCol), col(partCol))
        .join(updates.select(col(keyCol)), Seq(keyCol), "left_semi")
        .select(col(partCol)).distinct()
        .collect().map(_.get(0)).toSeq
    val parts = batchParts ++ moverParts
    val target = current
      .filter(col(partCol).isin(parts: _*)) // partition-pruned
    val nReplaced = target.join(updates.select(col(keyCol)), Seq(keyCol),
      "left_semi").count()
    val nInserted = updates.count() - nReplaced
    val merged = target
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
    val stage = s"${dir.stripSuffix("/")}__ups_tmp_${java.util.UUID.randomUUID.toString.take(8)}"
    merged.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(stage)
    for (p <- parts) {
      // Spark escapes partition values on write (space, '/', '%', ':',
      // …) — build swap paths from the SAME escaping or the renames
      // target nonexistent dirs for any value outside [A-Za-z0-9_]
      val pe = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(String.valueOf(p))
      val live = new Path(dir, s"$partCol=$pe")
      val staged = new Path(stage, s"$partCol=$pe")
      val old = new Path(s"${dir.stripSuffix("/")}__ups_old_$pe")
      if (fs.exists(live))
        require(fs.rename(live, old), s"upsert: could not park $live")
      if (fs.exists(staged)) // a partition can lose all rows only by moving keys out
        require(fs.rename(staged, live), s"upsert: could not move $staged in")
      fs.delete(old, true)
    }
    fs.delete(new Path(stage), true)
    // the session's FileStatusCache still lists the pre-swap files for
    // this path; any reader planned after the swap would hit
    // FILE_NOT_EXIST without this
    spark.catalog.refreshByPath(dir)
    (parts.size.toLong, nReplaced, nInserted)
  }

  /** Read-path open that heals a crashed swap first (one listStatus
    * when clean). [[SnapshotTable]] is the alternative that needs no
    * healing at all — commits publish atomically or not at all.
    */
  def openMergedTable(spark: SparkSession, dir: String, partCol: String,
                      knownSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverUpsertLeftovers(fs, dir, partCol)
    spark.catalog.refreshByPath(dir)
    knownSchema.fold(spark.read)(st => spark.read.schema(st)).parquet(dir)
  }

  private[graft] def recoverUpsertLeftovers(
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      partCol: String): Unit = {
    val parent = new Path(dir.stripSuffix("/")).getParent
    if (parent == null || !fs.exists(parent)) return
    val base = new Path(dir.stripSuffix("/")).getName
    fs.listStatus(parent).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"${base}__ups_old_")) {
        val part = name.stripPrefix(s"${base}__ups_old_")
        val live = new Path(dir, s"$partCol=$part")
        if (!fs.exists(live)) require(fs.rename(st.getPath, live),
          s"upsert recovery: could not restore $live")
        else fs.delete(st.getPath, true)
      } else if (name.startsWith(s"${base}__ups_tmp_")) {
        fs.delete(st.getPath, true)
      }
    }
  }

  // ---- driver query: a deterministic upsert scenario, end state oracled

  private def baseCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** Driver query: stage orders partitioned by priority, upsert a
    * deterministic batch (every key ≡ 0 mod 97 gets price + 1000; five
    * synthetic new keys land in one partition), report the merged
    * table's per-partition rollup. The upsert runs against a COPY, so
    * the query is idempotent across verify/bench reruns; the oracle
    * computes the same merge relationally.
    */
  def upsertMergeQuery(s: SparkSession, dir: String): DataFrame = {
    val basePath = Ingest.ensureStaged(
      Ingest.stagedPath(s, "graft_upsert_base_",
        Seq(s"$dir/orders.parquet"))) { tmp =>
      Tables.orders(s, dir).select(baseCols.map(col): _*)
        .write.partitionBy("o_orderpriority").parquet(tmp)
    }
    // fresh working copy per run — upsert mutates it (hardlink clone:
    // the upsert rewrites whole partition dirs, never appends into an
    // existing file, so linked bytes are safe to share with the base).
    // The base's schema is resolved ONCE per session through the reader
    // memo (immutable staged path) and handed to both the upsert and the
    // post-swap open — the clone preserves it, so neither needs the
    // footer-inference job
    val baseSchema = Tables.readCached(s, basePath).schema
    val work = SnapshotTable.cloneTable(s, basePath)
    val orders = Tables.orders(s, dir)
    val changed = orders.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val fresh = s.range(1, 6).select(
      (col("id") + maxKey).as("o_orderkey"),
      lit(1L).as("o_custkey"),
      lit(123.45).as("o_totalprice"),
      to_timestamp(lit("1999-01-01")).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
    upsertByKey(s, work, changed.unionByName(fresh),
      "o_orderkey", "o_orderpriority", knownSchema = Some(baseSchema))
    openMergedTable(s, work, "o_orderpriority",
      knownSchema = Some(baseSchema))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderpriority"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_upsert_merge" -> (upsertMergeQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_upsert_merge" ->
      """WITH changed AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), fresh AS (
        |  SELECT (SELECT max(o_orderkey) FROM orders) + i AS o_orderkey,
        |    CAST(1 AS BIGINT) AS o_custkey, 123.45 AS o_totalprice,
        |    '1999-01-01' AS o_orderdate, '1-URGENT' AS o_orderpriority
        |  FROM (SELECT unnest(generate_series(1, 5)) AS i)
        |), upd AS (
        |  SELECT * FROM changed UNION ALL SELECT * FROM fresh
        |), merged AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM upd
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
