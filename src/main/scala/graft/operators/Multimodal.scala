package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` multimodal-column operators: image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs exist in this container); everything around it — the schema
  * (binary payload + struct metadata), the batched `mapPartitions`
  * execution shape (one buffer per batch, mirroring how a real decoder
  * amortizes model/codec setup per batch), partitioning, and the
  * downstream feature pipeline — is real Spark and tested.
  *
  * Scale design: media rows are large; the pipeline never shuffles
  * payloads — decode/featurize are narrow maps, and only the small
  * feature vectors / metadata flow into joins and aggregations.
  */
object Multimodal extends QueryPack {

  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedMeta(width: Int, height: Int, channels: Int, n_bytes: Long)
  case class MediaFeatures(media_id: Long, media_type: String,
                           meta: DecodedMeta, features: Array[Float])

  /** ===== STUB ===== deterministic fake decoder standing in for an image
    * codec: "dimensions" derive from a stable byte hash, "pixels" are the
    * raw bytes. A real deployment swaps this body for e.g. a JNI codec;
    * the signature and batch shape are the contract.
    */
  def decodeStub(payload: Array[Byte]): DecodedMeta = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(payload.length, 64)) { h = 31 * h + payload(i); i += 1 }
    val w = 16 + math.floorMod(h, 16).toInt * 16
    val hgt = 16 + math.floorMod(h >> 8, 16).toInt * 16
    DecodedMeta(w, hgt, 3, payload.length.toLong)
  }

  /** ===== STUB-adjacent ===== feature extraction: 16-bin byte histogram,
    * L1-normalized — deterministic, plays the role of an image-embedding
    * model's output.
    */
  def featurize(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** "Video" frame sampling stub: k evenly-spaced byte slices. */
  def sampleFrames(payload: Array[Byte], k: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty) Seq.empty
    else {
      val step = math.max(payload.length / k, 1)
      (0 until k).flatMap { i =>
        val off = i * step
        if (off < payload.length)
          Some(payload.slice(off, math.min(off + step, payload.length)))
        else None
      }
    }
  }

  /** Documents as a fake media table: payload = UTF-8 bytes (deterministic). */
  def asMediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        // deterministic type label so the pipeline exercises per-type paths
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"))
      .as[MediaRow]
  }

  /** The batched decode/featurize pass: `mapPartitions` processes rows in
    * fixed-size batches (the shape a real vectorized decoder / GPU model
    * wants), emitting small typed rows. No payload ever shuffles.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would live here (codec/model init amortization)
        batch.map { r =>
          MediaFeatures(r.media_id, r.media_type, decodeStub(r.payload), featurize(r.payload))
        }
      }
    }
  }

  /** Driver-contract query: per-type feature/meta aggregates (rows-only —
    * the stub decode is ours, not SQL).
    */
  def mediaFeaturesQuery(s: SparkSession, dir: String): DataFrame =
    decodeAndFeaturize(asMediaTable(s, dir)).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        round(avg(col("meta.width")), 2).as("avg_width"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_bin0"))
      .orderBy(col("media_type"))

  /** Frame-sampling query: frames per media item (rows-only). */
  def frameSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = asMediaTable(s, dir)
      .filter(col("media_type") === "video")
      .map { r =>
        val fs = sampleFrames(r.payload, 4)
        (r.media_id, fs.length, fs.map(_.length.toLong).sum)
      }
      .toDF("media_id", "n_frames", "frame_bytes")
    frames.filter(col("media_id") < 60).orderBy(col("media_id"))
  }

  /** Chaining query — the full multimodal retrieval path: video payload →
    * frame sampling → per-frame featurization → cosine top-k against a
    * probe frame. Payloads never shuffle: frames are featurized inside
    * the narrow flatMap, so only 16-float vectors reach the sort. At
    * index scale the vectors would land in the LSH/IVF index
    * ([[AnnSearch]]); the probe path is identical.
    */
  def frameEmbeddingSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Probe = frame 0 of media 2, decoded from THAT row alone: a pushed-
    // down point lookup on the media table (no frame flatMap), so the
    // payload-bearing decode pass below runs exactly ONCE per query —
    // previously the probe's head() was a second full decode job.
    val probeRow = asMediaTable(s, dir).filter(col("media_id") === 2).head()
    val probe: Seq[Float] = featurize(sampleFrames(probeRow.payload, 4).head).toSeq
    val frames = asMediaTable(s, dir)
      .filter(col("media_type") === "video")
      .flatMap { r =>
        sampleFrames(r.payload, 4).zipWithIndex.map { case (f, i) =>
          (r.media_id, i, featurize(f))
        }
      }
      .toDF("media_id", "frame_no", "emb")
    frames
      .filter(!(col("media_id") === 2 && col("frame_no") === 0))
      .withColumn("sim", round(graft.functions.VectorFunctions
        .cosineSimilarity(col("emb"), typedlit(probe)), 6))
      .orderBy(col("sim").desc, col("media_id"), col("frame_no"))
      .limit(10)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        col("sim"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_media_features"  -> (mediaFeaturesQuery _),
    "q_media_frames"    -> (frameSampleQuery _),
    "q_media_frame_knn" -> (frameEmbeddingSearch _))

  /** All three media queries are DuckDB-oracle-checked: the stub decode /
    * featurize / frame-sample kernels are deterministic byte arithmetic,
    * and the driver corpus is pure printable ASCII, so UTF-8 payload
    * bytes == codepoints (`unicode(substring(...))`) and `length(text)`
    * == payload size — the oracle recomputes the 31·h+b meta hash in
    * HUGEINT mod-2^64, the 16-bin L1 histograms (through REAL, matching
    * the engine's float bins), slice geometry, and the frame cosine
    * top-k bit-for-bit. A non-ASCII corpus would need BLOB byte access
    * instead; the engine side is byte-correct either way.
    */
  override def oracleSql: Map[String, String] = {
    val media =
      """media AS MATERIALIZED (
        |  SELECT doc_id AS media_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    length(text) AS n_bytes
        |  FROM documents
        |)""".stripMargin
    Map(
      "q_media_features" ->
        s"""WITH $media,
           |meta AS MATERIALIZED (
           |  SELECT media_id, media_type, n_bytes,
           |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
           |      [CAST(unicode(substring(text, i, 1)) AS HUGEINT)
           |       FOR i IN generate_series(1, least(n_bytes, 64))]),
           |      (h, c) -> (h * 31 + c) % 18446744073709551616) AS h,
           |    len(list_filter([unicode(substring(text, i, 1))
           |        FOR i IN generate_series(1, n_bytes)],
           |        c -> c // 16 = 0))::DOUBLE / greatest(n_bytes, 1) AS bin0
           |  FROM media
           |)
           |SELECT media_type,
           |  CAST(count(*) AS BIGINT) AS n_media,
           |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           |  round(avg(16 + (h % 16) * 16), 2) AS avg_width,
           |  round(avg(CAST(bin0 AS REAL)), 6) AS avg_bin0
           |FROM meta GROUP BY media_type ORDER BY media_type""".stripMargin,
      "q_media_frames" ->
        s"""WITH $media,
           |v AS (SELECT media_id, n_bytes, greatest(n_bytes // 4, 1) AS step
           |      FROM media WHERE media_type = 'video'),
           |f AS (
           |  SELECT media_id, least(i * step + step, n_bytes) - i * step AS flen
           |  FROM v, (SELECT unnest(generate_series(0, 3)) AS i)
           |  WHERE i * step < n_bytes
           |)
           |SELECT media_id, CAST(count(*) AS INT) AS n_frames,
           |  CAST(sum(flen) AS BIGINT) AS frame_bytes
           |FROM f WHERE media_id < 60
           |GROUP BY media_id ORDER BY media_id""".stripMargin,
      "q_media_frame_knn" ->
        s"""WITH $media,
           |v AS (SELECT media_id, text, n_bytes, greatest(n_bytes // 4, 1) AS step
           |      FROM media WHERE media_type = 'video'),
           |fr AS MATERIALIZED (
           |  SELECT media_id, i AS frame_no,
           |    substring(text, i * step + 1,
           |      least(i * step + step, n_bytes) - i * step) AS frame
           |  FROM v, (SELECT unnest(generate_series(0, 3)) AS i)
           |  WHERE i * step < n_bytes
           |), hist AS MATERIALIZED (
           |  SELECT media_id, frame_no,
           |    [CAST(len(list_filter([unicode(substring(frame, ci, 1))
           |        FOR ci IN generate_series(1, length(frame))], c -> c // 16 = b))::DOUBLE
           |      / greatest(length(frame), 1) AS REAL)::DOUBLE
           |     FOR b IN generate_series(0, 15)] AS emb
           |  FROM fr
           |), probe AS (SELECT emb AS p FROM hist WHERE media_id = 2 AND frame_no = 0)
           |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
           |  round(list_dot_product(emb, p) /
           |    (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(p, p))), 6) AS sim
           |FROM hist, probe
           |WHERE NOT (media_id = 2 AND frame_no = 0)
           |ORDER BY sim DESC, media_id, frame_no LIMIT 10""".stripMargin)
  }
}
