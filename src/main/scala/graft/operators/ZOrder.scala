package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` Z-order (Morton-curve) clustering — the lakehouse layout
  * optimization for multi-dimensional data skipping: interleave the bits
  * of two order-preserving dimension keys so that rows close in BOTH
  * dimensions land close on the curve, then range-partition + sort the
  * table by the z-value before writing. Parquet/Delta-style file-level
  * min/max stats then stay tight on BOTH dimensions, so a scan filtering
  * on either one skips most files — where a single-column sort gives
  * perfect skipping on that column and none on the other.
  *
  * The bit-spreading uses the standard magic-number construction
  * (Morton 1966; the "Interleave bits by Binary Magic Numbers" recipe of
  * the public Bit Twiddling Hacks collection): plain integer shifts and
  * masks, bit-identical in any engine — which is what makes the layout
  * key ORACLE-CHECKABLE, unlike a library call.
  *
  * Scale shape: the z-value is a narrow codegen expression; clustering is
  * ONE repartitionByRange (a range shuffle with sampled bounds) + a write
  * — the same cost as any sorted rewrite, run as offline housekeeping
  * like [[graft.sources.TableIO.compactAnnIndex]].
  */
object ZOrder extends QueryPack {

  /** Spread the low 16 bits of `c` so bit i moves to bit 2i (zeros in
    * between). Values are clamped to 16 bits first — the caller maps each
    * dimension to a bounded, order-preserving bucket.
    */
  private[operators] def spread16(c: Column): Column = {
    val x0 = least(greatest(c.cast("long"), lit(0L)), lit(65535L))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimension buckets. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` on the Morton code of two bucket columns and write it:
    * range-partition into `nFiles` z-runs (one output file each), sorted
    * within, so every file covers a compact curve segment — a tight
    * min/max box over BOTH dimensions.
    */
  def zOrderWrite(df: DataFrame, dimA: Column, dimB: Column,
                  path: String, nFiles: Int): Unit =
    df.withColumn("__z", zValue(dimA, dimB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Orders dimensions: days since the corpus epoch and 1k-price bucket —
    * both order-preserving, both bounded (fits 16 bits at any TPC-H SF up
    * to the date horizon; price buckets clamp).
    */
  private def orderDims(o: DataFrame): DataFrame =
    o.select(
      col("o_orderkey"),
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
        .cast("long").as("day_b"),
      floor(col("o_totalprice") / 1000).cast("long").as("price_b"))

  /** Driver query: locality evidence for the z-layout. Group orders by
    * curve CELL (z >> 10, i.e. 1024-point curve segments) and emit each
    * cell's row count and min/max box in both dimensions: compact boxes
    * (narrow day AND price ranges per cell, vs the full-table spread) ARE
    * the data-skipping property — any engine's file stats over a
    * cell-contiguous layout prune on either dimension. First 20 cells;
    * integer math end-to-end, so the oracle reproduces it exactly.
    */
  def zOrderCells(s: SparkSession, dir: String): DataFrame =
    orderDims(Tables.orders(s, dir))
      .withColumn("cell", shiftright(zValue(col("day_b"), col("price_b")), 10))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("day_b")).as("day_min"), max(col("day_b")).as("day_max"),
        min(col("price_b")).as("price_min"), max(col("price_b")).as("price_max"))
      .orderBy(col("cell"))
      .limit(20)

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_zorder_cells" -> (zOrderCells _))

  override def oracleSql: Map[String, String] = Map(
    "q_zorder_cells" -> {
      // the same magic-number spread, inlined as SQL (x: a BIGINT expr)
      def spread(x: String): String = {
        val c = s"least(greatest(CAST($x AS BIGINT), 0), 65535)"
        val s1 = s"(($c | ($c << 8)) & 16711935)"        // 0x00FF00FF
        val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"     // 0x0F0F0F0F
        val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"     // 0x33333333
        s"(($s3 | ($s3 << 1)) & 1431655765)"             // 0x55555555
      }
      val z = s"(${spread("day_b")} | (${spread("price_b")} << 1))"
      s"""WITH d AS (
         |  SELECT o_orderkey,
         |    date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS day_b,
         |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_b
         |  FROM orders),
         |c AS (SELECT ($z >> 10) AS cell, day_b, price_b FROM d)
         |SELECT cell, count(*) AS n_rows,
         |  min(day_b) AS day_min, max(day_b) AS day_max,
         |  min(price_b) AS price_min, max(price_b) AS price_max
         |FROM c GROUP BY cell ORDER BY cell LIMIT 20""".stripMargin
    })
}
