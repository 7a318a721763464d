package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ZOrderSpec extends SparkSpec {

  /** Reference Morton code, bit by bit. */
  private def zRef(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), 65535L)
    val cb = math.min(math.max(b, 0L), 65535L)
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((ca >> i) & 1L) << (2 * i)) |
        (((cb >> i) & 1L) << (2 * i + 1))
    }
  }

  test("zValue matches the bit-by-bit Morton reference (incl. clamping)") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (3L, 5L), (1L, 0L), (0L, 1L),
      (65535L, 65535L), (70000L, -3L), (2556L, 600L), (1234L, 4321L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === cases.map { case (a, b) => zRef(a, b) })
  }

  test("every 1024-point curve cell spans at most 32 values per dimension") {
    val rows = ZOrder.zOrderCells(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31L, s"day span in cell ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 31L, s"price span in cell ${r.getLong(0)}")
    }
  }

  test("z-ordered layout skips more files than a date-sorted layout on a price-only predicate") {
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
        .cast("long").as("day_b"),
      floor(col("o_totalprice") / 1000).cast("long").as("price_b"))

    val root = Files.createTempDirectory("zorder").toString
    val bySort = s"$root/date_sorted"
    val byZ = s"$root/zorder"
    o.repartitionByRange(16, col("day_b")).sortWithinPartitions("day_b")
      .write.mode("overwrite").parquet(bySort)
    ZOrder.zOrderWrite(o, col("day_b"), col("price_b"), byZ, nFiles = 16)

    // file-level min/max stats, as a parquet reader's footer would hold
    def overlapping(path: String, lo: Long, hi: Long): Int = {
      val files = Files.list(Paths.get(path)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
      files.count { f =>
        val mm = spark.read.parquet(f.toString)
          .agg(min(col("price_b")), max(col("price_b"))).head()
        mm.getLong(0) <= hi && mm.getLong(1) >= lo
      }
    }
    val loHi = (100L, 150L) // ~8% of the price-bucket domain
    val datePruned = overlapping(bySort, loHi._1, loHi._2)
    val zPruned = overlapping(byZ, loHi._1, loHi._2)
    assert(zPruned < datePruned,
      s"z-order must touch fewer files: z=$zPruned vs date-sorted=$datePruned of 16")
  }
}
