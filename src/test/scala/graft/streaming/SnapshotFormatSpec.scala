package graft.streaming

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sources.SnapshotTable

/** The `graft-snapshot` batch format: SaveMode → commit mapping, the
  * version option, and the pending-deletes refusal.
  */
class SnapshotFormatSpec extends SparkSpec {

  private def orders4 = Tables.orders(spark, sfDir)
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      col("o_orderpriority"))

  test("write modes map onto table commits; read sees committed versions") {
    val t = java.nio.file.Files.createTempDirectory("snapfmt")
      .resolve("t").toString
    orders4.write.format("graft-snapshot")
      .option("partCol", "o_orderpriority")
      .option("statsCols", "o_orderkey")
      .mode(SaveMode.ErrorIfExists).save(t)
    val baseN = orders4.count()
    assert(spark.read.format("graft-snapshot").load(t).count() === baseN)

    // ErrorIfExists refuses a second write
    intercept[Exception] {
      orders4.write.format("graft-snapshot")
        .option("partCol", "o_orderpriority")
        .mode(SaveMode.ErrorIfExists).save(t)
    }
    // Ignore is a no-op on an existing table
    orders4.limit(1).write.format("graft-snapshot")
      .option("partCol", "o_orderpriority").mode(SaveMode.Ignore).save(t)
    assert(spark.read.format("graft-snapshot").load(t).count() === baseN)

    // Append commits a new version
    orders4.limit(5)
      .select((col("o_orderkey") + 8000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.format("graft-snapshot")
      .option("partCol", "o_orderpriority").mode(SaveMode.Append).save(t)
    assert(spark.read.format("graft-snapshot").load(t).count() === baseN + 5)
    // ... and the version option time-travels past it
    assert(spark.read.format("graft-snapshot").option("version", 1)
      .load(t).count() === baseN)

    // Overwrite is one atomic replacing version; history is retained
    orders4.limit(10).write.format("graft-snapshot")
      .option("partCol", "o_orderpriority").mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format("graft-snapshot").load(t).count() === 10L)
    assert(spark.read.format("graft-snapshot").option("version", 2)
      .load(t).count() === baseN + 5)

    // filters on the format read still push into manifest skipping
    // (same relation as the Scala path — just sanity-check correctness)
    assert(spark.read.format("graft-snapshot").load(t)
      .filter(col("o_orderpriority") === "1-URGENT").count() ===
      orders4.limit(10).filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("a table with pending equality deletes refuses the bare-relation " +
    "read path") {
    val t = java.nio.file.Files.createTempDirectory("snapfmt_del")
      .resolve("t").toString
    SnapshotTable.create(spark, t, orders4, "o_orderpriority")
    SnapshotTable.commitDeleteLazy(spark, t,
      orders4.limit(3).select("o_orderkey"), "o_orderkey")
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot").load(t).count()
    }
    assert(e.getMessage.contains("pending") ||
      Option(e.getCause).exists(_.getMessage.contains("pending")))
    // materializing the deletes reopens the path
    SnapshotTable.applyDeletes(spark, t, "o_orderpriority")
    assert(spark.read.format("graft-snapshot").load(t).count() ===
      orders4.count() - 3)
  }
}
