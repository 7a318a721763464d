package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotCatalog]] — versioned name→(path, version) ledger with
  * atomic cross-table transactions. Pins: a reader resolving from one
  * catalog version sees a CONSISTENT pair; a crashed transaction's
  * table commits stay invisible through the catalog; racing catalog
  * publishes conflict-and-retry.
  */
class SnapshotCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def setup(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("cat").toString
    val (data, agg, root) = (s"$dir/data", s"$dir/agg", s"$dir/cat")
    SnapshotTable.create(spark, data,
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "v", "g"), "g")
    SnapshotTable.create(spark, agg,
      SnapshotTable.read(spark, data).groupBy("g")
        .agg(sum("v").as("s")), "g")
    SnapshotCatalog.create(spark, root)
    SnapshotCatalog.register(spark, root, "data", data)
    SnapshotCatalog.register(spark, root, "agg", agg)
    (data, agg, root)
  }

  test("a transaction moves the data table and its aggregate together; " +
    "old catalog versions keep the old consistent pair") {
    val (data, agg, root) = setup()
    val catV = SnapshotCatalog.currentVersion(spark, root)

    SnapshotCatalog.commit(spark, root) { _ =>
      val dv = SnapshotTable.commitAppend(spark, data,
        Seq((3L, 30.0, "a")).toDF("k", "v", "g"), "g").get
      val av = SnapshotTable.commitOverwrite(spark, agg,
        SnapshotTable.readVersion(spark, data, dv).groupBy("g")
          .agg(sum("v").as("s")), "g")
      Map("data" -> dv, "agg" -> av)
    }

    // new catalog version: both sides moved
    def pair(cv: Long): (Long, Double) = (
      SnapshotCatalog.read(spark, root, "data", Some(cv)).count(),
      SnapshotCatalog.read(spark, root, "agg", Some(cv))
        .agg(sum("s")).head().getDouble(0))
    assert(pair(catV + 1) === ((3L, 60.0)))
    // the OLD catalog version still yields the old pair — consistent
    assert(pair(catV) === ((2L, 30.0)))
    // data-side total at the old catalog version matches its aggregate
    assert(SnapshotCatalog.read(spark, root, "data", Some(catV))
      .agg(sum("v")).head().getDouble(0) === 30.0)
  }

  test("a crashed transaction (table commits landed, catalog publish " +
    "didn't) is invisible through the catalog") {
    val (data, _, root) = setup()
    val catV = SnapshotCatalog.currentVersion(spark, root)
    // simulate the crash: move the table, never publish the catalog
    SnapshotTable.commitAppend(spark, data,
      Seq((9L, 90.0, "b")).toDF("k", "v", "g"), "g")
    assert(SnapshotCatalog.read(spark, root, "data").count() === 2L,
      "catalog readers must not see the un-pinned table version")
    assert(SnapshotCatalog.currentVersion(spark, root) === catV)
    // the next successful transaction re-pins and the rows appear
    SnapshotCatalog.commit(spark, root) { _ =>
      Map("data" -> SnapshotTable.currentVersion(spark, data))
    }
    assert(SnapshotCatalog.read(spark, root, "data").count() === 3L)
  }

  test("unregistered tables fail loudly; a racer's published version is " +
    "rebased over, not clobbered") {
    val (data, _, root) = setup()
    intercept[IllegalArgumentException] {
      SnapshotCatalog.commit(spark, root)(_ => Map("nope" -> 1L))
    }
    // simulate a racer: the next catalog version appears between our
    // read and our publish — the retry must land AFTER it, preserving
    // the racer's pins
    val v = SnapshotCatalog.currentVersion(spark, root)
    val dir = new org.apache.hadoop.fs.Path(root, "_catalog")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(f,
      new org.apache.hadoop.fs.Path(dir, s"v$v.json"), f,
      new org.apache.hadoop.fs.Path(dir, s"v${v + 1}.json"),
      false, spark.sparkContext.hadoopConfiguration)
    val after = SnapshotCatalog.register(spark, root, "data", data)
    assert(after === v + 2,
      "the register must rebase past the racer's version")
    assert(SnapshotCatalog.entries(spark, root).contains("agg"),
      "rebasing must keep every pin the racer published")
  }

  test("catalog_table TVF resolves pinned versions through SQL") {
    val (data, _, root) = setup()
    SnapshotSql.register(spark)
    val catV = SnapshotCatalog.currentVersion(spark, root)
    SnapshotCatalog.commit(spark, root) { _ =>
      Map("data" -> SnapshotTable.commitAppend(spark, data,
        Seq((3L, 30.0, "a")).toDF("k", "v", "g"), "g").get)
    }
    assert(spark.sql(
      s"SELECT count(*) FROM catalog_table('$root', 'data')")
      .head().getLong(0) === 3L)
    assert(spark.sql(
      s"SELECT count(*) FROM catalog_table('$root', 'data', $catV)")
      .head().getLong(0) === 2L)
  }
}
