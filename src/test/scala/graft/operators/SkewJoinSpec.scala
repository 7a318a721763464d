package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on skewed data, hot key spread over salts") {
    // 90% of left rows share one hot key
    val left = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 100).otherwise(lit(7L)).as("k"),
        $"id".as("v"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", saltBuckets = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)

    // replication factor is exactly saltBuckets on the dim side
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(7))))
    assert(replicated.count() == right.count() * 8)

    // the hot key's rows really scatter across multiple salt values
    val saltsUsed = left.withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter($"k" === 7).select("__salt").distinct().count()
    assert(saltsUsed > 4)
  }
}
