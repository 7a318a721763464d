package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the explicit form of what
  * AQE's skew-join optimization does adaptively. Still needed when (a) the
  * skewed side feeds a non-AQE-eligible shape (e.g. a pre-shuffled
  * bucketed table), or (b) skew is known a priori and you want
  * deterministic partition sizing at 100 TB rather than runtime
  * re-planning.
  *
  * Left rows scatter across `saltBuckets` sub-keys; the (small or
  * moderate) right side replicates `saltBuckets`×, so each hot key's rows
  * spread over `saltBuckets` reducers instead of one.
  */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, key: String,
                     saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    val salted = skewed.withColumn("__salt",
      (rand(42) * saltBuckets).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
