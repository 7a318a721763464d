package graft.feat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.PatientSchema.featureCols

/** Feature preparation (P1/P2/P3, similarity_search.py:186-200, 561-578). */
object Normalization {

  /** P2 — column-wise z-score `(x - mean) / (std + 1e-8)` with POPULATION
    * std (numpy `std(axis=0)` default, similarity_search.py:198).
    *
    * Spark shape: one global aggregate produces a single stats row, which
    * is broadcast back over the data (a 1×N broadcast nested-loop join —
    * no shuffle of the fact table). Scales to any corpus size: the agg is
    * partial+final, the join side is one row.
    *
    * Per-hospital normalization (the reference normalizes each hospital's
    * data against its own stats, similarity_search.py:180): pass
    * `perGroup = Some("hospital")` — stats become a groupBy over the shard
    * key, joined back on it (broadcast: #hospitals rows).
    */
  def zscore(df: DataFrame, cols: Seq[String] = featureCols,
             perGroup: Option[String] = None): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"__mean_$c"), stddev_pop(col(c)).as(s"__std_$c"))
    }
    val normalized = perGroup match {
      case Some(g) =>
        val stats = df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
        df.join(broadcast(stats), Seq(g))
      case None =>
        val stats = df.agg(aggs.head, aggs.tail: _*)
        df.crossJoin(broadcast(stats))
    }
    cols.foldLeft(normalized) { (acc, c) =>
      acc.withColumn(c,
        (col(c) - col(s"__mean_$c")) / (col(s"__std_$c") + lit(1e-8)))
    }.drop(cols.flatMap(c => Seq(s"__mean_$c", s"__std_$c")): _*)
  }

  /** P1 — assemble the canonical 20-feature float32 array column
    * (similarity_search.py:195: `.values.astype(np.float32)`).
    */
  def assembleFeatures(df: DataFrame, outputCol: String = "features"): DataFrame =
    df.withColumn(outputCol,
      array(featureCols.map(c => col(c).cast("float")): _*))

  /** P3 — query-vector prep (similarity_search.py:561-578): dict → ordered
    * vector with missing keys defaulting to 0, then PER-ROW normalization
    * `(v - v.mean()) / (v.std() + 1e-8)` — deliberately a different axis
    * than P2 (a reference quirk, reproduced as specified; see SURVEY.md §7).
    * Driver-side O(20) scalar math.
    */
  def prepareQueryFeatures(query: Map[String, Double]): Array[Float] = {
    val v = featureCols.map(f => query.getOrElse(f, 0.0)).toArray
    val mean = v.sum / v.length
    val variance = v.map(x => (x - mean) * (x - mean)).sum / v.length
    val std = math.sqrt(variance)
    v.map(x => ((x - mean) / (std + 1e-8)).toFloat)
  }
}
