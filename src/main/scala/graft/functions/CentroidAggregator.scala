package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of float vectors (per-group embedding
  * centroid — the building block IVF coarse quantizers and cluster
  * summaries need). Demonstrates the `Aggregator[IN, BUF, OUT]` extension
  * surface (SURVEY.md §2.10); partial aggregation (reduce/merge) runs
  * map-side, so the shuffle carries one (sum, count) buffer per group,
  * never the vectors.
  */
object CentroidAggregator extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Float] =
    if (r._2 == 0) Seq.empty
    else r._1.map(x => (x / r._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** DataFrame-API form: `df.groupBy(...).agg(CentroidAggregator.asUdf(col))`
    * (`toColumn` only fits typed `Dataset[Seq[Float]]` groups; the udaf
    * wrapper adapts column input).
    */
  lazy val asUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
