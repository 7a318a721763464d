package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: keeps the k highest-scoring (id, score)
  * pairs in a size-k min-heap buffer. The point is the SHUFFLE SHAPE for
  * batched similarity search: map-side partial aggregation reduces every
  * partition to ≤ k candidates per group BEFORE the exchange, so a
  * batched-query search shuffles (partitions × queries × k) tiny rows
  * instead of (corpus × queries) — the difference between feasible and
  * not at 100 TB.
  *
  * (Single-query top-k doesn't need this — Catalyst's
  * TakeOrderedAndProject already is a bounded heap; this generalizes that
  * shape to per-GROUP top-k.)
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Seq[(Long, Double)]] {

  override def zero: Array[(Long, Double)] = Array.empty

  // buffer invariant: a min-heap by (score, id-desc) of size ≤ k, stored
  // as a plain array (arr(0) = weakest element currently kept)
  private def siftDown(h: Array[(Long, Double)], from: Int): Unit = {
    var i = from
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < h.length && lt(h(l), h(m))) m = l
      if (r < h.length && lt(h(r), h(m))) m = r
      if (m == i) return
      val t = h(i); h(i) = h(m); h(m) = t
      i = m
    }
  }

  /** heap order: lower score first; ties broken id-DESC so that the kept
    * set (and thus final result) matches `ORDER BY score DESC, id ASC`.
    */
  private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 < b._2 || (a._2 == b._2 && a._1 > b._1)

  override def reduce(buf: Array[(Long, Double)], v: (Long, Double)): Array[(Long, Double)] =
    if (buf.length < k) {
      val nb = buf :+ v
      if (nb.length == k) { // heapify once full
        var i = k / 2 - 1
        while (i >= 0) { siftDown(nb, i); i -= 1 }
      }
      nb
    } else if (lt(buf(0), v)) {
      buf(0) = v
      siftDown(buf, 0)
      buf
    } else buf

  override def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortBy { case (id, score) => (-score, id) }.toSeq

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    Encoders.kryo[Array[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
