package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("heap semantics: top-k by score desc, ties broken id asc") {
    val agg = TopKAggregator(3)
    val items = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7), (6L, 0.7))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq((2L, 0.9), (3L, 0.9), (5L, 0.7)))
  }

  test("merge of partial heaps equals global top-k") {
    val agg = TopKAggregator(4)
    val rng = new scala.util.Random(11)
    val items = Seq.fill(500)((rng.nextLong() & 0xFFFF, rng.nextDouble()))
    val (a, b) = items.splitAt(250)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    val expected = items.sortBy { case (id, s) => (-s, id) }.take(4)
    assert(agg.finish(merged) == expected)
  }

  test("fewer rows than k: returns all, sorted") {
    val agg = TopKAggregator(10)
    val buf = Seq((1L, 0.2), (2L, 0.8)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq((2L, 0.8), (1L, 0.2)))
  }

  test("batchKnn: batched result equals per-query brute force") {
    val dir = sfDir
    val batched = graft.search.VectorSearch.batchKnnQuery(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // per-query check for query 0: self first, then the golden knn order
    val q0 = batched.filter(_._1 == 0L).map(_._3)
    assert(q0.head == 0L) // self-similarity 1.0 ranks first
    assert(q0.tail == Seq(17L, 225L, 12L, 483L)) // GoldenSpec order
    assert(batched.map(_._1).distinct.sorted == Seq(0L, 1L, 2L, 3L, 4L))
    assert(batched.groupBy(_._1).values.forall(_.length == 5))
  }
}
