package graft.operators

import graft.SparkSpec

/** Power-iteration semantics on hand graphs: exact values on a path,
  * rank-mass conservation, and hub dominance on a star.
  */
class PageRankSpec extends SparkSpec {

  private def ranks(pairs: Seq[(Long, Long)]): Map[Long, Double] = {
    import spark.implicits._
    DedupClusters.pageRank(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("matches a scalar power iteration on the path graph 1-2-3") {
    val got = ranks(Seq((1L, 2L), (2L, 3L)))
    // independent scalar reference
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0)
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 3)
      r = r.keys.map(v =>
        v -> (0.15 / 3 + 0.85 * nbrs(v).map(u => r(u) / deg(u)).sum)).toMap
    for (v <- r.keys) assert(math.abs(got(v) - r(v)) < 1e-12, s"vertex $v")
    // undirected connected graph, no dangling mass: ranks sum to 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("hub of a star out-ranks every leaf") {
    val got = ranks(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    assert(Seq(1L, 2L, 3L, 4L).forall(l => got(10L) > got(l)))
    assert(Seq(1L, 2L, 3L, 4L).map(got).distinct.size === 1)
  }
}
