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

  test("iters=10 keeps plan depth flat (per-round checkpoint) and matches " +
    "a scalar 10-round iteration") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    def planChars(iters: Int): Int =
      DedupClusters.pageRank(pairs.toDF("a_id", "b_id"), iters = iters)
        .queryExecution.optimizedPlan.treeString.length
    val p2 = planChars(2)
    val p10 = planChars(10)
    // each round ends in a checkpoint, so the FINAL plan is one round's
    // shape regardless of iteration count — without the ck this grows
    // linearly and explain() itself blows up at high iters
    assert(math.abs(p10 - p2) <= p2 / 10,
      s"plan must not grow with iters: 2→$p2 chars, 10→$p10")
    val got = DedupClusters.pageRank(pairs.toDF("a_id", "b_id"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val deg = Map(1L -> 3.0, 2L -> 2.0, 3L -> 3.0, 4L -> 2.0)
    val nbrs = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(1L, 3L))
    var r = deg.keys.map(_ -> 0.25).toMap
    for (_ <- 1 to 10)
      r = r.keys.map(v =>
        v -> (0.15 / 4 + 0.85 * nbrs(v).map(u => r(u) / deg(u)).sum)).toMap
    for (v <- r.keys) assert(math.abs(got(v) - r(v)) < 1e-12, s"vertex $v")
  }

  test("tol stops at the fixpoint: 2-regular graph converges in one round, " +
    "not 200") {
    import spark.implicits._
    // on a k-regular graph uniform rank is the EXACT fixpoint, so round 1
    // reproduces round 0 and the delta test must fire immediately —
    // without the stop this runs 200 eagerly-checkpointed rounds and the
    // suite times the difference out loud
    val cycle = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t0 = System.nanoTime()
    val got = DedupClusters.pageRank(cycle.toDF("a_id", "b_id"),
        iters = 200, tol = Some(1e-12))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    for (v <- Seq(1L, 2L, 3L))
      assert(math.abs(got(v) - 1.0 / 3) < 1e-15, s"vertex $v")
    assert(secs < 60.0, s"convergence stop did not fire (took $secs s)")
  }
}
