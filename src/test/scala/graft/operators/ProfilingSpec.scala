package graft.operators

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {

  test("profile invariants: bounds ordered, distincts bounded, no nulls here") {
    val rows = Profiling.columnProfile(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    for (r <- rows) {
      assert(r.getLong(2) === 0L, s"nulls in ${r.getString(0)}")
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(4) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(5),
        s"min <= mean <= max for ${r.getString(0)}")
    }
  }

  test("psi is non-negative (each term has matching signs) and counts reconcile") {
    val r = Profiling.psiDrift(spark, sfDir).collect().head
    assert(r.getDouble(2) >= 0.0)
    assert(r.getLong(0) + r.getLong(1) ===
      graft.Tables.orders(spark, sfDir).count())
  }

  test("every user is active in their own cohort week (diagonal covers all users)") {
    val m = Profiling.cohortRetention(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val diag = m.filter(x => x._1 == x._2).map(_._3).sum
    val users = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(diag === users)
    // no cell precedes its cohort week
    assert(m.forall(x => x._2 >= x._1))
  }
}
