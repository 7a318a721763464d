package graft

/** Driver-contract smoke: every declared query runs at sf0.001 and the
  * oracle map stays consistent with the query map.
  */
class QueryPackSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("query and oracle names are unique across packs (flatMap.toMap " +
    "would silently drop a duplicate)") {
    val qNames = SparkEntry.packs.flatMap(_.queries.keys)
    val qDups = qNames.groupBy(identity).filter(_._2.size > 1).keys
    assert(qDups.isEmpty, s"duplicate query names across packs: $qDups")
    val oNames = SparkEntry.packs.flatMap(_.oracleSql.keys)
    val oDups = oNames.groupBy(identity).filter(_._2.size > 1).keys
    assert(oDups.isEmpty, s"duplicate oracle names across packs: $oDups")
  }

  test("entry (flagship scatter-gather) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and return rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    // q_ngram_jaccard/q_neardup_embedding legitimately may be sparse at
    // tiny scale but must still execute; everything else must be non-empty
    val allowEmpty = Set("q_ngram_jaccard", "q_neardup_embedding", "q_dedup_exact")
    assert((empties.toSet -- allowEmpty).isEmpty, s"empty results: $empties")
  }
}
