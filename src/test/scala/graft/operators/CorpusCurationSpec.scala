package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  test("budgetedMix: per-stratum totals within budget, maximal under the " +
    "priority order, membership independent of partitioning") {
    val docs = Tables.documents(spark, sfDir)
    val kept = CorpusCuration.budgetedMix(docs, "doc_id", "text", "lang",
      budgetTokens = 400L)
    val perLang = kept.groupBy("lang")
      .agg(sum("n_tokens").as("tok"), max("cum_tokens").as("cum"))
      .collect()
    perLang.foreach { r =>
      assert(r.getLong(1) <= 400L, s"budget exceeded: $r")
      assert(r.getLong(1) == r.getLong(2), "cum of last kept == stratum total")
    }
    // maximality: the first EXCLUDED doc per stratum would overflow the budget
    val all = CorpusCuration.budgetedMix(docs, "doc_id", "text", "lang",
      budgetTokens = Long.MaxValue)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    all.groupBy(_._1).foreach { case (_, rows) =>
      val firstExcluded = rows.sortBy(_._4).find(r => !keptIds.contains(r._2))
      firstExcluded.foreach { r => assert(r._4 > 400L, s"doc ${r._2} was excluded but fits") }
    }
    // partitioning independence (hashed priorities, not row order)
    val shuffled = CorpusCuration.budgetedMix(
      docs.repartition(13, col("text")), "doc_id", "text", "lang", budgetTokens = 400L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shuffled == keptIds)
  }

  test("bpePairCounts: top pair equals a local recount; no cross-word pairs") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val local = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        local(p) = local.getOrElse(p, 0L) + 1
      }
    })
    val got = CorpusCuration.bpePairCounts(spark, sfDir, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expectedTop = local.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got.toSeq == expectedTop)
    assert(got.forall(!_._1.contains(" ")), "pairs must never span a word boundary")
  }

  test("plan shapes: mix = one hash shuffle on the stratum key; bpe pairs " +
    "= partial agg + TakeOrderedAndProject; no UDF anywhere") {
    val mix = CorpusCuration.mixQuery(spark, sfDir)
    mix.collect()
    val mixPlan = mix.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashEx = mixPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"budgeted mix must shuffle once, on the stratum:\n$mixPlan")
    assert(!mixPlan.contains("UDF"), "curation ops stay in codegen expressions")

    val bpe = CorpusCuration.bpePairCounts(spark, sfDir)
    bpe.collect()
    val bpePlan = bpe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(bpePlan.contains("TakeOrderedAndProject"),
      s"top-k must avoid a full sort:\n$bpePlan")
    assert(bpePlan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"pair counting must combine map-side:\n$bpePlan")
    assert(!bpePlan.contains("UDF"))
  }

  test("qualityRules: keep counts consistent with per-rule failures") {
    val rows = CorpusCuration.qualityRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val keep = r.getAs[Long]("n_keep")
      assert(keep <= n)
      // keep can't exceed docs passing any single rule
      Seq("fail_len", "fail_mwl", "fail_stop", "fail_rep", "fail_sym").foreach { f =>
        assert(keep <= n - r.getAs[Long](f), s"$f inconsistent in $r")
      }
    }
  }
}
