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

  test("budgetedMix: pre-prune is invisible on a deliberately skewed stratum " +
    "and bounds the window input to k rows per stratum") {
    // one dominant stratum (4,900 docs) vs one rare (100) — the shape that
    // kills an unpruned per-stratum window at scale
    val docs = (0L until 5000L)
      .map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "),
        if (i % 50 == 0) "rare" else "en"))
      .toDF("doc_id", "text", "lang")
    val budget = 100L
    val got = CorpusCuration.budgetedMix(docs, "doc_id", "text", "lang", budget)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // reference: the plain unbounded window over the WHOLE stratum
    val pri = md5(concat(lit("42:"), $"doc_id".cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"pri", $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = docs
      .select($"lang", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"), pri.as("pri"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= budget)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.toSeq == ref.toSeq,
      "pruned result must equal the unpruned window's")
    // the window never sees more than budget rows per stratum
    val cand = CorpusCuration.mixCandidates(docs, "doc_id", "text", "lang", budget, 42L)
    assert(cand.count() <= budget * 2, "pre-window rows must be <= k * n_strata")
  }

  test("thresholdCandidates (heap-free path for huge budgets) is result-" +
    "preserving and bounded") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 400L
    val viaHeap = CorpusCuration.budgetedMix(docs, "doc_id", "text", "lang",
      budgetTokens = budget)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // drive the threshold path directly at the same small budget (it only
    // engages past maxPruneK in production) and finish with the same
    // cumsum window + filter budgetedMix applies
    val narrow = docs.select(col("lang"), col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val cands = CorpusCuration.thresholdCandidates(
      narrow, "doc_id", "lang", budget, seed = 42L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viaThreshold = cands
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaThreshold === viaHeap)

    // bound: per stratum, candidates carry at most budget + one bucket
    val maxBucket = narrow
      .withColumn("pri", md5(concat(lit("42:"), col("doc_id").cast("string"))
        .cast("binary")))
      .groupBy(col("lang"), substring(col("pri"), 1, 4))
      .agg(sum("n_tokens").as("bt"))
      .agg(max("bt")).head().getLong(0)
    cands.groupBy("lang").agg(sum("n_tokens").as("tok")).collect().foreach { r =>
      assert(r.getLong(1) <= budget + maxBucket,
        s"candidate tokens ${r.getLong(1)} exceed budget+bucket bound in ${r.get(0)}")
    }
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

  test("one-pass BPE apply ≡ chained folds on the trained 6-round table") {
    val docs = Tables.documents(spark, sfDir)
    val seg = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("syms", expr("filter(split(w, ''), c -> c <> '')"))
    val mergesDf = CorpusCuration.bpeMergesFor(docs, rounds = 6)
      .localCheckpoint()
    val merges = mergesDf.orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val one = CorpusCuration.applyMergesOnePass(seg, mergesDf)
      .select("w", "syms").orderBy("w").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val chained = CorpusCuration.applyMergesChained(seg, merges)
      .select("w", "syms").orderBy("w").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(one.toSeq === chained.toSeq)
  }

  test("one-pass BPE apply: 60-merge synthetic table — chained-equal, " +
    "and plan size does NOT grow with merge count") {
    // a merge table far past the demo budget, incl. chaining merges
    // (products of earlier merges on the lhs/rhs) and no-op merges
    val words = Seq("aaaaaaab", "abababab", "bananabandana", "cddcddcdd",
      "zzzzzz", "aabbaabb", "banana").map(w => ("xx", w))
    val seg = words.toDF("lang", "w")
      .withColumn("syms", expr("filter(split(w, ''), c -> c <> '')"))
    val base = Seq(("a", "a"), ("aa", "aa"), ("a", "b"), ("b", "a"),
      ("ab", "ab"), ("n", "a"), ("na", "na"), ("c", "d"), ("d", "d"),
      ("cd", "dc"))
    val merges = (base ++ (1 to 50).map(i => (s"q$i", s"r$i")))
      .zipWithIndex.map { case ((l, r), i) => (i.toLong + 1, l, r) }
    def mergesDf(n: Int) =
      merges.take(n).toDF("merge_round", "lhs", "rhs")
    val one = CorpusCuration.applyMergesOnePass(seg, mergesDf(60))
      .select("w", "syms").orderBy("w").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val chained = CorpusCuration.applyMergesChained(
        seg, merges.take(60).map(m => (m._2, m._3)))
      .select("w", "syms").orderBy("w").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(one.toSeq === chained.toSeq)
    // constant plan depth: the merge list is DATA, so the expression
    // tree for 60 merges is the same size as for 10 — the chained form
    // grows by one aggregate lambda per merge. Measured on the ANALYZED
    // plan (the optimizer folds these tiny LocalRelation inputs away,
    // which would make the comparison vacuous).
    def planChars(n: Int): Int = CorpusCuration
      .applyMergesOnePass(seg, mergesDf(n))
      .queryExecution.analyzed.treeString.length
    val p10 = planChars(10)
    val p60 = planChars(60)
    assert(math.abs(p60 - p10) <= p10 / 20,
      s"one-pass plan must not grow with merges: 10→$p10 chars, 60→$p60")
    val chained10 = CorpusCuration.applyMergesChained(
      seg, merges.take(10).map(m => (m._2, m._3)))
      .queryExecution.analyzed.treeString.length
    val chained60 = CorpusCuration.applyMergesChained(
      seg, merges.take(60).map(m => (m._2, m._3)))
      .queryExecution.analyzed.treeString.length
    assert(chained60 > chained10 * 3,
      s"sanity: the chained form DOES grow ($chained10 → $chained60)")
  }

  test("plan shapes: mix = one hash shuffle on the stratum key; bpe pairs " +
    "= partial agg + TakeOrderedAndProject; no UDF anywhere") {
    val mix = CorpusCuration.mixQuery(spark, sfDir)
    mix.collect()
    val mixPlan = mix.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(mixPlan.toLowerCase.contains("samplek"),
      s"budgeted mix must pre-prune each stratum with the bottom-k sketch:\n$mixPlan")
    val hashEx = mixPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2, s"budgeted mix shuffles at most twice (sketch agg + " +
      s"window), both on the stratum key:\n$mixPlan")
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"the budget-bound candidate set must broadcast for the join-back " +
      s"(the corpus side never shuffles for it):\n$mixPlan")
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

  test("bpeMerges: matches an independent greedy-scan reference, including " +
    "overlapping pairs and merged-token chaining") {
    // "aaaa" exercises overlap counting (3 positions of (a,a)) AND the
    // greedy scan ([a,a,a,a] -> [aa,aa], never [aa,a,a]); "banana"/"abab"
    // exercise merged tokens participating in later rounds
    val docs = Seq((1L, "aaaa abab banana"), (2L, "aaaa aaaa cocoa banana"))
      .toDF("doc_id", "text")
    val rounds = 5

    // independent reference: plain-Scala Sennrich-style trainer
    var words: Seq[(Vector[String], Long)] =
      docs.collect().flatMap(_.getString(1).split(" ")).toSeq
        .groupBy(identity).map { case (w, ws) =>
          w.split("").toVector -> ws.size.toLong }.toSeq
    val expect = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += n
      val ((lhs, rhs), pn) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      expect += ((r.toLong, lhs, rhs, pn))
      words = words.map { case (syms, n) =>
        val res = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
            res += lhs + rhs; i += 2
          } else { res += syms(i); i += 1 }
        }
        res.toVector -> n
      }
    }

    val got = CorpusCuration.bpeMergesFor(docs, rounds)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)

    // APPLY side: per-lang piece counts equal the reference tokenizer's
    // (words holds the final reference segmentation after `rounds` merges)
    val refPieces = words.map { case (syms, n) => syms.size.toLong * n }.sum
    val refChars = words.map { case (syms, n) => syms.map(_.length).sum.toLong * n }.sum
    val stats = CorpusCuration.bpeTokenizeStatsFor(docs.withColumn("lang", lit("xx")), rounds)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.length == 1)
    val (_, nWords, nChars, nPieces) = stats.head
    assert(nWords == words.map(_._2).sum)
    assert(nChars == refChars, "pre-merge pieces = chars")
    assert(nPieces == refPieces, "post-merge piece count must match the reference")
    assert(nPieces < nChars, "merges must actually compress")
  }

  test("repetitionReport: hand-computed duplicate-trigram char fractions, " +
    "short docs contribute zero, flag threshold fires") {
    // "a b a b a b" -> trigrams [a b a, b a b, a b a, b a b]: ALL duplicated
    // -> dup = tot = 4*5 = 20, flagged. "x y z w" -> trigrams [x y z, y z w]
    // distinct -> dup 0 of 10. "p q" -> no trigram -> 0/0.
    val docs = Seq(
      (1L, "a b a b a b", "en"),
      (2L, "x y z w", "en"),
      (3L, "p q", "en")).toDF("doc_id", "text", "lang")
    val r = CorpusCuration.repetitionReportFor(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "en")
    assert(row.getLong(1) == 3L, "n_docs")
    assert(row.getLong(2) == 20L, s"dup_chars: $row")
    assert(row.getLong(3) == 30L, s"tot_chars: $row")
    assert(row.getDouble(4) == math.round(20.0 / 30.0 * 1e6) / 1e6)
    assert(row.getLong(5) == 1L, "only the fully-repetitive doc crosses 10%")
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
