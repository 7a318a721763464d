package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Rank-summary sidecar: determinism, the rank-error contract in both
  * regimes, merge/compression budget arithmetic, append-window refresh,
  * rebind across compaction, and the freshness refusal.
  */
class RankStatsSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic pseudo-random doubles (LCG — no Math.random). */
  private def lcg(n: Int, seed: Long = 42L): Seq[Double] = {
    var x = seed
    Seq.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
  }

  private def trueRankLe(xs: Seq[Double], v: Double): Long =
    xs.count(_ <= v).toLong
  private def trueRankLt(xs: Seq[Double], v: Double): Long =
    xs.count(_ < v).toLong

  private def checkBound(xs: Seq[Double], s: RankStats.RankSummary,
                         q: Double): Unit = {
    val v = s.quantile(q)
    val target = math.max(1L, math.ceil(q * xs.size).toLong)
    val lo = trueRankLt(xs, v) + 1
    val hi = trueRankLe(xs, v)
    assert(lo <= target + s.errRows && hi >= target - s.errRows,
      s"q=$q: served $v occupies ranks [$lo,$hi], target $target ± ${s.errRows}")
  }

  test("exact regime: n <= m yields weight-1 points, errRows 0, and " +
    "true order statistics at every quantile") {
    val xs = lcg(500)
    val sum = RankStats.summarize(xs.toDF("v"), "v", m = 1024)
    assert(sum.errRows === 0L)
    assert(sum.n === 500L)
    assert(sum.weights.forall(_ == 1L))
    val sorted = xs.sorted
    Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0).foreach { q =>
      val expect = sorted(math.max(1, math.ceil(q * 500).toInt) - 1)
      assert(sum.quantile(q) === expect, s"q=$q")
    }
  }

  test("compressed regime: every quantile's served value is within " +
    "errRows ranks of the target, and errRows = ceil(n/m)") {
    val xs = lcg(20000)
    val sum = RankStats.summarize(xs.toDF("v"), "v", m = 128)
    assert(sum.errRows === math.ceil(20000.0 / 128).toLong)
    assert(sum.weights.sum === 20000L)
    Seq(0.001, 0.1, 0.5, 0.9, 0.99, 0.999).foreach(checkBound(xs, sum, _))
  }

  test("summarize is deterministic: two runs over the same input " +
    "produce identical points") {
    val df = lcg(5000, seed = 7L).toDF("v")
    val a = RankStats.summarize(df, "v", m = 64)
    val b = RankStats.summarize(df, "v", m = 64)
    assert(a.values.toSeq === b.values.toSeq)
    assert(a.weights.toSeq === b.weights.toSeq)
  }

  test("nulls and NaNs are excluded from n and from every rank") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(2.0),
      Some(Double.NaN), Some(3.0)).toDF("v")
    val sum = RankStats.summarize(df, "v", m = 16)
    assert(sum.n === 3L)
    assert(sum.quantile(1.0) === 3.0)
    assert(sum.quantile(0.34) === 2.0)
  }

  test("merge: budgets add plus the re-compression spacing, and the " +
    "merged summary still honors its own bound") {
    val xsA = lcg(8000, seed = 1L)
    val xsB = lcg(8000, seed = 2L).map(_ + 0.3) // overlapping ranges
    val a = RankStats.summarize(xsA.toDF("v"), "v", m = 128)
    val b = RankStats.summarize(xsB.toDF("v"), "v", m = 128)
    val m = RankStats.merge(a, b)
    assert(m.n === 16000L)
    assert(m.errRows >= a.errRows + b.errRows)
    assert(m.weights.sum === 16000L)
    val union = xsA ++ xsB
    Seq(0.05, 0.5, 0.95).foreach(checkBound(union, m, _))
  }

  test("property sweep: across seeds, sizes, and uneven merges, every " +
    "decile of a merged summary honors its declared budget") {
    for (seed <- 1L to 6L) {
      val na = 1000 + (seed * 1733 % 9000).toInt
      val nb = 500 + (seed * 911 % 4000).toInt
      val xsA = lcg(na, seed)
      val xsB = lcg(nb, seed + 100).map(_ * 3.0 - 1.0) // wider, offset range
      val m = RankStats.merge(
        RankStats.summarize(xsA.toDF("v"), "v", m = 64),
        RankStats.summarize(xsB.toDF("v"), "v", m = 64))
      val union = xsA ++ xsB
      assert(m.n === union.size.toLong, s"seed $seed")
      assert(m.weights.sum === union.size.toLong, s"seed $seed")
      (1 to 9).map(_ / 10.0).foreach(checkBound(union, m, _))
    }
  }

  test("SegmentView: per-segment exact range arithmetic sums across " +
    "segments; a span-less member poisons the view by refusal; " +
    "multi-segment quantiles honor the summed budget") {
    val xsA = lcg(8000, seed = 91L)
    val xsB = lcg(3000, seed = 92L).map(_ * 2.0 - 0.5) // overlapping, wider
    val a = RankStats.summarize(xsA.toDF("v"), "v", m = 128)
    val b = RankStats.summarize(xsB.toDF("v"), "v", m = 128)
    val view = RankStats.SegmentView(Seq(a, b))
    assert(view.n === 11000L)
    assert(view.errRows === a.errRows + b.errRows)
    assert(view.spansAll)
    val union = xsA ++ xsB
    for ((lo, hi) <- Seq((Some(0.2), Some(0.6)), (None, Some(0.5)),
        (Some(0.9), None), (None, None))) {
      val bound = view.rangeUpper(lo, hi).get
      val truth = union.count(x => lo.forall(x >= _) && hi.forall(x <= _))
      assert(bound >= truth, s"($lo,$hi): bound $bound < truth $truth")
      assert(bound === a.rangeUpper(lo, hi).get + b.rangeUpper(lo, hi).get,
        "the view bound must be exactly the per-segment sum")
    }
    (1 to 9).map(_ / 10.0).foreach(checkBound(union, view.flat, _))
    // one span-less member (a legacy merged summary) refuses the
    // span-gated proofs for the WHOLE view - never a silent guess
    val noSpan = RankStats.merge(a, b)
    assert(!noSpan.spans)
    assert(RankStats.SegmentView(Seq(a, noSpan))
      .rangeUpper(None, Some(0.5)).isEmpty)
    assert(RankStats.SegmentView(Seq(a, noSpan)).descThreshold(10L).isEmpty)
  }

  test("asc/descThreshold prove >= k rows at-or-under / at-or-over the " +
    "served value, single- and multi-segment") {
    val xsA = lcg(5000, seed = 95L)
    val xsB = lcg(2000, seed = 96L).map(_ + 0.25)
    val a = RankStats.summarize(xsA.toDF("v"), "v", m = 64)
    val b = RankStats.summarize(xsB.toDF("v"), "v", m = 64)
    val union = xsA ++ xsB
    for (k <- Seq(1L, 10L, 100L, 1000L)) {
      val vd = RankStats.SegmentView(Seq(a, b)).descThreshold(k)
      assert(vd.isDefined, s"k=$k")
      assert(union.count(_ >= vd.get) >= k,
        s"k=$k: fewer than k rows >= ${vd.get}")
      val va = RankStats.SegmentView(Seq(a, b)).ascThreshold(k)
      assert(va.isDefined && union.count(_ <= va.get) >= k, s"k=$k asc")
    }
    for (k <- Seq(1L, 25L, 500L)) {
      val v = RankStats.SegmentView(Seq(a)).descThreshold(k).get
      assert(xsA.count(_ >= v) >= k, s"single-segment k=$k")
    }
    // k beyond the summarized rows refuses in both directions
    assert(RankStats.SegmentView(Seq(a)).descThreshold(5001L).isEmpty)
    assert(RankStats.SegmentView(Seq(a)).ascThreshold(5001L).isEmpty)
  }

  test("property sweep: across seeds, segment counts, and k values, " +
    "asc/desc thresholds and range bounds stay sound on segment views") {
    for (seed <- 1L to 5L) {
      val nSegs = 2 + (seed % 3).toInt
      val parts = (0 until nSegs).map { i =>
        val n = 500 + ((seed * 37 + i * 911) % 4000).toInt
        // overlapping, shifted, unevenly scaled ranges
        lcg(n, seed * 10 + i).map(_ * (1.0 + i * 0.7) - i * 0.2)
      }
      val segs = parts.map(xs =>
        RankStats.summarize(xs.toDF("v"), "v", m = 64))
      val view = RankStats.SegmentView(segs)
      val union = parts.flatten
      assert(view.n === union.size.toLong, s"seed $seed")
      assert(view.spansAll, s"seed $seed")
      for (k <- Seq(1L, 7L, 50L, 333L)) {
        val va = view.ascThreshold(k)
        assert(va.isDefined && union.count(_ <= va.get) >= k,
          s"seed $seed asc k=$k")
        val vd = view.descThreshold(k)
        assert(vd.isDefined && union.count(_ >= vd.get) >= k,
          s"seed $seed desc k=$k")
      }
      // k = n: ASC serves (the last point bounds everything); DESC is
      // legitimately unprovable from spans (the first point's rows
      // have no lower bound) — sound if served, honest if refused
      val all = view.ascThreshold(view.n)
      assert(all.isDefined && union.count(_ <= all.get) >= view.n,
        s"seed $seed asc k=n")
      view.descThreshold(view.n).foreach(v =>
        assert(union.count(_ >= v) >= view.n, s"seed $seed desc k=n"))
      for ((lo, hi) <- Seq((Some(0.1), Some(0.9)), (None, Some(0.4)),
          (Some(0.6), None))) {
        val bound = view.rangeUpper(lo, hi).get
        val truth = union.count(x => lo.forall(x >= _) && hi.forall(x <= _))
        assert(bound >= truth, s"seed $seed ($lo,$hi): $bound < $truth")
      }
    }
  }

  test("refresh caps segments: the append window that would exceed " +
    "maxSegments compacts via one full analyze, resetting the budget " +
    "to a single exact-spacing segment") {
    val t = freshTable(1000, seed = 101L)
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    (0 until 3).foreach { i =>
      SnapshotTable.commitAppend(spark, t,
        lcg(100, seed = 110L + i).zipWithIndex
          .map { case (v, j) => (70000L + i * 1000 + j, v, "all") }
          .toDF("id", "v", "grp"), "grp")
      val (rf, delta) = RankStats.refresh(spark, t, maxSegments = 3)
      val nSegs = rf.summaries.count(_.col == "v")
      if (i < 2) {
        assert(delta, s"append $i should take the delta path")
        assert(nSegs === i + 2, s"append $i segment count")
      } else {
        // segment compaction rides the DELTA path now: uniform-random
        // appends overlap into one cluster, recomputed by one filtered
        // summarize whose spacing is the old full-analyze budget
        assert(delta, "compaction is a delta-path fold, not an analyze")
        assert(nSegs === 1)
        assert(rf.summaries.head.errRows === (1300L + 63) / 64)
        assert(rf.summaries.head.spans, "the compacted segment spans")
      }
    }
    val q = RankStats.quantilesServed(spark, t, "v", Seq(0.5))
    assert(q.isDefined)
    assert(q.get._3 === 1300L)
  }

  test("segment compaction is O(overlap), not O(table): a value-" +
    "disjoint append history (time-ordered ingest) compacts reading " +
    "ZERO files, an overlapping tail reads only its cluster's files, " +
    "and the folded segment still serves exact arithmetic") {
    val t = java.nio.file.Files.createTempDirectory("rankstats_disj")
      .resolve("t").toString
    // statsCols gives per-file min/max on v — what the overlap
    // cluster's manifest pruning reads
    def win(lo: Int, n: Int) = (0 until n)
      .map(j => ((lo + j).toLong, (lo + j).toDouble, "all"))
      .toDF("id", "v", "grp")
    SnapshotTable.create(spark, t, win(0, 1000), "grp",
      statsCols = Seq("v"))
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    SnapshotTable.commitAppend(spark, t, win(1000, 1000), "grp")
    val (_, d1) = RankStats.refresh(spark, t, maxSegments = 2)
    assert(d1)
    SnapshotTable.commitAppend(spark, t, win(2000, 1000), "grp")
    val (rf, d2) = RankStats.refresh(spark, t, maxSegments = 2)
    assert(d2, "disjoint-history compaction stays on the delta path")
    assert(rf.summaries.count(_.col == "v") === 1,
      "3 segments over the cap fold to one")
    val (read0, total0) = RankStats.lastCompaction.get
    assert(read0 === 0,
      s"value-disjoint hulls must concatenate without reading a file " +
        s"(read $read0 of $total0)")
    val one = rf.summaries.find(_.col == "v").get
    assert(one.n === 3000L)
    assert(one.spans)
    assert(one.lo === 0.0, "the folded segment keeps the true floor")
    // quantiles stay exact arithmetic over the folded points: the
    // median of 0..2999 within the concatenated budget
    val served = RankStats.quantilesServed(spark, t, "v", Seq(0.5)).get
    assert(math.abs(served._1.head - 1499.0) <= 16.0 * 2,
      s"median ${served._1.head} err budget ${served._2}")
    // an OVERLAPPING window (straddles the folded hull) plus a
    // disjoint high window: compaction must read only the overlap
    // cluster's files — the high window's files are skipped
    SnapshotTable.commitAppend(spark, t, win(1500, 400), "grp")
    val (_, d3) = RankStats.refresh(spark, t, maxSegments = 2)
    assert(d3)
    SnapshotTable.commitAppend(spark, t, win(9000, 1000), "grp")
    val (rf2, d4) = RankStats.refresh(spark, t, maxSegments = 2)
    assert(d4)
    assert(rf2.summaries.count(_.col == "v") === 1)
    val (read1, total1) = RankStats.lastCompaction.get
    assert(read1 > 0, "the overlap cluster must re-read its files")
    assert(read1 < total1,
      s"the disjoint high window's files must be manifest-skipped " +
        s"($read1 of $total1)")
    val folded = rf2.summaries.find(_.col == "v").get
    assert(folded.n === 4400L)
    assert(folded.spans)
    // DESC top-k threshold stays armed through the whole history —
    // the span-gated proof the compaction exists to preserve
    assert(RankStats.SegmentView(Seq(folded)).descThreshold(50).isDefined)
  }

  test("a column ALL-NULL at analyze time (an empty n=0 segment) " +
    "survives segment compaction: the hull-less segment drops from " +
    "the fold instead of crashing it, and the folded stats serve the " +
    "appended rows") {
    val t = java.nio.file.Files.createTempDirectory("rankstats_nullcol")
      .resolve("t").toString
    def win(lo: Int, n: Int, nullV: Boolean) = {
      val base = (0 until n).map(j => ((lo + j).toLong, (lo + j).toDouble))
      base.map { case (id, v) =>
        (id, if (nullV) Option.empty[Double] else Some(v), "all")
      }.toDF("id", "v", "grp")
        .select(col("id"), col("v").cast("double").as("v"), col("grp"))
    }
    SnapshotTable.create(spark, t, win(0, 500, nullV = true), "grp")
    RankStats.analyze(spark, t, Seq("v"), m = 32) // n = 0 segment
    assert(RankStats.readRanks(spark, t).get.summaries.head.n === 0L)
    SnapshotTable.commitAppend(spark, t, win(1000, 500, nullV = false), "grp")
    val (_, d1) = RankStats.refresh(spark, t, maxSegments = 1)
    assert(d1)
    SnapshotTable.commitAppend(spark, t, win(2000, 500, nullV = false), "grp")
    val (rf, d2) = RankStats.refresh(spark, t, maxSegments = 1)
    assert(d2, "compaction with an n=0 segment must not fall back")
    val segs = rf.summaries.filter(_.col == "v")
    assert(segs.size === 1)
    assert(segs.head.n === 1000L, "the empty segment enclosed nothing")
    assert(segs.head.spans)
  }

  test("janitor-tick refresh keeps the span property: after an ingest " +
    "append + maintain(refreshStats), every segment still spans and " +
    "the sidecar serves at the new version") {
    val t = freshTable(2000, seed = 121L)
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    SnapshotTable.commitAppend(spark, t,
      lcg(300, seed = 122L).zipWithIndex
        .map { case (v, j) => (80000L + j, v, "all") }.toDF("id", "v", "grp"),
      "grp")
    SnapshotTable.maintain(spark, t, "grp", maxSmallFiles = 100000,
      keepVersions = 10, refreshStats = true)
    val rf = RankStats.readRanks(spark, t).get
    assert(rf.version === SnapshotTable.currentVersion(spark, t))
    assert(rf.summaries.forall(_.spans),
      "the maintenance tick must not destroy the span property")
    assert(rf.summaries.count(_.col == "v") === 2)
    assert(RankStats.quantilesServed(spark, t, "v", Seq(0.5)).isDefined)
  }

  test("compress folds to ~m points and reports the spacing it cost") {
    val vals = (1 to 1000).map(_.toDouble).toArray
    val wts = Array.fill(1000)(1L)
    val (v2, w2, add) = RankStats.compress(vals, wts, m = 100)
    assert(add === 10L)
    assert(v2.length <= 101)
    assert(w2.sum === 1000L)
    // already-small inputs pass through free
    val (v3, _, add3) = RankStats.compress(vals.take(50), wts.take(50), 100)
    assert(add3 === 0L && v3.length === 50)
  }

  private def freshTable(rows: Int, seed: Long): String = {
    val t = java.nio.file.Files.createTempDirectory("rankstats")
      .resolve("t").toString
    val df = lcg(rows, seed).zipWithIndex
      .map { case (v, i) => (i.toLong, v, "all") }
      .toDF("id", "v", "grp")
    SnapshotTable.create(spark, t, df, "grp")
    t
  }

  test("equi-depth histogram: exact regime reproduces the rank-group " +
    "truth; compressed regime preserves totals and monotone boundaries") {
    val xs = lcg(100, seed = 71L)
    val sum = RankStats.summarize(xs.toDF("v"), "v", m = 1024)
    val sorted = xs.sorted
    val h = sum.histogram(4)
    assert(h.size === 4)
    h.zipWithIndex.foreach { case ((lo, hi, rows), i) =>
      assert(rows === 25L)
      assert(lo === sorted(i * 25), s"bucket $i lo")
      assert(hi === sorted(i * 25 + 24), s"bucket $i hi")
    }
    val big = RankStats.summarize(lcg(20000, seed = 72L).toDF("v"), "v", m = 128)
    val hb = big.histogram(10)
    assert(hb.map(_._3).sum === 20000L)
    assert(hb.size <= 11)
    assert(hb.sliding(2).forall {
      case Seq((_, hi1, _), (lo2, hi2, _)) => hi1 <= lo2 && lo2 <= hi2
      case _ => true
    }, "bucket boundaries must be value-monotone")
  }

  test("sidecar round-trip + freshness: served after analyze, refused " +
    "after an un-refreshed commit, served again after refresh (delta " +
    "path on an append window, budget grows)") {
    val t = freshTable(3000, seed = 11L)
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    val served = RankStats.quantilesServed(spark, t, "v", Seq(0.5))
    assert(served.isDefined)
    val err0 = served.get._2

    SnapshotTable.commitAppend(spark, t,
      lcg(1000, seed = 12L).zipWithIndex
        .map { case (v, i) => (10000L + i, v, "all") }.toDF("id", "v", "grp"),
      "grp")
    assert(RankStats.quantilesServed(spark, t, "v", Seq(0.5)).isEmpty,
      "a stale sidecar must refuse, not guess")

    val (rf, delta) = RankStats.refresh(spark, t)
    assert(delta, "append-only window must take the delta path")
    val after = RankStats.quantilesServed(spark, t, "v", Seq(0.5))
    assert(after.isDefined)
    assert(after.get._3 === 4000L)
    assert(after.get._2 > err0, "a new segment must grow the budget, visibly")
    // span-preserving delta: a SECOND segment appears (never merged
    // in), and every segment keeps its span property — the proof the
    // DESC top-k / range-bound consumers stay armed on
    val segs = rf.summaries.filter(_.col == "v")
    assert(segs.size === 2)
    assert(segs.map(_.n).sum === 4000L)
    assert(segs.forall(_.spans), "delta segments must keep the span property")
  }

  test("refresh falls back to full analyze when files were rewritten, " +
    "resetting the budget") {
    val t = freshTable(3000, seed = 21L)
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    // delete rewrites files -> summaries cannot subtract
    SnapshotTable.commitDelete(spark, t, col("v") < lit(0.1), "grp")
    val (rf, delta) = RankStats.refresh(spark, t)
    assert(!delta, "a rewrite window must recompute")
    assert(rf.summaries.head.errRows ===
      math.max(1L, (rf.summaries.head.n + 63) / 64))
    assert(RankStats.quantilesServed(spark, t, "v", Seq(0.5)).isDefined)
  }

  test("the janitor tick keeps BOTH sidecars servable: refreshStats " +
    "advances them across appends, and survives its recorded version " +
    "being vacuumed away (falls back to a full analyze)") {
    val t = freshTable(2000, seed = 51L)
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    TableStats.analyze(spark, t, Seq("id"), k = 4096)
    (0 until 4).foreach { i =>
      SnapshotTable.commitAppend(spark, t,
        lcg(500, seed = 60L + i).zipWithIndex
          .map { case (v, j) => (50000L + i * 1000 + j, v, "all") }
          .toDF("id", "v", "grp"), "grp")
    }
    // aggressive retention: the analyze-time manifest is vacuumed, so
    // the delta proof is gone and refresh must recompute, not crash
    SnapshotTable.maintain(spark, t, "grp", keepVersions = 1,
      minAgeMs = 0L, refreshStats = true)
    val q = RankStats.quantilesServed(spark, t, "v", Seq(0.5))
    assert(q.isDefined, "rank sidecar must be servable after the tick")
    assert(q.get._3 === 4000L)
    assert(TableStats.exactDistinct(spark, t, "id",
      SnapshotTable.readManifest(spark, t,
        SnapshotTable.currentVersion(spark, t)).map(_.path)).contains(4000L),
      "ndv sidecar must be servable after the tick")
  }

  test("histogramServed carries the quantilesServed freshness proof: " +
    "served fresh, REFUSED after a delete-only commit (same data " +
    "paths, new delete files), served again after re-analyze") {
    val t = freshTable(3000, seed = 81L)
    RankStats.analyze(spark, t, Seq("v"), m = 1024)
    val h = RankStats.histogramServed(spark, t, "v", 4)
    assert(h.isDefined)
    assert(h.get.map(_._3).sum === 3000L)
    // the trap this gate exists for: a lazy delete adds DELETE files
    // without touching data paths, so a planned-path fingerprint alone
    // would still match and the histogram would count deleted rows
    SnapshotTable.commitDeleteLazy(spark, t, Seq(0L, 1L, 2L).toDF("id"), "id")
    assert(RankStats.histogramServed(spark, t, "v", 4).isEmpty,
      "a delete-only commit must refuse the histogram serve")
    assert(RankStats.quantilesServed(spark, t, "v", Seq(0.5)).isEmpty)
    RankStats.analyze(spark, t, Seq("v"), m = 1024)
    val h2 = RankStats.histogramServed(spark, t, "v", 4)
    assert(h2.isDefined)
    assert(h2.get.map(_._3).sum === 2997L,
      "re-analyzed histogram must count the masked read")
  }

  test("rebind follows a compaction without recompute; quantiles still " +
    "served at the new version") {
    val t = freshTable(2000, seed = 31L)
    // litter: several small appends, then compact
    (0 until 3).foreach { i =>
      SnapshotTable.commitAppend(spark, t,
        lcg(200, seed = 40L + i).zipWithIndex
          .map { case (v, j) => (20000L + i * 1000 + j, v, "all") }
          .toDF("id", "v", "grp"), "grp")
    }
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    val before = RankStats.quantilesServed(spark, t, "v", Seq(0.5, 0.9)).get
    SnapshotTable.compact(spark, t, "grp", smallThreshold = Long.MaxValue)
    val after = RankStats.quantilesServed(spark, t, "v", Seq(0.5, 0.9))
    assert(after.isDefined, "compaction must rebind, not invalidate")
    assert(after.get._1 === before._1)
    assert(after.get._2 === before._2)
  }
}
