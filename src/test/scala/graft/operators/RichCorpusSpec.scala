package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Non-degeneracy evidence for the round-8 rich-corpus conversions: each
  * converted operator must show a SPREAD of scores/sharing on the rich
  * corpus (the 31-token fixture saturates them — near-total overlap for
  * contamination/CDC, collapsed fingerprints for simhash), and the
  * planted group-of-4 structure must be what drives the signal. Runs at
  * sf0.01 — the gate SF, where the distributions quoted in the
  * scaladocs were measured.
  */
class RichCorpusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def sameGroup = (col("a_id").cast("long") / 4).cast("long") ===
    (col("b_id").cast("long") / 4).cast("long")

  test("set-simhash on the rich corpus is selective and group-driven, " +
    "with a non-degenerate distance spread") {
    val pairs = SimHash.simhashRichQuery(spark, dir).cache()
    val n = pairs.count()
    val total = {
      val d = Tables.documents(spark, dir).count()
      d * (d - 1) / 2
    }
    assert(n > 20, "fixture must produce a meaningful pair set")
    assert(n.toDouble / total < 0.01,
      s"selective: $n of $total pairs — raw-frequency simhash admitted 66%")
    val dists = pairs.select("hamming").distinct().collect().map(_.getInt(0))
    assert(dists.length >= 3, s"distance spread, got ${dists.toSeq.sorted}")
    assert(dists.exists(_ > 0), "not concentrated at 0")
    val intra = pairs.filter(sameGroup).count()
    assert(intra.toDouble / n > 0.9,
      s"planted groups drive the signal: $intra of $n intra-group")
  }

  test("winnowing on the rich corpus: singleton-dominated histogram with " +
    "a planted mode at the group size") {
    val h = TextAnalysis.winnowRich(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.getOrElse(1L, 0L) > 1000, "a large unshared population exists")
    // group-of-4 near-dups: the planted group size is the GLOBAL mode
    // (group members share most of their fingerprints), far above its
    // neighbors — the signal recovery this corpus exists to show
    assert(h.getOrElse(4L, 0L) === h.values.max &&
      h.getOrElse(4L, 0L) > 2 * h.getOrElse(3L, 0L) &&
      h.getOrElse(4L, 0L) > 2 * h.getOrElse(5L, 0L),
      s"planted group size must be the dominant sharing degree: $h")
    // no boilerplate collapse: broad sharing (n_docs > 10) is a sliver
    val broad = h.filter(_._1 > 10L).values.sum
    assert(broad.toDouble / h.values.sum < 0.05,
      s"broadly-shared fingerprints must stay rare: $broad of ${h.values.sum}")
  }

  test("CDC overlap on the rich corpus is selective, group-driven, and " +
    "spreads in shared-chunk counts") {
    val pairs = CdcChunking.overlapRichQuery(spark, dir).cache()
    val n = pairs.count()
    assert(n > 5, "fixture must produce overlapping pairs")
    val intra = pairs.filter(sameGroup).count()
    assert(intra === n, "chunk sharing comes from planted groups only")
    val counts = pairs.select("shared_chunks").distinct().count()
    assert(counts >= 2, "shared-chunk counts must spread, not collapse")
  }

  test("contamination on the rich corpus reports mid-range rates, " +
    "not saturation") {
    val rates = TextAnalysis.contaminationRich(spark, dir)
      .select("contam_rate").collect().map(_.getDouble(0))
    assert(rates.nonEmpty)
    assert(rates.forall(r => r > 0.0 && r < 1.0),
      s"every source strictly inside (0,1): ${rates.toSeq}")
  }
}
