package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MinHash-LSH and SimHash verified against exact baselines. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted duplicates: exact dup, near dup (1-word edit),
  // moderately similar, and unrelated documents
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"), // = 0
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // ~ 0
    (3L, "a completely different document about spark query engines and shuffles"),
    (4L, "spark query engines shuffle data between executors during wide stages"),
    (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod")
  ).toDF("doc_id", "text")

  private def exactJaccardPairs(threshold: Double) = {
    val d = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val a = d.select(col("doc_id").as("a_id"), col("ws").as("a_ws"))
    val b = d.select(col("doc_id").as("b_id"), col("ws").as("b_ws"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jac",
        size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
          size(array_union(col("a_ws"), col("b_ws"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash finds exact and near duplicates (recall vs exact Jaccard)") {
    val got = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exactJaccardPairs(0.8)
    assert(want.nonEmpty, "planted dups must produce exact pairs")
    // verification step makes precision exact; banding gives ~0.9998
    // recall at s=0.8, and the planted pairs are at s ∈ {1.0, ~0.86}
    assert(got == want, s"got $got want $want")
  }

  test("minhash candidates shrink vs the quadratic pair space") {
    val real = Tables_docs()
    val pairs = MinHashDedup.nearDupPairs(real, "doc_id", "text", threshold = 0.8)
    // on the driver corpus the near-dup set is small but non-explosive;
    // mainly: the pipeline runs end-to-end on real data
    assert(pairs.count() >= 0)
  }

  private def Tables_docs() = graft.Tables.documents(spark, sfDir)

  test("minhash signature is deterministic and length-k") {
    val sigs = MinHashDedup.withSignature(docs, "text")
      .select("minhash_sig").collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == MinHashDedup.numHashes))
    val again = MinHashDedup.withSignature(docs, "text")
      .select("minhash_sig").collect().map(_.getSeq[Long](0))
    sigs.zip(again).foreach { case (a, b) => assert(a == b) }
  }

  test("identical texts share identical signatures; signature agreement " +
    "estimates jaccard") {
    val sigs = MinHashDedup.withSignature(docs, "text")
      .select("doc_id", "minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
      .toDouble / MinHashDedup.numHashes
    assert(agree02 > 0.5, s"near-dup signature agreement $agree02")
    val agree05 = sigs(0L).zip(sigs(5L)).count { case (a, b) => a == b }
      .toDouble / MinHashDedup.numHashes
    assert(agree05 < 0.3, s"unrelated signature agreement $agree05")
  }

  test("minhash: hot-bucket occupancy cap bounds a pathological corpus " +
    "and reports drops via accumulators") {
    // 120 identical documents: every band bucket holds all 120 docs —
    // uncapped this is 16 × 120·119/2 ≈ 114k emitted pairs; with the cap
    // every bucket is dropped, counted, and the query stays bounded
    val same = spark.range(120)
      .selectExpr("id as doc_id", "'all documents share this exact text body' as text")
    val (cands, stats) = MinHashDedup.candidatePairsWithStats(
      same, "doc_id", "text", maxBucketSize = 50)
    assert(cands.count() == 0, "capped buckets emit no pairs")
    assert(stats.buckets.value == MinHashDedup.bands,
      s"all ${MinHashDedup.bands} band buckets dropped, got ${stats.buckets.value}")
    assert(stats.slots.value == MinHashDedup.bands.toLong * 120,
      s"dropped doc slots counted, got ${stats.slots.value}")
    assert(stats.any)
    // and with the cap above occupancy, the same corpus yields all pairs
    val uncapped = MinHashDedup.nearDupPairs(same, "doc_id", "text",
      threshold = 0.8, maxBucketSize = 500)
    assert(uncapped.count() == 120L * 119 / 2)
  }

  test("minhash signature-agreement prefilter keeps true near-dups " +
    "(margin is recall-safe on the planted corpus)") {
    // with the default margin the planted one-word-edit pair (word-set
    // jaccard ≈ 0.86, shingle jaccard ≈ 0.57) must survive the prefilter
    val got = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), "exact dup")
    assert(got.contains((0L, 2L)), "one-word edit near-dup")
    // disabling the prefilter (None) can only widen the verified set
    val noPrefilter = MinHashDedup.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.8, sigAgreementMargin = None)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(noPrefilter))
  }

  test("near-dup operators enforce the bigint-id contract with a clear error") {
    val strIds = docs.selectExpr("CAST(doc_id AS STRING) AS doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      MinHashDedup.nearDupPairs(strIds, "doc_id", "text")
    }
    assert(e1.getMessage.contains("BIGINT"))
    val e2 = intercept[IllegalArgumentException] {
      SimHash.nearDupPairs(strIds, "doc_id", "text")
    }
    assert(e2.getMessage.contains("BIGINT"))
    val e3 = intercept[IllegalArgumentException] {
      MinHashDedup.exactShinglePairs(strIds, "doc_id", "text")
    }
    assert(e3.getMessage.contains("BIGINT"))
  }

  test("exact shingle all-pairs (inverted index) matches the quadratic " +
    "definition") {
    val expected = {
      val sets = docs.collect().map(r =>
        r.getLong(0) -> MinHashDedup.shingleHashesJvm(r.getString(1)).distinct.toSet)
      (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = sa.intersect(sb).size
        jac = inter.toDouble / (sa.size + sb.size - inter)
        if jac >= 0.8
      } yield (ia, ib)).toSet
    }
    val got = MinHashDedup.exactShinglePairs(docs, "doc_id", "text", 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "planted dups must qualify")
    assert(got == expected, s"got $got want $expected")
  }

  test("recall report: banding recall is 1.0 on the corpus and the " +
    "end-to-end output covers the blocked word truth it can see") {
    val row = MinHashDedup.recallReport(spark, sfDir).head()
    assert(row.getAs[Long]("n_shingle_pairs") > 0)
    assert(row.getAs[Long]("n_banded") == row.getAs[Long]("n_shingle_pairs"),
      "LSH banding must surface every exact shingle pair here")
    assert(row.getAs[Double]("recall_banding") == 1.0)
    assert(row.getAs[Long]("n_found_word") <= row.getAs[Long]("n_word_pairs"))
  }

  test("simhash: identical ⇒ distance 0; near-dup small; unrelated large") {
    val fps = SimHash.withFingerprint(docs, "text")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(fps(0L), fps(1L)) == 0)
    assert(dist(fps(0L), fps(2L)) <= 12, "one-word edit stays close")
    assert(dist(fps(0L), fps(5L)) > 12, "unrelated drifts far")
  }

  test("simhash: hot-bucket cap bounds a pathological corpus, drops are " +
    "counted, and completeness accounting is auditable") {
    // identical docs ⇒ identical fingerprints ⇒ each of the 4 chunk
    // buckets holds the whole corpus
    val same = spark.range(120)
      .selectExpr("id as doc_id", "'boilerplate text repeated across the corpus' as text")
    val (capped, stats) = SimHash.nearDupPairsWithStats(
      same, "doc_id", "text", maxBucketSize = 50)
    assert(capped.count() == 0)
    assert(stats.buckets.value == 4,
      s"4 chunk buckets dropped, got ${stats.buckets.value}")
    assert(stats.slots.value == 4L * 120,
      s"dropped slots counted, got ${stats.slots.value}")
    val uncapped = SimHash.nearDupPairs(same, "doc_id", "text", maxBucketSize = 500)
    assert(uncapped.count() == 120L * 119 / 2)
  }

  test("simhash quality report: multiset-equal docs are always found at " +
    "distance 0 (order invariance + pigeonhole completeness)") {
    val row = SimHash.qualityReport(spark, sfDir).head()
    assert(row.getAs[Long]("n_found_multiset") == row.getAs[Long]("n_multiset_pairs"),
      "every token-multiset-equal pair must surface")
    assert(row.getAs[Boolean]("multiset_complete"))
    assert(row.getAs[Long]("n_sim_in_word") <= row.getAs[Long]("n_simhash_pairs"))
    assert(row.getAs[Long]("n_sim_in_word") <= row.getAs[Long]("n_word_pairs"))
  }

  test("simhash near-dup pairs include the planted duplicates") {
    val got = SimHash.nearDupPairs(docs, "doc_id", "text", maxDistance = 3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    // pigeonhole banding guarantee: any pair within distance ≤ 3 IS found
    val all = SimHash.withFingerprint(docs, "text")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want)
  }
}
