package graft.operators

import graft.SparkSpec

class CdcChunkingSpec extends SparkSpec {

  import CdcChunking._

  private val base =
    "the quick brown fox jumps over the lazy dog while a cold rain falls " +
    "on the quiet harbor town and every ship waits out the long grey " +
    "morning before the tide finally turns toward open water again"

  test("chunks reassemble the input exactly and respect size bounds") {
    val bytes = base.getBytes("UTF-8")
    val ends = boundaries(bytes)
    assert(ends.last == bytes.length)
    var start = 0
    ends.foreach { end =>
      val len = end - start
      assert(len > 0 && len <= maxSize)
      // only the final chunk may fall below minSize (input exhausted)
      if (end != bytes.length) assert(len >= minSize)
      start = end
    }
    // determinism
    assert(boundaries(bytes).toSeq == boundaries(bytes).toSeq)
    assert(chunksOf(base) == chunksOf(base))
    assert(chunksOf("").isEmpty)
  }

  test("identical documents produce identical chunk sequences") {
    assert(chunksOf(base) == chunksOf(new String(base.toCharArray)))
  }

  test("boundary re-sync: an edit at the front shifts content but shared " +
    "suffix chunks reappear (what whole-doc dedup cannot see)") {
    val edited = "XYZZY totally different opening words here " + base
    val a = chunksOf(base).map(_._2).toSet
    val b = chunksOf(edited).map(_._2).toSet
    val shared = a.intersect(b)
    // the rolling hash depends only on local bytes, so after the first
    // boundary past the edit the chunking of the common suffix is
    // byte-identical
    assert(shared.size >= a.size / 2,
      s"expected most suffix chunks shared, got ${shared.size} of ${a.size}")
    // and a doc with no byte overlap shares nothing
    val unrelated = chunksOf("completely disjoint vocabulary " * 8).map(_._2).toSet
    assert(a.intersect(unrelated).isEmpty)
  }

  test("shared-prefix documents share leading chunks") {
    val extended = base + " and then the night watch lights every lamp along the pier"
    val a = chunksOf(base)
    val b = chunksOf(extended)
    // chunk boundaries before the divergence point are identical
    val sharedPrefix = a.zip(b).takeWhile { case (x, y) => x == y }
    assert(sharedPrefix.nonEmpty, "leading chunks must match")
  }

  test("boundary predicate locality: (h & 31) == 0 depends only on the " +
    "last 5 bytes, so per-position cut points + min/max walk reproduce " +
    "the sequential kernel (the oracle's construction)") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val n = bytes.length
      // P(i): 5-byte sliding-window predicate, position-independent
      val p = Array.tabulate(n) { i =>
        var h = 0L
        var j = math.max(0, i - 4)
        while (j <= i) { h += gear(bytes(j) & 0xFF) << (i - j); j += 1 }
        (h & 31L) == 0L
      }
      // segmentation as the oracle does it: next cut at-or-after + bounds
      val out = Array.newBuilder[Int]
      var start = 0
      while (start < n) {
        val hard = math.min(start + maxSize, n)
        var end = -1
        var i = start + minSize - 1
        while (i < hard && end < 0) { if (p(i)) end = i + 1; i += 1 }
        if (end < 0) end = hard
        out += end
        start = end
      }
      assert(out.result().toSeq == boundaries(bytes).toSeq,
        s"predicate walk must equal sequential kernel for: ${t.take(40)}…")
    }
  }

  test("chunkStats: bytes add up and dedup accounting is exact") {
    val row = chunkStats(spark, sfDir)
    val agg = row.agg(
      org.apache.spark.sql.functions.sum("total_bytes"),
      org.apache.spark.sql.functions.sum("distinct_bytes"),
      org.apache.spark.sql.functions.sum("dup_chunk_bytes")).head()
    val (total, distinct, dup) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(total == distinct + dup, "total = distinct + duplicated")
    // total bytes equals the corpus' utf-8 length
    val corpus = graft.Tables.documents(spark, sfDir)
      .selectExpr("sum(octet_length(text))").head().getLong(0)
    assert(total == corpus, s"chunk refs must cover the corpus: $total vs $corpus")
  }

  test("overlapPairs finds planted partial-overlap docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src", "alpha beta " + base),
      (1L, "src", "gamma delta epsilon " + base), // same long suffix as 0
      (2L, "src", "totally unrelated content about nothing in particular at all")
    ).toDF("doc_id", "source", "text")
    val pairs = CdcChunking.overlapPairs(docs, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "shared-suffix pair must surface")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc stays out")
  }
}
