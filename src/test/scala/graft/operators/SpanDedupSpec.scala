package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SpanDedup]] — C4-style cross-document span dedup. Pins the window
  * semantics on a hand-built corpus where every case is enumerable:
  * first occurrence wins by (doc_id, span index), remainders are
  * exempt, zero-span docs pass through untouched.
  */
class SpanDedupSpec extends SparkSpec {

  private def w(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("first occurrence wins, remainder is exempt, short docs pass " +
    "through, reassembly preserves span order") {
    import spark.implicits._
    val dup = w(10, "dup")     // a span repeated across docs
    val a10 = w(10, "a")
    val b10 = w(10, "b")
    val shortTail = "tail one two"
    val docs = Seq(
      // doc 0: unique span + the dup span (first occurrence) + tail
      (0L, s"$a10 $dup $shortTail"),
      // doc 1: dup span again (dropped) + unique span
      (1L, s"$dup $b10"),
      // doc 2: only the dup span (dropped entirely) + tail survives
      (2L, s"$dup $shortTail"),
      // doc 3: shorter than one span — never touched
      (3L, "just a few words")
    ).toDF("doc_id", "text")

    val out = SpanDedup.dedupSpans(docs, spanWords = 10)
      .orderBy("doc_id").collect()

    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 0L), (3L, 0L, 0L)))

    // reassembled text hashes equal the hand-computed survivors
    val expected = Seq(
      0L -> s"$a10 $dup $shortTail",
      1L -> b10,
      2L -> shortTail,
      3L -> "just a few words")
    val got = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    expected.foreach { case (id, text) =>
      val exp = spark.range(1).select(md5(lit(text))).head().getString(0)
      assert(got(id) === exp, s"doc $id reassembly")
    }
  }

  test("dedup is idempotent: running over already-deduped spans removes " +
    "nothing more") {
    import spark.implicits._
    val docs = Seq(
      (0L, w(10, "x") + " " + w(10, "y")),
      (1L, w(10, "x") + " " + w(10, "z"))).toDF("doc_id", "text")
    val once = SpanDedup.dedupSpans(docs, spanWords = 10)
      .agg(sum("n_kept")).head().getLong(0)
    assert(once === 3L)
  }
}
