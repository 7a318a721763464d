package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized property coverage for the two newest kernels: the
  * greedy-merge fold (BPE re-segmentation) and the space-saving sketch.
  * Fixed seeds — deterministic runs, property-scale coverage.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refScan(syms: Vector[String], lhs: String, rhs: String): Vector[String] = {
    val res = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        res += lhs + rhs; i += 2
      } else { res += syms(i); i += 1 }
    }
    res.toVector
  }

  test("greedyMerge fold == classic i/i+1 scan on 600 random symbol arrays " +
    "over a 3-letter alphabet (worst case for overlap/chaining)") {
    val rnd = new scala.util.Random(271828)
    // tiny alphabet maximizes adjacent repeats — the regime where a wrong
    // fold diverges from the scan
    val words = Vector.fill(600)(
      Vector.fill(rnd.nextInt(12) + 1)(("a".head + rnd.nextInt(3)).toChar.toString))
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("c", "c"))
    for ((lhs, rhs) <- pairs) {
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "syms")
        .select(col("id"), CorpusCuration.greedyMerge(col("syms"), lhs, rhs).as("m"))
      val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) == refScan(w, lhs, rhs),
          s"mismatch for $w under ($lhs,$rhs): ${got(i.toLong)}")
      }
    }
  }

  test("space-saving bounds hold on random zipf-ish streams: upper-bound " +
    "counts, error covers truth, freq > N/cap items always present") {
    for (seed <- Seq(17, 4242, 90210)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: item k drawn with weight ~ 1/(k+1)
      val n = 4000
      val universe = 300
      val weights = (0 until universe).map(k => 1.0 / (k + 1))
      val total = weights.sum
      val draws = Vector.fill(n) {
        var u = rnd.nextDouble() * total
        var k = 0
        while (u > weights(k) && k < universe - 1) { u -= weights(k); k += 1 }
        f"item_$k%03d"
      }
      val truth = draws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cap = 48
      val sk = draws.map(Tuple1(_)).toDF("item").repartition(7)
        .agg(graft.functions.SpaceSavingExpr(col("item"), cap).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.cnt"), col("e.err"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sk.size <= cap)
      sk.foreach { case (item, (cnt, err)) =>
        val t = truth.getOrElse(item, 0L)
        assert(t <= cnt, s"seed=$seed $item: sketch count must upper-bound truth")
        assert(cnt - err <= t, s"seed=$seed $item: error bound must cover truth")
      }
      truth.filter(_._2 > n.toLong / cap).keys.foreach { heavy =>
        assert(sk.contains(heavy), s"seed=$seed: heavy $heavy must be present")
      }
    }
  }
}
