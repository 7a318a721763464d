package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** PQ encode/ADC correctness: code-range and shape invariants, the ADC
  * score against a scalar recompute from codes + codebooks, top-k recall
  * vs the exact ranking, and build-once bookkeeping.
  */
class ProductQuantSpec extends SparkSpec {

  test("ADC scores match a scalar recompute from codes and codebooks") {
    val (path, books) = ProductQuant.ensurePqIndex(spark, sfDir)
    assert(books.length === ProductQuant.M)
    assert(books.forall(_.length === ProductQuant.K))

    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val dsub = q.length / ProductQuant.M
    val codes = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes.values.forall(cs =>
      cs.length == ProductQuant.M && cs.forall(c => c >= 0 && c < ProductQuant.K)))

    def scalarSim(cs: Seq[Byte]): Double = {
      var adot = 0.0; var anorm2 = 0.0
      for (j <- 0 until ProductQuant.M) {
        val c = books(j)(cs(j).toInt)
        var d = 0.0
        for (t <- 0 until dsub) d += q(j * dsub + t).toDouble * c(t)
        adot += d
        anorm2 += c.map(x => x * x).sum
      }
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(adot / (qn * math.sqrt(anorm2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = ProductQuant.pqQuery(spark, sfDir).collect()
    assert(got.length === 10)
    for (r <- got)
      assert(r.getDouble(1) === scalarSim(codes(r.getLong(0))), s"vec ${r.getLong(0)}")
  }

  test("pq top-10 overlaps the exact top-10 (lossy but not random)") {
    val pq = ProductQuant.pqQuery(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = graft.search.VectorSearch.knnBrute(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // 8x16 PQ on 64 dims is coarse by design (64x compression); the spec
    // pins "substantially better than the ~0.2 random-overlap baseline"
    assert((pq & exact).size >= 3, s"pq=$pq exact=$exact")
  }

  test("rerank recovers at least as many true neighbors as raw ADC, and " +
    "its sim column is the exact cosine") {
    val exact = graft.search.VectorSearch.knnBrute(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pq = ProductQuant.pqQuery(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rr = ProductQuant.pqRerankQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert((rr.map(_._1).toSet & exact.keySet).size >= (pq & exact.keySet).size)
    // every reranked hit that IS a true top-10 member carries the same
    // exact similarity knnBrute computed for it
    for ((id, sim) <- rr if exact.contains(id))
      assert(sim === exact(id), s"vec $id")
  }

  test("ivf-pq routes by partition-pruned lists and tracks the flat IVF results") {
    val df = ProductQuant.ivfPqQuery(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 10)
    // the codes scan must be partition-pruned on ivf_list
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_list"), plan)
    // same routing as flat IVF + exact rerank: the only loss vs IVF-flat
    // is ADC pool truncation — results should largely agree
    val flat = AnnSearch.ivfQuery(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivfpq = rows.map(_.getLong(0)).toSet
    assert((ivfpq & flat).size >= 6, s"ivfpq=$ivfpq flat=$flat")
  }

  test("index builds once per corpus per process") {
    val before = ProductQuant.pqBuildCount.get()
    ProductQuant.pqQuery(spark, sfDir).collect()
    ProductQuant.pqQuery(spark, sfDir).collect()
    assert(ProductQuant.pqBuildCount.get() === math.max(before, 1))
  }
}
