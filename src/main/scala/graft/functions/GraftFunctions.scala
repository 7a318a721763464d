package graft.functions

import org.apache.spark.sql.SparkSession

import graft.operators.{MinHashDedup, SimHash}

/** Session-scoped SQL registration of the dedup kernels, so a SQL-only
  * user can run the near-dup pipeline without touching the Scala API:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("""
  *   SELECT a.doc_id, b.doc_id,
  *          sig_agreement(minhash_sig(a.text), minhash_sig(b.text)) est
  *   FROM docs a JOIN docs b ON ...""")
  * }}}
  *
  * (`cosine_similarity` and `topk_by` are injected as native Catalyst
  * expressions by [[graft.GraftExtensions]]; these three are plain Scala
  * UDF kernels — string-heavy per-row work where a fused JVM function
  * beats an HOF column tree.)
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("minhash_sig",
      (text: String) => MinHashDedup.signatureOf(text))
    spark.udf.register("simhash64",
      (text: String) => SimHash.fingerprintOf(text.split(' ').toSeq))
    spark.udf.register("sig_agreement",
      (a: Seq[Long], b: Seq[Long]) => {
        val n = math.min(a.length, b.length)
        if (n == 0) 0.0
        else {
          var m = 0
          var i = 0
          while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
          m.toDouble / n
        }
      })
  }
}
