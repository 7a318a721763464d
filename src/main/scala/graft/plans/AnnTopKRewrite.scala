package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.CosineSimilarityExpr
import graft.operators.AnnSearch

/** Optimizer rule (SURVEY.md §4 candidate 2): rewrite
  *
  * {{{ ORDER BY cosine_similarity(emb, <literal query vector>) DESC LIMIT k }}}
  *
  * over a relation carrying an `lsh_bucket` column into the same plan with
  * an injected `lsh_bucket IN (probe buckets)` filter — turning an
  * O(corpus) scan into a partition-/bucket-pruned scan when the index is
  * stored bucket-partitioned ([[graft.sources.TableIO.writeAnnIndex]]).
  *
  * This trades exactness for scan volume (recall follows the
  * random-hyperplane collision bound), so it is strictly OPT-IN:
  *
  *  - `spark.graft.ann.rewrite = true`    enable (default false)
  *  - `spark.graft.ann.planes  = 4`       hyperplane count (must match the
  *                                        bucketing of the stored index)
  *  - `spark.graft.ann.seed    = 42`      hyperplane seed (ditto)
  *
  * The probe set is the query's own bucket plus all 1-bit flips
  * (multiprobe), mirroring [[AnnSearch.probeBuckets]]. Registered via
  * [[graft.GraftExtensions]] `injectOptimizerRule`.
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  private val BucketCol = "lsh_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.ann.rewrite", "false").toBoolean) return plan
    val nPlanes = conf.getConfString("spark.graft.ann.planes", "4").toInt
    val seed = conf.getConfString("spark.graft.ann.seed", "42").toLong

    plan.transformDown {
      // head sort key = similarity DESC; trailing unique tiebreakers are
      // allowed (they don't change the approximate-scan trade)
      case limit @ Limit(_, sort @ Sort(
          SortOrder(attr: Attribute, Descending, _, _) +: _, true,
          project @ Project(projectList, child), _))
          if child.output.exists(_.name == BucketCol) =>
        queryVectorFor(attr, projectList) match {
          case Some(qVec) if qVec.nonEmpty =>
            val bucketAttr = child.output.find(_.name == BucketCol).get
            val planes = AnnSearch.hyperplanes(nPlanes, qVec.length, seed)
            val probes = AnnSearch.probeBuckets(qVec, planes)
            val pruned = Filter(
              In(bucketAttr, probes.map(b => Literal(b))), child)
            limit.withNewChildren(Seq(
              sort.withNewChildren(Seq(
                project.withNewChildren(Seq(pruned))))))
          case _ => limit
        }
    }
  }

  /** If `attr` is an alias over (possibly rounded) cosine similarity
    * against a literal float vector, extract that vector.
    */
  private def queryVectorFor(attr: Attribute,
                             projectList: Seq[NamedExpression]): Option[Array[Float]] =
    projectList.collectFirst {
      case a @ Alias(aliased, _) if a.exprId == attr.exprId =>
        aliased.collectFirst {
          case CosineSimilarityExpr(_, lit @ Literal(_, ArrayType(FloatType, _))) =>
            literalFloats(lit)
          case CosineSimilarityExpr(lit @ Literal(_, ArrayType(FloatType, _)), _) =>
            literalFloats(lit)
        }
    }.flatten

  private def literalFloats(l: Literal): Array[Float] =
    l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
}
