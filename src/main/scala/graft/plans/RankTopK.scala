package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.sources.{RankStats, SnapshotFileIndex}

/** `[EXT]` Rank-threshold TOP-K pushdown for snapshot tables: an
  * `ORDER BY col LIMIT k` over a bare snapshot relation plans as
  * `TakeOrderedAndProject` — which still SCANS the whole table; at
  * 100 TB, reading everything to keep twenty rows is the query shape
  * with the worst work-to-result ratio there is. When the column has a
  * rank summary, the summary's exact weighted counts prove a VALUE
  * threshold v with at least k rows at-or-under it, so the plan gains
  * a `col <= v` prefilter — which the scan's manifest min/max skipping
  * then turns into FILE pruning. On a layout clustered on the column,
  * the top-k touches the handful of files that can hold it.
  *
  * Soundness is pure arithmetic, no span property needed for ASC: a
  * summary point's cumulative weight never exceeds the true rank of
  * its value (every counted row has value ≤ some point ≤ v), so
  * `cum(j) ≥ k ⇒ at least k rows ≤ values(j)` — the k smallest all
  * survive the filter, and the Sort+Limit above it picks exactly the
  * same rows. DESC additionally needs the span property (rows counted
  * ABOVE a point must provably lie above it), so a delta-merged
  * summary serves ASC but refuses DESC until the next full analyze.
  *
  * Refusals, never guesses: fires only on a fingerprint-fresh,
  * mask-free sidecar for EXACTLY the planned file list; only when the
  * relation under the Sort is bare (any user Filter changes which rows
  * compete for the top-k and the table-wide threshold is no longer a
  * proof); only on single-table numeric sort columns with ≥ k
  * summarized rows. Null ordering is honored (a NULLS FIRST top-k
  * keeps its nulls via an `OR IS NULL` arm — the summary counts
  * non-null rows only); NaNs sort greatest in Spark and compare
  * greatest too, so a DESC threshold keeps them.
  *
  * Install per session via [[install]] or globally via
  * `spark.sql.extensions=graft.GraftExtensions`; disable with
  * `spark.graft.snapshot.rankTopK=false`.
  */
object RankTopK extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.snapshot.rankTopK"

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(FlagKey, "true") != "true") plan
    else plan.transformUp {
      case limit @ Limit(limitExpr @ IntegerLiteral(k),
          sort @ Sort(SortOrder(attr: AttributeReference, dir, nulls, _) +: _,
            true, child, _)) if k > 0 =>
        thresholdFor(child, attr, dir, nulls, k) match {
          case Some(cond) =>
            Limit(limitExpr, sort.copy(child = Filter(cond, child)))
          case None => limit
        }
    }

  /** Prove a threshold predicate for the top-`k` by `attr` over
    * `child`, or None. `child` must peel through bare Projects to an
    * unfiltered snapshot relation whose rank sidecar describes exactly
    * its planned files.
    */
  private def thresholdFor(child: LogicalPlan, attr: AttributeReference,
                           dir: SortDirection, nulls: NullOrdering,
                           k: Int): Option[Expression] = {
    if (!attr.dataType.isInstanceOf[NumericType]) return None
    // a re-run over our own output sees the injected Filter and
    // refuses here — the rewrite is convergent under a fixpoint batch
    def walk(p: LogicalPlan): Option[(SnapshotFileIndex, LogicalRelation)] =
      p match {
        case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
          walk(ch)
        case l: LogicalRelation if !l.isStreaming => l.relation match {
          case fs: HadoopFsRelation => fs.location match {
            case i: SnapshotFileIndex => Some((i, l))
            case _ => None
          }
          case _ => None
        }
        case _ => None
      }
    val (idx, rel) = walk(child).getOrElse(return None)
    val name = rel.output.find(_.exprId == attr.exprId)
      .map(_.name).getOrElse(return None)
    val spark = SparkSession.active
    val planned = idx.fileEntries.map(_.path)
    val s = RankStats.summaryFor(spark, idx.tablePath, name, planned)
      .getOrElse(return None)
    if (s.n < k) return None
    val cum = s.weights.scanLeft(0L)(_ + _).drop(1)
    val bound: Option[Double] = dir match {
      case Ascending =>
        // smallest point with cum >= k: at least k rows <= its value
        val j = cum.indexWhere(_ >= k)
        if (j < 0) None else Some(s.values(j))
      case Descending =>
        // spans needed: rows counted ABOVE point j are provably > it
        if (!s.spans) None
        else {
          val j = cum.lastIndexWhere(_ <= s.n - k)
          if (j < 0) None else Some(s.values(j))
        }
    }
    bound.flatMap { v =>
      numericLiteral(v, attr.dataType).map { lit =>
        val cmp: Expression = dir match {
          case Ascending  => LessThanOrEqual(attr, lit)
          case Descending => GreaterThanOrEqual(attr, lit)
        }
        // a top-k whose null ordering puts nulls FIRST owns its null
        // rows; the summary never counted them, so keep them explicitly
        if (nulls == NullsFirst) Or(cmp, IsNull(attr)) else cmp
      }
    }
  }

  /** The threshold as a literal of the COLUMN's own type, only when the
    * double-space value converts losslessly (summary values are real
    * column values cast to double — exact for integrals up to 2^53 and
    * for float/double by construction).
    */
  private def numericLiteral(v: Double, dt: DataType): Option[Expression] =
    dt match {
      case DoubleType => Some(Literal(v, DoubleType))
      case FloatType  => Some(Literal(v.toFloat, FloatType))
      case LongType if v == v.toLong.toDouble => Some(Literal(v.toLong, LongType))
      case IntegerType if v == v.toInt.toDouble => Some(Literal(v.toInt, IntegerType))
      case ShortType if v == v.toShort.toDouble => Some(Literal(v.toShort, ShortType))
      case _ => None
    }
}
