package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarityExpr

/** SparkSessionExtensions entry point — makes the engine's custom
  * Catalyst expressions first-class SQL functions:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // opt-in ANN top-k rewrite (spark.graft.ann.rewrite=true)
    e.injectOptimizerRule(_ => graft.plans.AnnTopKRewrite)
    // metadata-only count/min/max over snapshot relations (on by
    // default; spark.graft.snapshot.metadataAgg=false disables)
    e.injectOptimizerRule(_ => graft.plans.MetadataAggPushdown)
    // transparent materialized-view rewrite for registered summaries
    // (on by default; spark.graft.mview.rewrite=false disables)
    e.injectOptimizerRule(_ => graft.plans.MviewRewrite)
    // manifest-sized broadcast hints for filtered snapshot join sides
    // (on by default; spark.graft.snapshot.statsBroadcast=false)
    e.injectOptimizerRule(_ => graft.plans.StatsBroadcast)
    // declared-key join elimination over snapshot relations (on by
    // default once keys are declared; spark.graft.joinElimination=false)
    e.injectOptimizerRule(_ => graft.plans.JoinElimination)
    // eager aggregation below inner equi-joins for opted-in fact tables
    // (EagerAggregation.enableFor; kill-switch spark.graft.eagerAgg)
    e.injectOptimizerRule(_ => graft.plans.EagerAggregation)
    // rank-threshold top-k prefilter for ORDER BY col LIMIT k over
    // snapshot relations (on by default once the column is
    // rank-ANALYZEd; spark.graft.snapshot.rankTopK=false disables)
    e.injectOptimizerRule(_ => graft.plans.RankTopK)
    // stats-driven inner-equi join ordering over snapshot relations
    // (opt-in: spark.graft.joinOrder=true; refuses without proven
    // manifest rows + exact NDV sketches)
    e.injectOptimizerRule(_ => graft.plans.JoinOrder)
    // IN-list dynamic file pruning for snapshot star joins (opt-in
    // per BUILD table: DynamicPrune.enableFor — planning-time
    // execution of the registered small side)
    e.injectOptimizerRule(_ => graft.plans.DynamicPrune)
    // grouped top-k prefilter for row_number()/rank() OVER
    // (PARTITION BY p ORDER BY v) <= k over snapshot relations
    // partitioned by p (on by default, proof-gated;
    // spark.graft.snapshot.windowTopK=false disables)
    e.injectOptimizerRule(_ => graft.plans.WindowTopK)
    // snapshot-table SQL surface: snapshot_table(path[, version]) and
    // snapshot_changes(path, from, to) table-valued functions
    graft.sources.SnapshotSql.tvfs.foreach { case (name, info, builder) =>
      e.injectTableFunction((new FunctionIdentifier(name), info, builder))
    }
    e.injectFunction((
      new FunctionIdentifier("topk_by"),
      new ExpressionInfo(
        classOf[graft.functions.TopKByExpr].getName, null, "topk_by",
        "_FUNC_(id, score, k) - aggregate keeping the k highest-scoring " +
          "(id, score) pairs per group, sorted score desc, ties id asc",
        "_FUNC_(bigint, double, int)"),
      // analyzer wraps a bare AggregateFunction in AggregateExpression
      exprs => graft.functions.TopKByExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("sample_k"),
      new ExpressionInfo(
        classOf[graft.functions.SampleKExpr].getName, null, "sample_k",
        "_FUNC_(id, seed, k) - deterministic bottom-k-by-md5-priority " +
          "sample per group: membership is a pure function of (seed, id), " +
          "independent of partitioning and row order",
        "_FUNC_(bigint, bigint, int)"),
      exprs => graft.functions.SampleKExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("space_saving"),
      new ExpressionInfo(
        classOf[graft.functions.SpaceSavingExpr].getName, null, "space_saving",
        "_FUNC_(item, capacity) - bounded-memory space-saving heavy-hitter " +
          "sketch per group: every item with frequency > N/capacity is " +
          "guaranteed present; counts are upper bounds with per-entry error",
        "_FUNC_(string, int)"),
      exprs => graft.functions.SpaceSavingExpr(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarityExpr].getName, null, "cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two float vectors " +
          "(zero-norm vectors map to 0.0, sklearn convention)",
        "_FUNC_(array<float>, array<float>)"),
      exprs => CosineSimilarityExpr(exprs(0), exprs(1))))
  }
}
