package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from per-module [[QueryPack]]s; every pack
  * key that is DuckDB-expressible also appears in [[oracleSql]] (the t2
  * correctness gate); the rest get the rows-only check.
  */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    graft.search.VectorSearch,
    graft.operators.Relational,
    graft.operators.Events,
    graft.operators.TextAnalysis,
    graft.search.PatientPipeline,
    graft.operators.MinHashDedup,
    graft.operators.SimHash,
    graft.operators.CdcChunking,
    graft.operators.AnnSearch,
    graft.operators.Multimodal,
    graft.operators.AsOfJoin,
    graft.operators.SkewJoin,
    graft.operators.DedupClusters,
    graft.operators.CorpusCuration,
    graft.operators.CuratedCorpus,
    graft.operators.BucketedJoin,
    graft.search.HybridSearch,
    graft.search.QuantizedSearch,
    graft.operators.Profiling,
    graft.operators.ProductQuant,
    graft.operators.NgramLm,
    graft.operators.TextPrep,
    graft.operators.ZOrder,
    graft.sources.Ingest,
    graft.operators.IncrementalAgg,
    graft.operators.IncrementalDedup,
    graft.operators.LeakageSplit,
    graft.operators.EpochMix,
    graft.operators.GlobalShuffle,
    graft.operators.TrainingManifest,
    graft.sources.Upsert,
    graft.sources.SnapshotTable,
    graft.sources.IncrementalView,
    graft.streaming.IncrDedupStream,
    graft.streaming.SnapshotSink,
    graft.streaming.SnapshotSource,
    graft.operators.PrefixJoin,
    graft.operators.SpanDedup,
    graft.operators.TimeSeries,
    graft.sources.SnapshotCatalogPack,
    graft.sources.SecondaryIndex,
    graft.sources.PipelinePack,
    graft.sources.MaterializedView,
    graft.operators.Scd2,
    graft.plans.JoinElimination,
    graft.plans.EagerAggregation,
    graft.plans.JoinOrder,
    graft.plans.DynamicPrune,
    graft.plans.WindowTopK,
    graft.operators.TpchDerived,
    graft.sources.RankStats)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline capability: scatter-gather top-k cosine
    * similarity search (similarity_search.py:322-363).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.search.VectorSearch.scatterGather(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
