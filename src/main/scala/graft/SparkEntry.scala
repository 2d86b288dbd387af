package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's unpaid-invoice analysis
    * (streamlit/pages/2_unpaid_invoice_analysis.py:10-15) over testdata. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("j3_unpaid_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Projections.queries ++
      operators.Curation.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Streaming.queries ++
      operators.Multimodal.queries ++
      operators.Recommender.queries ++
      operators.Extensions.queries ++
      operators.FuzzyJoin.queries ++
      operators.CorpusPrep.queries ++
      operators.AsOf.queries ++
      operators.Sketch.queries ++
      operators.Maintenance.queries ++
      operators.CorpusPipeline.queries ++
      operators.CorpusQuality.queries ++
      operators.Sessionize.queries ++
      operators.SemanticDedup.queries ++
      operators.JoinReduction.queries ++
      operators.Clustering.queries ++
      operators.ProductQuant.queries ++
      operators.Typed.queries ++
      operators.Graph.queries ++
      operators.Spectral.queries ++
      operators.IvfPq.queries ++
      operators.TimeSeries.queries ++
      operators.Classify.queries ++
      operators.DataQuality.queries ++
      operators.Skyline.queries ++
      operators.Affinity.queries ++
      operators.Collocations.queries ++
      operators.Spatial.queries ++
      operators.Walks.queries ++
      operators.Hierarchy.queries ++
      operators.Density.queries ++
      operators.Diagnostics.queries ++
      sources.Sources.queries ++
      sources.Bucketing.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Projections.oracles ++
      operators.Curation.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Streaming.oracles ++
      operators.Multimodal.oracles ++
      operators.Recommender.oracles ++
      operators.Extensions.oracles ++
      operators.FuzzyJoin.oracles ++
      operators.CorpusPrep.oracles ++
      operators.AsOf.oracles ++
      operators.Sketch.oracles ++
      operators.Maintenance.oracles ++
      operators.CorpusPipeline.oracles ++
      operators.CorpusQuality.oracles ++
      operators.Sessionize.oracles ++
      operators.SemanticDedup.oracles ++
      operators.JoinReduction.oracles ++
      operators.Clustering.oracles ++
      operators.ProductQuant.oracles ++
      operators.Typed.oracles ++
      operators.Graph.oracles ++
      operators.Spectral.oracles ++
      operators.IvfPq.oracles ++
      operators.TimeSeries.oracles ++
      operators.Classify.oracles ++
      operators.DataQuality.oracles ++
      operators.Skyline.oracles ++
      operators.Affinity.oracles ++
      operators.Collocations.oracles ++
      operators.Spatial.oracles ++
      operators.Walks.oracles ++
      operators.Hierarchy.oracles ++
      operators.Density.oracles ++
      operators.Diagnostics.oracles ++
      sources.Sources.oracles ++
      sources.Bucketing.oracles
}
