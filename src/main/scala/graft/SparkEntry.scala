package graft

import graft.core.Q
import graft.operators.{Analytics, ApiQueries, AsOf, CsvQueries, Events, ForecastQueries, IntentQueries, Kpi, Layout, MediaQueries, Pipeline, Quantiles, Relational, ScalePatterns, Similarity, TextCuration, TrainPrep}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query; entries with an
  * oracle participate in the driver's DuckDB differential correctness gate.
  */
object SparkEntry {

  /** The full query catalog. Extend this list as modules land. */
  def catalog: Seq[Q] =
    Relational.all ++ Events.all ++ Pipeline.all ++ Similarity.all ++
      IntentQueries.all ++ ForecastQueries.all ++ Kpi.all ++ ApiQueries.all ++
      CsvQueries.all ++ MediaQueries.all ++ ScalePatterns.all ++
      TrainPrep.all ++ AsOf.all ++ TextCuration.all ++ Analytics.all ++
      Layout.all ++ Quantiles.all ++ graft.operators.Hnsw.all ++
      graft.operators.Bpe.all ++ graft.streaming.StreamParity.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.plan(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.plan).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
