package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module registries; each module owns
  * both the Spark program and (where SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {

  /** Module registries, merged. Later additions: ext.* (dedup, similarity,
    * text analysis), events/streaming surface.
    */
  def registry: Map[String, QuerySpec] =
    operators.Relational.all ++ reports.Quality.all ++ ext.TextOps.all ++ ext.VectorOps.all ++
      ext.EventOps.all ++ ext.ProfileOps.all ++ ext.AnalyticsOps.all ++ ext.CorpusOps.all ++
      ext.Multimodal.all ++ ext.BucketedOps.all ++ ext.PiiOps.all ++
      streaming.StreamingQueries.all ++ state.StateQueries.all ++ ingest.IngestQueries.all ++
      schemasync.SchemaSyncQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01RevenuePerProduct.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QuerySpec(_, Some(sql))) => k -> sql }
}
