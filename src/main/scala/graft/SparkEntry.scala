package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 exposed as a
  * `(SparkSession, sfDir) => DataFrame`; [[oracleSql]] carries the DuckDB
  * equivalent the driver hash-compares against. Column names/types are kept
  * identical on both sides and every query is totally ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01AggPushdown(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Parsing.queries ++
      graft.queries.Enrichment.queries ++
      graft.queries.Sharded.queries ++
      graft.queries.LlmPipeline.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.CorpusExtras.queries ++
      graft.queries.PipelineExtras.queries ++
      graft.queries.Round8.queries ++
      graft.queries.Round9.queries ++
      graft.queries.Round11.queries ++
      graft.queries.Round12.queries ++
      graft.queries.Round13.queries ++
      graft.queries.Round15.queries ++
      graft.queries.Round16.queries ++
      graft.queries.Round17.queries ++
      graft.queries.Round18.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Parsing.oracles ++
      graft.queries.Enrichment.oracles ++
      graft.queries.Sharded.oracles ++
      graft.queries.LlmPipeline.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.CorpusExtras.oracles ++
      graft.queries.PipelineExtras.oracles ++
      graft.queries.Round8.oracles ++
      graft.queries.Round9.oracles ++
      graft.queries.Round11.oracles ++
      graft.queries.Round12.oracles ++
      graft.queries.Round13.oracles ++
      graft.queries.Round15.oracles ++
      graft.queries.Round16.oracles ++
      graft.queries.Round17.oracles ++
      graft.queries.Round18.oracles
}
