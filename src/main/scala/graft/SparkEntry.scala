package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface: one entry per implemented
  * operator from SURVEY.md §2 (plus the training-data extensions). Each entry
  * that is SQL-expressible has a DuckDB oracle in `oracleSql` with IDENTICAL
  * output column names and a total ordering, so the driver's hash compare is
  * deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.EtlOps.queries ++
      graft.queries.TrainingData.queries ++ graft.queries.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.EtlOps.oracles ++
      graft.queries.TrainingData.oracles ++ graft.queries.PipelineQueries.oracles
}
