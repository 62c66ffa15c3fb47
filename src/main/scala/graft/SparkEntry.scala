package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY §2 to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against. Query
  * implementations live under `graft.queries.*`, the reusable operators
  * under `graft.operators.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.SessionQueries.queries ++
      graft.queries.AggregateQueries.queries ++
      graft.queries.GridQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++
      graft.queries.FunctionQueries.queries ++
      graft.queries.SetOpQueries.queries ++
      graft.queries.AsOfQueries.queries ++
      graft.queries.SamplingQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.DomainQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.SessionQueries.oracles ++
      graft.queries.AggregateQueries.oracles ++
      graft.queries.GridQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.EmbeddingQueries.oracles ++
      graft.queries.FunctionQueries.oracles ++
      graft.queries.SetOpQueries.oracles ++
      graft.queries.AsOfQueries.oracles ++
      graft.queries.SamplingQueries.oracles ++
      graft.queries.QualityQueries.oracles ++
      graft.queries.DomainQueries.oracles
}
