package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed by graft's custom Catalyst
  * expressions (Spark 4 removed the public Column(Expression) constructor in
  * favor of column nodes). Standard practice for Spark extension libraries;
  * kept to the column conversions plus one plan barrier.
  */
object GraftSqlBridge {
  def column(e: Expression): Column    = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Lineage barrier: a DataFrame whose plan is a LogicalRDD over `df`'s
    * physical rows — the inside of `Dataset.checkpoint` without forcing a
    * new materialization, so a persisted `df` keeps serving from its cache
    * while downstream plans stop nesting its lineage. Needed by step
    * chains whose stages reference their input more than once (a
    * union-of-two-branches step DOUBLES the logical plan; ~12 such stages
    * exceeded the JVM's 1 GB string limit just RENDERING the plan —
    * measured in the corpusjob probe). Rows are copied (the
    * InMemoryTableScan reuses row buffers; same copy `checkpoint` does).
    * The barrier frame has default (unknown-size) stats — size-based
    * broadcast decisions downstream of it need explicit `broadcast()`. */
  def planBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd.map(_.copy()), ds.schema, isStreaming = false)
  }
}
