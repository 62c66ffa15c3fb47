package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._
import graft.operators.Skew

/** Semi/anti join coverage, fill-value normalization (SURVEY P3), and
  * salted skew-resistant aggregation (equal-by-construction to the plain
  * rollup, oracle-checked against it).
  */
object SetOpQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Semi + anti join: customers with ≥1 open order (EXISTS) and customers
    * with none (NOT EXISTS), as one labeled union. */
  private val q35: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    val withO = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .withColumn("has_open_order", lit(true))
    val withoutO = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .withColumn("has_open_order", lit(false))
    withO.unionByName(withoutO)
      .select(col("c_custkey"), col("c_mktsegment"), col("has_open_order"))
      .orderBy(col("c_custkey"))
  }

  private val q35Sql =
    """SELECT c_custkey, c_mktsegment, TRUE AS has_open_order
      |FROM customer WHERE EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |UNION ALL
      |SELECT c_custkey, c_mktsegment, FALSE AS has_open_order
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** P3 fill-value normalization: sentinel (0.0 discount = "no value") →
    * null at decode, then null-skipping aggregates — the reference's
    * `_FillValue → NaN` semantics (`GranuleReader.py:149-151`). */
  private val q36: Q = (s, dir) =>
    Tables
      .lineitem(s, dir)
      .withColumn("disc", when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc")).as("n_valid"),
        avg2(col("disc")).as("mean_disc"))
      .orderBy(col("l_returnflag"))

  private val q36Sql =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  COUNT(NULLIF(l_discount, 0.0)) AS n_valid,
      |  CAST(SUM(CAST(NULLIF(l_discount, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(NULLIF(l_discount, 0.0)) AS mean_disc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Salted two-phase aggregation — identical results to a plain groupBy
    * (the oracle IS the plain form), executed skew-resistant. */
  private val q37: Q = (s, dir) =>
    Skew
      .saltedSumCount(
        Tables.lineitem(s, dir),
        Seq("l_returnflag"),
        "l_extendedprice",
        saltSource = col("l_orderkey"),
        buckets = 16)
      .orderBy(col("l_returnflag"))

  private val q37Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "q35_semi_anti_join"  -> q35,
    "q36_fill_normalize"  -> q36,
    "q37_salted_rollup"   -> q37
  )

  val oracles: Map[String, String] = Map(
    "q35_semi_anti_join"  -> q35Sql,
    "q36_fill_normalize"  -> q36Sql,
    "q37_salted_rollup"   -> q37Sql
  )
}
