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
    // one pass instead of semi ∪ anti: the two joins scanned customer and
    // orders twice each to split rows a single LEFT join against the
    // DISTINCT open-order keys labels in one go (EXISTS ⟺ key present) —
    // half the scans, one join, no union (guide §2.4). Row-identical: the
    // distinct key set makes the left join emit each customer exactly
    // once, flag = key matched.
    val c = Tables.customer(s, dir)
    val openKeys = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
      .distinct()
      .withColumn("_hit", lit(true))
    c.join(openKeys, Seq("c_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        coalesce(col("_hit"), lit(false)).as("has_open_order"))
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
        avg2fast(col("disc")).as("mean_disc"))
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

  /** Set operators: brands shipped in both 1996 and 1997 (INTERSECT) and
    * only in 1996 (EXCEPT), labeled union. */
  private val q38b: Q = (s, dir) => {
    // each year's brand set feeds BOTH set operators; without a
    // materialization the lineitem⋈part subtree executes twice per side
    // (4 fact scans). The sets are brand-bounded (≤ |p_brand| rows), so an
    // eager localCheckpoint pins each once — 2 fact scans, the set ops run
    // over checkpointed slivers (guide §3.3: materialize shared subtrees).
    val li = Tables.lineitem(s, dir)
    def brandsIn(year: Int) =
      li.filter(col("l_shipdate") >= lit(s"$year-01-01") && col("l_shipdate") < lit(s"${year + 1}-01-01"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand")).distinct().localCheckpoint()
    val b96 = brandsIn(1996)
    val b97 = brandsIn(1997)
    val both = b96.intersect(b97).withColumn("cohort", lit("both"))
    val only96 = b96.except(b97).withColumn("cohort", lit("only_1996"))
    both.unionByName(only96).orderBy(col("cohort"), col("p_brand"))
  }

  private val q38bSql =
    """WITH b96 AS (
      |  SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
      |b97 AS (
      |  SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01')
      |SELECT p_brand, 'both' AS cohort FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)
      |UNION ALL
      |SELECT p_brand, 'only_1996' AS cohort FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)
      |ORDER BY cohort, p_brand""".stripMargin

  /** CUBE over (returnflag, linestatus): all grouping-set combinations in
    * one pass. */
  private val q40: Q = (s, dir) =>
    Tables
      .lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum2fast(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q40Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val queries: Map[String, Q] = Map(
    "q35_semi_anti_join"  -> q35,
    "q36_fill_normalize"  -> q36,
    "q37_salted_rollup"   -> q37,
    "q39_intersect_except" -> q38b,
    "q40_cube"            -> q40
  )

  val oracles: Map[String, String] = Map(
    "q35_semi_anti_join"  -> q35Sql,
    "q36_fill_normalize"  -> q36Sql,
    "q37_salted_rollup"   -> q37Sql,
    "q39_intersect_except" -> q38bSql,
    "q40_cube"            -> q40Sql
  )
}
