package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._

/** Core relational operator coverage (SURVEY §2.2/§2.4/§2.5/§2.8) expressed
  * on the driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * All double aggregates go through [[graft.functions.Portable]] so Spark and
  * DuckDB produce bit-identical results (exact decimal sums, deterministic
  * division). Every query ends in a deterministic ORDER BY on both sides.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary — hash aggregate with partial/map-side
    * combine (reference analog: climatology-style rollups, SURVEY A7).
    * Sums run through the two-limb long fast path ([[graft.functions
    * .Portable.sumFast]]): bit-identical to the decimal forms (the oracle
    * SQL is unchanged), but the aggregation buffer is plain codegen longs
    * instead of per-row Decimal adds. */
  private val q01: Q = (s, dir) => {
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum2fast(col("l_quantity")).as("sum_qty"),
        sum2fast(col("l_extendedprice")).as("sum_base_price"),
        sum6fast(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum6fast(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        avg2fast(col("l_quantity")).as("avg_qty"),
        avg2fast(col("l_extendedprice")).as("avg_price"),
        avg2fast(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate pushdown (SURVEY P1/P2/P4/P10): both the column
    * set and the filters reach the parquet scan. */
  private val q02: Q = (s, dir) => {
    Tables
      .lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
          col("l_returnflag") === lit("N") &&
          col("l_discount").between(lit(0.02), lit(0.08)))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
      |  l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      |  AND l_returnflag = 'N' AND l_discount BETWEEN 0.02 AND 0.08
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Broadcast hash join against a small dimension (SURVEY J1 — the
    * 559-entry target catalog analog). */
  private val q03: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sum2fast(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"))
  }

  private val q03Sql =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Multi-way join chain with distinct aggregate (region→nation→customer→
    * orders→lineitem); small dims broadcast, the orders⋈lineitem join
    * shuffles on the key — the shape that must hold at 100 TB. */
  private val q04: Q = (s, dir) => {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    // Pre-aggregate lineitem per order BEFORE the join: map-side partials
    // shrink the shuffle to one row per order, the COUNT DISTINCT becomes a
    // plain count (one row per order by construction — no Expand doubling
    // the fact stream through the aggregate), and the per-order limb sums
    // re-sum exactly above the join (sumFastPartial/Merge — long addition
    // is associative). At 100 TB this is the difference between shuffling
    // the fact table and shuffling the order table.
    val perOrder = l.groupBy(col("l_orderkey"))
      .agg(sumFastPartial(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("_rev"))
    perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumFastMerge(col("_rev"), 6).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q04Sql =
    """SELECT r_name, n_name, COUNT(DISTINCT o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM region
      |  JOIN nation ON n_regionkey = r_regionkey
      |  JOIN customer ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Nearest-centroid association (SURVEY J2, `OCO2Processor.py:400-435`):
    * broadcast cross join + rank-1 argmin with deterministic tie-break, and a
    * validity post-filter standing in for the bbox-intersects check. */
  private val q05: Q = (s, dir) => {
    import graft.operators.NearestJoin
    NearestJoin
      .argmin1D(
        Tables.customer(s, dir),
        Tables.supplier(s, dir),
        leftKey = "c_custkey",
        leftVal = "c_acctbal",
        rightKey = "s_suppkey",
        rightVal = "s_acctbal",
        maxDist = Some(1000.0))
      .select(col("c_custkey"), col("s_suppkey"), round(col("dist"), 2).as("dist"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """WITH d AS (
      |  SELECT c_custkey, s_suppkey, ABS(c_acctbal - s_acctbal) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY c_custkey
      |                       ORDER BY ABS(c_acctbal - s_acctbal), s_suppkey) AS rn
      |  FROM customer CROSS JOIN supplier)
      |SELECT c_custkey, s_suppkey, ROUND(dist, 2) AS dist
      |FROM d WHERE rn = 1 AND dist <= 1000
      |ORDER BY c_custkey""".stripMargin

  /** Range (theta) join — the bbox-prefilter shape (SURVEY M1/J3): equi-key
    * plus an interval predicate evaluated post-join. */
  private val q06: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_early_lines"))
      .orderBy(col("o_orderpriority"))
  }

  private val q06Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_early_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_project"  -> q02,
    "q03_broadcast_join"  -> q03,
    "q04_join_agg_multi"  -> q04,
    "q05_nearest_centroid" -> q05,
    "q06_range_join"      -> q06
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_broadcast_join"  -> q03Sql,
    "q04_join_agg_multi"  -> q04Sql,
    "q05_nearest_centroid" -> q05Sql,
    "q06_range_join"      -> q06Sql
  )
}
