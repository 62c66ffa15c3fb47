package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Temporal-aggregate climatology (SURVEY A7/A8,
  * `tools/climatology/main.py:151-486`).
  *
  * The reference's companion tool computes per-span temporal means over the
  * output store (monthly / seasonal / annual), plus a "monthly consolidated"
  * second level that averages the monthly means per month-of-year —
  * explicitly mean-of-monthly-means, not mean-of-days
  * (`tools/climatology/main.py:281-329`).
  *
  * In Spark each level is one hash aggregate with map-side partial
  * aggregation; on a time-partitioned store the span filter prunes
  * partitions before the scan.
  */
object Climatology {

  /** Span start boundary: calendar units via date_trunc, plus "season" =
    * meteorological season (DJF/MAM/JJA/SON — the reference's seasonal
    * climatology mode, `tools/climatology/main.py:183-210`), computed as
    * quarter-truncate of (ts + 1 month) minus 1 month so December joins the
    * following DJF. */
  def spanStart(ts: Column, span: String): Column = span match {
    case "season" =>
      date_trunc("quarter", ts + expr("INTERVAL 1 MONTH")) - expr("INTERVAL 1 MONTH")
    case unit => date_trunc(unit, ts)
  }

  /** Per-span mean/count over a value column, grouped by extra keys.
    * `span` ∈ {"month", "quarter", "season", "year", ...}. */
  def temporalMean(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      span: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val spanCol = date_format(spanStart(col(tsCol), span), "yyyy-MM-dd").as("span_start")
    df.groupBy(spanCol +: keyCols.map(col): _*)
      .agg(
        avg2(col(valueCol)).as("mean_value"),
        count(col(valueCol)).as("valid_count"),
        countDistinct(col(tsCol).cast("date")).as("n_days"))
  }

  /** Second-level consolidation: group first-level monthly means by
    * month-of-year and average the means (mean-of-means), summing counts.
    * `monthOf` must extract the month number from span_start. */
  def consolidateMonthly(monthly: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val m = month(to_date(col("span_start"))).as("month_of_year")
    import graft.functions.Portable.orderedSumDouble
    monthly
      .groupBy(m +: keyCols.map(col): _*)
      .agg(
        // order-deterministic fold of the (double) monthly means
        (orderedSumDouble(col("mean_value"), Seq(col("span_start"))) / count(col("mean_value")))
          .as("mean_of_means"),
        sum(col("valid_count")).as("valid_count"),
        sum(col("n_days")).as("n_days"))
  }
}
