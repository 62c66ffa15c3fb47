package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-portable arithmetic helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against a
  * DuckDB run of `SparkEntry.oracleSql`. Floating-point SUM/AVG are
  * order-dependent, and Spark and DuckDB do not aggregate in the same order,
  * so every aggregate we expose routes double columns through exact decimal
  * arithmetic and casts the *final* value back to double. Both engines then
  * produce bit-identical doubles.
  *
  * Timestamps are emitted as formatted strings (or DATEs) because the test
  * parquet stores nanosecond timestamps: DuckDB keeps ns precision while
  * Spark truncates to microseconds, so raw timestamp output would never
  * hash-match.
  */
object Portable {
  /** Exact 2-dp decimal view of a double column (money-like values). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 6-dp decimal view of a double column (derived products). */
  def dec6(c: Column): Column = c.cast(DecimalType(28, 6))

  /** Order-insensitive exact sum of a money-like double column, as double.
    * Oracle SQL equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def sum2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of a 6-dp product term, as double.
    * Oracle: CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE). */
  def sum6(c: Column): Column = sum(dec6(c)).cast("double")

  /** Deterministic average: exact decimal sum divided by count, as double.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x). */
  def avg2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** Order-deterministic sum of arbitrary doubles (aggregate context).
    *
    * Decimal casts are only portable for conceptually low-scale values
    * (money-like data); an arbitrary double cast to decimal rounds via
    * shortest-representation in Spark but exact-binary in DuckDB, which
    * diverges near scale boundaries. For arbitrary doubles the portable form
    * is a sequential left fold in a deterministic order — identical operand
    * order + identical IEEE adds = identical bits in both engines.
    *
    * Oracle SQL equivalent:
    *   list_reduce(list(v ORDER BY k1, k2, ...), (a,b) -> a + b)
    *
    * `orderKeys` must totally order the group's rows.
    */
  def orderedSumDouble(value: Column, orderKeys: Seq[Column]): Column = {
    val fields = orderKeys.zipWithIndex.map { case (c, i) => c.as(s"_k$i") } :+ value.as("_v")
    aggregate(
      transform(array_sort(collect_list(struct(fields: _*))), x => x("_v")),
      lit(0.0),
      (acc, v) => acc + v)
  }

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second precision).
    * Oracle: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Whole-second epoch difference b - a, matching DuckDB
    * date_diff('second', a, b) (boundary count == floor-epoch delta for our
    * positive, post-1970 data). */
  def secondsBetween(a: Column, b: Column): Column =
    unix_timestamp(b) - unix_timestamp(a)
}
