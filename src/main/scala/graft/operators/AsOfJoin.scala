package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row at or before
  * the left row's timestamp, per key.
  *
  * Implemented as union + ordered window (last_value ignoreNulls) instead
  * of a range join: the union sorts once per key partition —
  * O((|L|+|R|) log) — where a range-predicate join materializes every
  * (left, right-earlier) candidate pair before picking the max. Both sides
  * shuffle exactly once on the key; no broadcast requirement, no pair
  * blowup on hot keys. Ties at identical timestamps resolve right-row
  * first (≤ semantics) then by the right id, deterministically.
  */
object AsOfJoin {

  /** left ⟕asof right: attaches `rightVals` (renamed `asof_<col>`) and
    * `asof_ts` from the latest right row with right.tsCol ≤ left.tsCol,
    * null when no prior right row exists. */
  def lastPrior(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightIdCol: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = rightVals.foldLeft(
      left
        .withColumn("_side", lit(1))
        .withColumn("_rid", lit(null).cast(right.schema(rightIdCol).dataType))
        .withColumn("_asof_ts", lit(null).cast(left.schema(tsCol).dataType))
    ) { (df, c) => df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType)) }
    val rBase = right
      .select((keyCols :+ tsCol :+ rightIdCol).distinct.map(col) ++ rightVals.map(col): _*)
    var r = rBase
      .withColumn("_side", lit(0))
      .withColumn("_rid", col(rightIdCol))
      .withColumn("_asof_ts", col(tsCol))
    rightVals.foreach { c => r = r.withColumn(s"asof_$c", col(c)) }
    // null out the left-only columns on the right stream
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_rid").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled0 = l.unionByName(rAligned)
      .withColumn("asof_ts", last(col("_asof_ts"), ignoreNulls = true).over(w))
    val filled = rightVals.foldLeft(filled0) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col("asof_ts")) ++ rightVals.map(c => col(s"asof_$c")): _*)
  }
}
