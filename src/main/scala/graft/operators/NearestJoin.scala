package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-neighbor association joins (SURVEY J2).
  *
  * The reference associates each OCO-2 observation region with the closest
  * catalog target by brute-force argmin over 559 centroids
  * (`sam_extract/processors/OCO2Processor.py:400-435`). The Spark-native
  * form: broadcast the small side, cross join, rank-1 per left row with a
  * deterministic tie-break. The cross join never shuffles the big side
  * (BroadcastNestedLoopJoin), so the pattern holds at 100 TB as long as the
  * catalog side stays broadcast-sized.
  */
object NearestJoin {

  /** Shared argmin: group by ALL left columns (left key is unique, the rest
    * ride along) in two codegen-friendly passes — a rank-1 window or a
    * min(struct) value would force a sort / object aggregate over the whole
    * |left|×|right| product:
    *  1. min(dist) per left row: whole-stage-codegen hash aggregate with
    *     map-side partial combine (the shuffle carries one row per left row
    *     per partition, never the cross product);
    *  2. broadcast that (left, min dist) table back onto the cross product
    *     to keep min-achieving rows (dist comes from the identical
    *     expression, so equality is exact), then tie-break by
    *     min(struct(rightKey, payload)) over the tiny remainder.
    * The big side never sorts and never shuffles — the shape that holds
    * when the left side is 100 TB.
    *
    * Contract: left rows must be distinct (the reference's regions are);
    * byte-identical duplicate left rows collapse to one output row, and a
    * left row whose distance is null against every candidate (null
    * coordinates) is absent from the output (no valid match). */
  private def argminBy(
      left: DataFrame,
      right: DataFrame,
      rightKey: String,
      dist: Column,
      maxDist: Option[Double]): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == rightKey).toSeq
    val leftCols     = left.columns.toSeq
    val j   = left.crossJoin(broadcast(right)).withColumn("dist", dist)
    val m   = j.groupBy(leftCols.map(col): _*).agg(min(col("dist")).as("dist"))
    val tie = struct((col(rightKey) +: rightPayload.map(col)): _*)
    val best = j
      .join(broadcast(m), leftCols :+ "dist")
      .groupBy((leftCols :+ "dist").map(col): _*)
      .agg(min(tie).as("_b"))
    val flat = best.select(
      (leftCols.map(col) :+ col("dist") :+ col(s"_b.$rightKey")) ++
        rightPayload.map(c => col(s"_b.$c")): _*)
    maxDist.fold(flat)(d => flat.filter(col("dist") <= lit(d)))
  }

  /** 1-D nearest: for each left row, the right row minimizing
    * |leftVal - rightVal|; ties broken by smallest `rightKey`; optionally
    * drop matches farther than `maxDist` (the reference's bbox-intersects
    * validity check analog, `OCO2Processor.py:427-430`). Adds column `dist`.
    */
  def argmin1D(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftVal: String,
      rightKey: String,
      rightVal: String,
      maxDist: Option[Double] = None): DataFrame =
    argminBy(left, right, rightKey, abs(col(leftVal) - col(rightVal)), maxDist)

  /** 2-D nearest (Euclidean on a plane — the actual centroid-distance shape,
    * `OCO2Processor.py:417-421` uses sqrt(Δlat² + Δlon²)). */
  def argmin2D(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftX: String,
      leftY: String,
      rightKey: String,
      rightX: String,
      rightY: String,
      maxDist: Option[Double] = None): DataFrame =
    argminBy(
      left,
      right,
      rightKey,
      hypot(col(leftX) - col(rightX), col(leftY) - col(rightY)),
      maxDist)
}
