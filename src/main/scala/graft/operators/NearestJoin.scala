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
      maxDist: Option[Double] = None): DataFrame = {
    val joined = left
      .crossJoin(broadcast(right))
      .withColumn("dist", abs(col(leftVal) - col(rightVal)))
    val w  = Window.partitionBy(col(leftKey)).orderBy(col("dist"), col(rightKey))
    val r1 = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    maxDist.fold(r1)(d => r1.filter(col("dist") <= lit(d)))
  }

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
      maxDist: Option[Double] = None): DataFrame = {
    val joined = left
      .crossJoin(broadcast(right))
      .withColumn("dist", hypot(col(leftX) - col(rightX), col(leftY) - col(rightY)))
    val w  = Window.partitionBy(col(leftKey)).orderBy(col("dist"), col(rightKey))
    val r1 = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    maxDist.fold(r1)(d => r1.filter(col("dist") <= lit(d)))
  }
}
