package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Delaunay

/** Region-grouped linear (Delaunay/barycentric) scatter→grid interpolation —
  * the reference's production method (`griddata(method='linear')`,
  * SURVEY G3 / §2.10 kernel 1), with the reference's `< 4 points → nearest`
  * fallback (`OCO3SamProcessor.py:150-159`; also used when the point set is
  * degenerate, where scipy would raise).
  *
  * Shape: a `cogroup` on region_id — pixels and soundings of one region
  * meet in one task, the triangulation is built once per region and reused
  * for every pixel and variable. Regions are SAM captures (O(10³)
  * soundings, O(10⁵) pixels), so per-group state is small while regions
  * scale out across executors; this is the typed-operator alternative to a
  * custom physical node (SURVEY §4: promote only if fusion proves necessary).
  */
object LinearInterp {

  final case class PixelIn(region_id: Long, lon_idx: Int, lat_idx: Int, lon: Double, lat: Double)
  final case class PointIn(region_id: Long, sounding_index: Long, px: Double, py: Double, values: Seq[Double])
  final case class PixelOut(
      region_id: Long, lon_idx: Int, lat_idx: Int, lon: Double, lat: Double, values: Seq[Double])

  private def nearestValue(
      xs: Array[Double],
      ys: Array[Double],
      vs: Array[Double],
      qx: Double,
      qy: Double): Double = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < xs.length) {
      val dx = qx - xs(i); val dy = qy - ys(i)
      val d  = dx * dx + dy * dy
      if (d < bestD) { bestD = d; best = i } // strict < keeps first (lowest sounding_index)
      i += 1
    }
    vs(best)
  }

  /** pixels: (region_id, lon_idx, lat_idx, lon, lat, ...); soundings:
    * (region_id, sounding_index, longitude, latitude, valueCols...).
    * Returns `(region_id, lon_idx, lat_idx, lon, lat, valueCols…)` — one
    * row per pixel of a region that has soundings (NaN outside the convex
    * hull for linear/cubic; callers drop NaN rows in sparse form). Extra
    * pixel columns do NOT pass through: per-region constants belong in a
    * region-level table the caller re-attaches (bounded by region count).
    *
    * `method` ∈ nearest | linear | cubic. The kernel form of `nearest`
    * (first-minimum scan per pixel, ties to lowest sounding_index) exists
    * because the rank-1-window join materializes |pixels|×|soundings| rows
    * per region — at 10⁶ soundings that product OOMs where this cogroup
    * streams pixels against one in-memory point array per region. */
  def interpolate(
      pixels: DataFrame,
      soundings: DataFrame,
      valueCols: Seq[String],
      method: String = "linear"): DataFrame = {
    val spark = pixels.sparkSession
    import spark.implicits._
    val pin: Dataset[PixelIn] = pixels
      .select(
        col("region_id").cast("long"),
        col("lon_idx").cast("int"),
        col("lat_idx").cast("int"),
        col("lon").cast("double"),
        col("lat").cast("double"))
      .as[PixelIn]
    val sin: Dataset[PointIn] = soundings
      .select(
        col("region_id").cast("long"),
        col("sounding_index").cast("long"),
        col("longitude").cast("double").as("px"),
        col("latitude").cast("double").as("py"),
        array(valueCols.map(c => col(c).cast("double")): _*).as("values"))
      .as[PointIn]

    val out = pin
      .groupByKey(_.region_id)
      .cogroup(sin.groupByKey(_.region_id)) { (_, pit, sit) =>
        val pts = sit.toArray.sortBy(_.sounding_index)
        if (pts.isEmpty) Iterator.empty
        else {
          val xs     = pts.map(_.px)
          val ys     = pts.map(_.py)
          val triOpt =
            if (method != "nearest" && pts.length >= 4) Delaunay.triangulate(xs, ys) else None
          val perVar = valueCols.indices.map(vi => pts.map(_.values(vi))).toArray
          val aligned = triOpt.map(t => perVar.map(t.alignValues))
          val grads =
            if (method == "cubic")
              (triOpt, aligned) match {
                case (Some(tri), Some(av)) => Some(av.map(Delaunay.estimateGradients(tri, _)))
                case _                     => None
              }
            else None
          pit.map { p =>
            val vals = valueCols.indices.map { vi =>
              (triOpt, aligned) match {
                case (Some(tri), Some(av)) =>
                  grads match {
                    case Some(g) => Delaunay.interpolateCubic(tri, av(vi), g(vi), p.lon, p.lat)
                    case None    => Delaunay.interpolateLinear(tri, av(vi), p.lon, p.lat)
                  }
                case _ =>
                  nearestValue(xs, ys, perVar(vi), p.lon, p.lat)
              }
            }
            PixelOut(p.region_id, p.lon_idx, p.lat_idx, p.lon, p.lat, vals)
          }
        }
      }

    // the kernel emits the pixel coordinates itself, so the result is
    // self-contained: NO join back to `pixels` (that join was pixel-sized
    // on BOTH sides — at the 36000×18000 deploy mesh it re-shuffled the
    // whole covered-pixel set a second time for columns the cogroup
    // already held). Per-region constants (time / target / mode) are the
    // caller's to re-attach from the region-level table, which is bounded
    // by the region count, not the pixel count.
    val expanded = valueCols.zipWithIndex.foldLeft(out.toDF()) { case (df, (c, i)) =>
      df.withColumn(c, col("values")(i))
    }
    expanded.drop("values")
  }
}
