package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic per-sounding granule builder (FIXTURES.md §A1) for tests and
  * demos — the reference's input is external NetCDF from GES-DISC, so the
  * test pyramid generates its own ordered sounding tables with the same
  * logical schema.
  */
object SyntheticGranule {

  final case class Sounding(
      sounding_index: Long,
      sounding_id: Long,
      latitude: Double,
      longitude: Double,
      time: Timestamp,
      vertex_latitude: Seq[Double],
      vertex_longitude: Seq[Double],
      xco2_quality_flag: Int,
      xco2: Double,
      xco2_uncertainty: Double,
      operation_mode: Int,
      target_id: String)

  /** A sounding with a square footprint of `half`-degree half-width centered
    * on its position. */
  def sounding(
      idx: Long,
      lat: Double,
      lon: Double,
      mode: Int,
      target: String,
      qf: Int = 0,
      xco2: Double = 400.0,
      unc: Double = 0.5,
      half: Double = 0.6,
      day: String = "2023-06-15"): Sounding =
    Sounding(
      sounding_index = idx,
      sounding_id = 20230615000000000L + idx,
      latitude = lat,
      longitude = lon,
      time = Timestamp.valueOf(s"$day 10:30:00"),
      vertex_latitude = Seq(lat - half, lat - half, lat + half, lat + half),
      vertex_longitude = Seq(lon - half, lon + half, lon + half, lon - half),
      xco2_quality_flag = qf,
      xco2 = xco2,
      xco2_uncertainty = unc,
      operation_mode = mode,
      target_id = target)

  def toDF(spark: SparkSession, soundings: Seq[Sounding]): DataFrame = {
    import spark.implicits._
    soundings.toDF()
  }
}
