package graft.sources.netcdf

import java.io.OutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SyntheticGranule.Sounding

/** Granule-shaped view over the netcdf3 source plus the fixture encoder
  * (SURVEY S1, reference `readers/GranuleReader.py` + `main.py` cfg
  * `input.granules`).
  *
  * The reference reads each granule's root group (`*`) and the /Sounding
  * group vars `operation_mode`/`target_id` (ESSENTIAL_VARS,
  * `GranuleReader.py:31-36`). Here the same shape: root variables carry the
  * science columns, `Sounding/...` variables carry mode and target;
  * `toGranule` strips group prefixes and converts epoch-seconds `time` to
  * timestamp, yielding exactly the logical granule schema the pipelines
  * consume (`sounding_index, latitude, longitude, time, vertex_*, xco2*,
  * operation_mode, target_id`).
  */
object NetCDFGranules {

  /** Read granule files through the netcdf3 DataSource V2. */
  def read(spark: SparkSession, paths: Seq[String], maxRowsPerSplit: Long = 1L << 20): DataFrame =
    spark.read
      .format("netcdf3")
      .option("maxrowspersplit", maxRowsPerSplit)
      .load(paths: _*)

  /** Map the raw netcdf3 columns to the pipeline's logical granule schema.
    * Column pruning pushes through this projection to the file scan. */
  def toGranule(raw: DataFrame): DataFrame =
    raw.select(
      col("row_index").as("sounding_index"),
      col("sounding_id"),
      col("latitude"),
      col("longitude"),
      timestamp_seconds(col("time")).as("time"),
      col("vertex_latitude").cast("array<double>").as("vertex_latitude"),
      col("vertex_longitude").cast("array<double>").as("vertex_longitude"),
      col("xco2_quality_flag"),
      col("xco2"),
      col("xco2_uncertainty"),
      col("Sounding_operation_mode").as("operation_mode"),
      col("Sounding_target_id").as("target_id"),
      col("granule_path"))

  /** End-to-end convenience: files → pipeline-ready granule table. */
  def readGranules(spark: SparkSession, paths: Seq[String]): DataFrame =
    toGranule(read(spark, paths))

  /** Encode soundings as a classic (CDF-5) NetCDF granule — the fixture
    * writer for specs and the S10 export encoder. Mirrors the reference
    * granule layout: root science vars + group-qualified Sounding vars. */
  def writeGranule(os: OutputStream, soundings: Seq[Sounding], targetIdLen: Int = 24): Unit = {
    import NetCDF3._
    val n  = soundings.length
    val nv = soundings.headOption.map(_.vertex_latitude.length).getOrElse(4)
    val dims = Seq(
      Dim("sounding", n.toLong),
      Dim("vertices", nv.toLong),
      Dim("target_id_len", targetIdLen.toLong))
    def d(f: Sounding => Double): Array[Double] = soundings.map(f).toArray
    val vars = Seq(
      VarData("sounding_id", NC_INT64, Seq("sounding"), soundings.map(_.sounding_id).toArray),
      VarData("latitude", NC_DOUBLE, Seq("sounding"), d(_.latitude)),
      VarData("longitude", NC_DOUBLE, Seq("sounding"), d(_.longitude)),
      VarData("time", NC_DOUBLE, Seq("sounding"), d(_.time.getTime / 1000.0),
        atts = Seq(Att("units", NC_CHAR, "seconds since 1970-01-01 00:00:00"))),
      VarData("vertex_latitude", NC_DOUBLE, Seq("sounding", "vertices"),
        soundings.flatMap(_.vertex_latitude).toArray),
      VarData("vertex_longitude", NC_DOUBLE, Seq("sounding", "vertices"),
        soundings.flatMap(_.vertex_longitude).toArray),
      VarData("xco2_quality_flag", NC_INT, Seq("sounding"), soundings.map(_.xco2_quality_flag).toArray),
      VarData("xco2", NC_DOUBLE, Seq("sounding"), d(_.xco2),
        atts = Seq(Att("_FillValue", NC_DOUBLE, Array(999999.0)))),
      VarData("xco2_uncertainty", NC_DOUBLE, Seq("sounding"), d(_.xco2_uncertainty)),
      VarData("Sounding/operation_mode", NC_INT, Seq("sounding"), soundings.map(_.operation_mode).toArray),
      VarData("Sounding/target_id", NC_CHAR, Seq("sounding", "target_id_len"),
        soundings.map(_.target_id).toArray))
    NetCDF3.write(os, dims, vars, gatts = Seq(Att("title", NC_CHAR, "graft synthetic granule")))
  }
}
