package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.netcdf.{NetCDF3, SerializableHadoopConf}

/** NetCDF export sink (SURVEY S10, reference `writers/NetCDFWriter.py:30-61`).
  *
  * The reference encodes each product slice as a NetCDF file. With the
  * classic-format codec in-repo the encode boundary is gone: each
  * (target, day) slice becomes one `.nc` file — 2-D (lat, lon) variables
  * over the slice's index extent, NaN where the mask dropped a pixel,
  * observed coordinates carried as 2-D arrays — written BY THE TASK that
  * owns the slice after one shuffle on the slice key. A 1000-executor
  * export writes slices concurrently; the driver never sees pixel data.
  */
object NetCDFExport {

  final case class CellRow(
      target_id: String,
      day: String,
      lat_idx: Int,
      lon_idx: Int,
      lat: Double,
      lon: Double,
      variable: String,
      value: Double)

  final case class SliceFile(target_id: String, day: String, path: String, n_pixels: Long)

  /** Encode the sparse long form as one classic NetCDF file per
    * (target, day) slice under `outDir`. Returns a summary row per file. */
  def exportTargetDaily(long: DataFrame, outDir: String): Dataset[SliceFile] = {
    val spark = long.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rows = long.select(
      col("target_id").cast("string"),
      col("time").cast("date").cast("string").as("day"),
      col("lat_idx").cast("int"),
      col("lon_idx").cast("int"),
      col("lat").cast("double"),
      col("lon").cast("double"),
      col("variable").cast("string"),
      col("value").cast("double")).as[CellRow]
    rows
      .groupByKey(r => (r.target_id, r.day))
      .mapGroups { (key: (String, String), it: Iterator[CellRow]) =>
        val (target, day) = key
        val cells = it.toArray
        val nLat  = cells.map(_.lat_idx).max + 1
        val nLon  = cells.map(_.lon_idx).max + 1
        val vars  = cells.map(_.variable).distinct.sorted
        def dense(fill: Double): Array[Double] = Array.fill(nLat * nLon)(fill)
        val lat2d = dense(Double.NaN); val lon2d = dense(Double.NaN)
        val grids = vars.map(v => v -> dense(Double.NaN)).toMap
        cells.foreach { c =>
          val i = c.lat_idx * nLon + c.lon_idx
          lat2d(i) = c.lat; lon2d(i) = c.lon
          grids(c.variable)(i) = c.value
        }
        import NetCDF3._
        val dims = Seq(Dim("lat", nLat.toLong), Dim("lon", nLon.toLong))
        val vds =
          Seq(
            VarData("latitude", NC_DOUBLE, Seq("lat", "lon"), lat2d),
            VarData("longitude", NC_DOUBLE, Seq("lat", "lon"), lon2d)) ++
            vars.map(v => VarData(v, NC_DOUBLE, Seq("lat", "lon"), grids(v),
              atts = Seq(Att("_FillValue", NC_DOUBLE, Array(Double.NaN)))))
        val out = new Path(outDir, s"${target}_$day.nc")
        val fs  = out.getFileSystem(conf.value)
        val os  = fs.create(out, true)
        try NetCDF3.write(
          os, dims, vds,
          gatts = Seq(Att("target_id", NC_CHAR, target), Att("day", NC_CHAR, day)))
        finally os.close()
        SliceFile(target, day, out.toString, cells.length.toLong / math.max(vars.length, 1))
      }
  }
}
