package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.netcdf.{Hdf5, NetCDF3, SerializableHadoopConf}

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

  /** Dense per-slice assembly shared by both encoders: (nLat, nLon,
    * lat2d, lon2d, variable → grid). */
  private def denseSlice(cells: Array[CellRow]): (Int, Int, Array[Double], Array[Double], Seq[(String, Array[Double])]) = {
    val nLat = cells.map(_.lat_idx).max + 1
    val nLon = cells.map(_.lon_idx).max + 1
    val vars = cells.map(_.variable).distinct.sorted.toSeq
    def dense(): Array[Double] = Array.fill(nLat * nLon)(Double.NaN)
    val lat2d = dense(); val lon2d = dense()
    val grids = vars.map(v => v -> dense()).toMap
    cells.foreach { c =>
      val i = c.lat_idx * nLon + c.lon_idx
      lat2d(i) = c.lat; lon2d(i) = c.lon
      grids(c.variable)(i) = c.value
    }
    (nLat, nLon, lat2d, lon2d, vars.map(v => v -> grids(v)))
  }

  private def sliceRows(long: DataFrame): Dataset[CellRow] = {
    val spark = long.sparkSession
    import spark.implicits._
    long.select(
      col("target_id").cast("string"),
      col("time").cast("date").cast("string").as("day"),
      col("lat_idx").cast("int"),
      col("lon_idx").cast("int"),
      col("lat").cast("double"),
      col("lon").cast("double"),
      col("variable").cast("string"),
      col("value").cast("double")).as[CellRow]
  }

  /** Encode the sparse long form as one classic NetCDF file per
    * (target, day) slice under `outDir`. Returns a summary row per file. */
  def exportTargetDaily(long: DataFrame, outDir: String): Dataset[SliceFile] = {
    val spark = long.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    sliceRows(long)
      .groupByKey(r => (r.target_id, r.day))
      .mapGroups { (key: (String, String), it: Iterator[CellRow]) =>
        val (target, day) = key
        val cells = it.toArray
        val (nLat, nLon, lat2d, lon2d, grids) = denseSlice(cells)
        import NetCDF3._
        val dims = Seq(Dim("lat", nLat.toLong), Dim("lon", nLon.toLong))
        val vds =
          Seq(
            VarData("latitude", NC_DOUBLE, Seq("lat", "lon"), lat2d),
            VarData("longitude", NC_DOUBLE, Seq("lat", "lon"), lon2d)) ++
            grids.map { case (v, g) => VarData(v, NC_DOUBLE, Seq("lat", "lon"), g,
              atts = Seq(Att("_FillValue", NC_DOUBLE, Array(Double.NaN)))) }
        val out = new Path(outDir, s"${target}_$day.nc")
        val bos = new java.io.ByteArrayOutputStream()
        NetCDF3.write(
          bos, dims, vds,
          gatts = Seq(Att("target_id", NC_CHAR, target), Att("day", NC_CHAR, day)))
        ZarrStore.atomicWriteFile(conf.value, out, bos.toByteArray)
        SliceFile(target, day, out.toString, cells.length.toLong / math.max(grids.length, 1))
      }
  }

  /** Encode the sparse long form as one netCDF-4/HDF5 file per (target,
    * day) slice — deflate-compressed chunked variables, matching the
    * reference's zlib complevel 9 (`writers/NetCDFWriter.py:41-42`), with
    * lat/lon dimension-scale datasets so the files read back through the
    * `hdf5` source (and any netCDF-4 reader). Same distributed shape as
    * the classic exporter: the owning task writes each slice. */
  def exportTargetDailyH5(long: DataFrame, outDir: String, deflateLevel: Int = 9): Dataset[SliceFile] = {
    val spark = long.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    sliceRows(long)
      .groupByKey(r => (r.target_id, r.day))
      .mapGroups { (key: (String, String), it: Iterator[CellRow]) =>
        val (target, day) = key
        val cells = it.toArray
        val (nLat, nLon, lat2d, lon2d, grids) = denseSlice(cells)
        import Hdf5._
        def dimScale(name: String, n: Int) = WVar(
          name, Seq(n.toLong), new Array[Double](n),
          atts = Seq(
            Attr("CLASS", "DIMENSION_SCALE"),
            Attr("NAME", f"This is a netCDF dimension but not a netCDF variable.$n%10d")))
        val vds =
          Seq(
            dimScale("lat", nLat),
            dimScale("lon", nLon),
            WVar("latitude", Seq(nLat.toLong, nLon.toLong), lat2d,
              chunkRows = nLat, deflateLevel = deflateLevel),
            WVar("longitude", Seq(nLat.toLong, nLon.toLong), lon2d,
              chunkRows = nLat, deflateLevel = deflateLevel)) ++
            grids.map { case (v, g) =>
              WVar(v, Seq(nLat.toLong, nLon.toLong), g,
                atts = Seq(Attr("_FillValue", Array(Double.NaN))),
                chunkRows = nLat, deflateLevel = deflateLevel)
            }
        val bytes = Hdf5.write(
          Seq(WGroup("", vds)),
          rootAtts = Seq(Attr("target_id", target), Attr("day", day)))
        val out = new Path(outDir, s"${target}_$day.nc4")
        ZarrStore.atomicWriteFile(conf.value, out, bytes)
        SliceFile(target, day, out.toString, cells.length.toLong / math.max(grids.length, 1))
      }
  }

  /** Distributed global export: one netCDF-4/HDF5 file per day over the
    * FULL grid — the production-mesh shape (36000×18000 ⇒ a 5.2 GB dense
    * plane per variable) where [[exportTargetDailyH5]]'s one-slice-per-task
    * assembly cannot hold. Each (cLat × cLon) HDF5 chunk is assembled dense
    * and deflated by the task that owns it (one `groupByKey` on the chunk
    * key, bounded memory per group); only compressed chunk payloads reach
    * the per-day writer task, which lays the file out through
    * `Hdf5.WChunkedVar`. All-fill chunks are never materialized: absent
    * B-tree entries read back as the NaN fill value — the same
    * absent-empty-chunk convention as the Zarr store. Coordinates are 1-D
    * `lat`/`lon` dimension-scale vectors computed from the grid spec
    * (O(nLat + nLon), driver-free, written by the file task).
    *
    * `long` needs (variable, time, lat_idx, lon_idx, value) on the
    * ascending-index global grid; `minLon/dLon/minLat/dLat` are cell-center
    * origin and step (ZarrStore.GridSpec convention). */
  def exportGlobalDailyH5(
      long: DataFrame,
      outDir: String,
      nLon: Int,
      nLat: Int,
      minLon: Double,
      dLon: Double,
      minLat: Double,
      dLat: Double,
      cLat: Int = 250,
      cLon: Int = 250,
      deflateLevel: Int = 9): Dataset[SliceFile] = {
    val spark = long.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())

    val cells = long.select(
      col("time").cast("date").cast("string").as("day"),
      col("variable").cast("string"),
      (col("lat_idx") / cLat).cast("int").as("cy"),
      (col("lon_idx") / cLon).cast("int").as("cx"),
      (col("lat_idx") % cLat).cast("int").as("r"),
      (col("lon_idx") % cLon).cast("int").as("c"),
      col("value").cast("double"))
      .as[(String, String, Int, Int, Int, Int, Double)]

    // owner-task chunk assembly + deflate (cLat*cLon*8 bytes dense per group)
    val chunks = cells
      .groupByKey(t => (t._1, t._2, t._3, t._4))
      .mapGroups { (key: (String, String, Int, Int), it: Iterator[(String, String, Int, Int, Int, Int, Double)]) =>
        val raw = java.nio.ByteBuffer.allocate(cLat * cLon * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < cLat * cLon) { raw.putDouble(i * 8, Double.NaN); i += 1 }
        it.foreach(t => raw.putDouble((t._5 * cLon + t._6) * 8, t._7))
        val stored =
          if (deflateLevel > 0) {
            val d = new java.util.zip.Deflater(deflateLevel)
            d.setInput(raw.array()); d.finish()
            val o = new java.io.ByteArrayOutputStream(raw.capacity() / 4)
            val tmp = new Array[Byte](8192)
            while (!d.finished()) o.write(tmp, 0, d.deflate(tmp))
            d.end()
            o.toByteArray
          } else raw.array()
        (key._1, key._2, key._3, key._4, stored)
      }

    chunks
      .groupByKey(_._1)
      .mapGroups { (day: String, it: Iterator[(String, String, Int, Int, Array[Byte])]) =>
        import Hdf5._
        val byVar = it.toSeq.groupBy(_._2)
        def axis(n: Int, origin: Double, step: Double): Array[Double] =
          Array.tabulate(n)(i => origin + i * step)
        def dimScale(name: String, values: Array[Double]) = WVar(
          name, Seq(values.length.toLong), values,
          atts = Seq(
            Attr("CLASS", "DIMENSION_SCALE"),
            Attr("NAME", f"This is a netCDF dimension but not a netCDF variable.${values.length}%10d")))
        val cvars = byVar.toSeq.sortBy(_._1).map { case (variable, cs) =>
          WChunkedVar(
            variable, Seq(nLat.toLong, nLon.toLong), Seq(cLat, cLon),
            cs.map(c => (Seq(c._3.toLong * cLat, c._4.toLong * cLon), c._5)),
            atts = Seq(Attr("_FillValue", Array(Double.NaN))),
            deflateLevel = deflateLevel)
        }
        val nPix = cvars.map(_.chunks.size.toLong).sum
        val bytes = Hdf5.write(
          Seq(WGroup("",
            Seq(dimScale("lat", axis(nLat, minLat, dLat)), dimScale("lon", axis(nLon, minLon, dLon))),
            chunked = cvars)),
          rootAtts = Seq(Attr("day", day)))
        val out = new Path(outDir, s"global_$day.nc4")
        ZarrStore.atomicWriteFile(conf.value, out, bytes)
        SliceFile("global", day, out.toString, nPix)
      }
  }
}
