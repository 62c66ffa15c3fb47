package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal tiled GeoTIFF codec (SURVEY S9, reference
  * `writers/CoGWriter.py:102-217`).
  *
  * Cloud-Optimized GeoTIFF layout from the public TIFF 6.0 + GeoTIFF specs:
  * little-endian, header + IFD at the FRONT of the file (the
  * cloud-optimized property: readers fetch metadata with one ranged read),
  * 256×256 tiles of IEEE float64 samples (NaN = nodata), and the GeoTIFF
  * georeferencing tags (ModelPixelScale, ModelTiepoint, GeoKeyDirectory
  * with EPSG:4326 geographic keys). Overview levels — the remaining delta
  * to a full CoG pyramid — are documented out of scope this round.
  *
  * Encoder + decoder are symmetric so exports are verifiable in-repo.
  */
object GeoTiff {

  val TileSize = 256

  /** Encode one north-up raster (row 0 = northernmost; callers flip lat
    * ascending → descending first, the G6 flip) with georeferencing:
    * `originLon/originLat` = outer corner of pixel (0,0), `scaleLon/
    * scaleLat` = pixel size in degrees (scaleLat positive; stored per
    * GeoTIFF convention). */
  def encode(
      data: Array[Double], // row-major, length = width*height
      width: Int,
      height: Int,
      originLon: Double,
      originLat: Double,
      scaleLon: Double,
      scaleLat: Double): Array[Byte] = {
    require(data.length == width * height, "data length must be width*height")
    val tilesX  = (width + TileSize - 1) / TileSize
    val tilesY  = (height + TileSize - 1) / TileSize
    val nTiles  = tilesX * tilesY
    val tileLen = TileSize * TileSize * 8

    // tag payloads that overflow the 4-byte inline value go after the IFD
    def shorts(v: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(v.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(x => b.putShort(x.toShort)); b.array()
    }
    def longsA(v: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(x => b.putInt(x.toInt)); b.array()
    }
    def doubles(v: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(b.putDouble); b.array()
    }

    // GeoKeyDirectory: version 1.1.0, 3 keys — model type geographic(2),
    // raster type PixelIsArea(1), geographic CS EPSG:4326
    val geoKeys = Seq(
      1, 1, 0, 3,
      1024, 0, 1, 2,
      1025, 0, 1, 1,
      2048, 0, 1, 4326)

    // --- build IFD with a two-pass offset resolution ---
    val tileOffsetsPlaceholder = Seq.fill(nTiles)(0L)
    val entriesSpec: Seq[(Int, Int, Int, Either[Long, Array[Byte]])] = Seq(
      (256, 4, 1, Left(width.toLong)),                            // ImageWidth
      (257, 4, 1, Left(height.toLong)),                           // ImageLength
      (258, 3, 1, Left(64L)),                                     // BitsPerSample
      (259, 3, 1, Left(1L)),                                      // Compression = none
      (262, 3, 1, Left(1L)),                                      // Photometric = BlackIsZero
      (277, 3, 1, Left(1L)),                                      // SamplesPerPixel
      (322, 3, 1, Left(TileSize.toLong)),                         // TileWidth
      (323, 3, 1, Left(TileSize.toLong)),                         // TileLength
      (324, 4, nTiles, Right(longsA(tileOffsetsPlaceholder))),    // TileOffsets (patched)
      (325, 4, nTiles, Right(longsA(Seq.fill(nTiles)(tileLen.toLong)))), // TileByteCounts
      (339, 3, 1, Left(3L)),                                      // SampleFormat = IEEE float
      (33550, 12, 3, Right(doubles(Seq(scaleLon, scaleLat, 0.0)))),       // ModelPixelScale
      (33922, 12, 6, Right(doubles(Seq(0.0, 0.0, 0.0, originLon, originLat, 0.0)))), // ModelTiepoint
      (34735, 3, geoKeys.length, Right(shorts(geoKeys))))         // GeoKeyDirectory

    val headerLen  = 8
    val ifdLen     = 2 + entriesSpec.length * 12 + 4
    var payloadOff = headerLen + ifdLen
    val payloadPos = entriesSpec.map {
      case (_, _, _, Right(p)) if p.length > 4 => val o = payloadOff; payloadOff += p.length; Some(o.toLong)
      case _                                   => None
    }
    val dataStart       = (payloadOff + 7) / 8 * 8
    val tileOffsetsReal = (0 until nTiles).map(i => dataStart.toLong + i.toLong * tileLen)
    // patch the TileOffsets payload now that data start is known
    val resolved = entriesSpec.zipWithIndex.map {
      case ((324, t, c, Right(_)), i) => ((324, t, c, Right(longsA(tileOffsetsReal))), i)
      case (e, i)                     => (e, i)
    }

    val out = ByteBuffer.allocate(dataStart + nTiles * tileLen).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerLen)
    out.putShort(resolved.length.toShort)
    resolved.foreach { case ((tag, typ, count, v), i) =>
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      v match {
        case Left(inline) => out.putInt(inline.toInt)
        case Right(p) if p.length <= 4 =>
          val b = java.util.Arrays.copyOf(p, 4); out.put(b)
        case Right(_) => out.putInt(payloadPos(i).get.toInt)
      }
    }
    out.putInt(0) // next IFD
    resolved.foreach { case ((_, _, _, v), i) =>
      v match {
        case Right(p) if p.length > 4 => out.position(payloadPos(i).get.toInt); out.put(p)
        case _                        => ()
      }
    }
    out.position(dataStart)
    var ty = 0
    while (ty < tilesY) {
      var tx = 0
      while (tx < tilesX) {
        var r = 0
        while (r < TileSize) {
          var c = 0
          while (c < TileSize) {
            val row = ty * TileSize + r
            val col = tx * TileSize + c
            out.putDouble(if (row < height && col < width) data(row * width + col) else Double.NaN)
            c += 1
          }
          r += 1
        }
        tx += 1
      }
      ty += 1
    }
    out.array()
  }

  /** Decoded raster + georeferencing. */
  final case class Raster(
      data: Array[Double],
      width: Int,
      height: Int,
      originLon: Double,
      originLat: Double,
      scaleLon: Double,
      scaleLat: Double)

  /** Decode a GeoTIFF produced by [[encode]] (single IFD, float64 tiles). */
  def decode(bytes: Array[Byte]): Raster = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(in.get() == 'I' && in.get() == 'I' && in.getShort() == 42, "not a little-endian TIFF")
    in.position(in.getInt(4))
    val n = in.getShort().toInt
    var width = 0; var height = 0; var tileW = TileSize; var tileH = TileSize
    var tileOffsets: Array[Long] = Array.empty
    var scale: Array[Double] = Array(0, 0, 0); var tie: Array[Double] = Array.fill(6)(0.0)
    (0 until n).foreach { i =>
      val base  = 8 + 2 + i * 12
      val tag   = in.getShort(base) & 0xffff
      val count = in.getInt(base + 4)
      val value = in.getInt(base + 8)
      def payloadDoubles(c: Int): Array[Double] = {
        val b = ByteBuffer.wrap(bytes, value, c * 8).order(ByteOrder.LITTLE_ENDIAN)
        Array.fill(c)(b.getDouble())
      }
      tag match {
        case 256   => width = value
        case 257   => height = value
        case 322   => tileW = value
        case 323   => tileH = value
        case 324 =>
          tileOffsets =
            if (count == 1) Array(value.toLong)
            else {
              val b = ByteBuffer.wrap(bytes, value, count * 4).order(ByteOrder.LITTLE_ENDIAN)
              Array.fill(count)(b.getInt().toLong)
            }
        case 33550 => scale = payloadDoubles(3)
        case 33922 => tie = payloadDoubles(6)
        case _     => ()
      }
    }
    val tilesX = (width + tileW - 1) / tileW
    val data   = Array.fill(width * height)(Double.NaN)
    tileOffsets.zipWithIndex.foreach { case (off, t) =>
      val ty = t / tilesX; val tx = t % tilesX
      val b  = ByteBuffer.wrap(bytes, off.toInt, tileW * tileH * 8).order(ByteOrder.LITTLE_ENDIAN)
      var r = 0
      while (r < tileH) {
        var c = 0
        while (c < tileW) {
          val row = ty * tileH + r; val col = tx * tileW + c
          val v   = b.getDouble()
          if (row < height && col < width) data(row * width + col) = v
          c += 1
        }
        r += 1
      }
    }
    Raster(data, width, height, tie(3), tie(4), scale(0), scale(1))
  }
}

/** Distributed CoG-style export: one GeoTIFF per (target, variable, day)
  * slice, latitude flipped to north-up (G6), written by the owning task. */
object CoGExport {

  import org.apache.hadoop.fs.Path
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import graft.sources.netcdf.SerializableHadoopConf

  final case class SliceFile(target_id: String, variable: String, day: String, path: String)

  def exportSlices(long: DataFrame, outDir: String): Dataset[SliceFile] = {
    val spark = long.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rows = long.select(
      col("target_id").cast("string"),
      col("variable").cast("string"),
      col("time").cast("date").cast("string").as("day"),
      col("lat_idx").cast("int"),
      col("lon_idx").cast("int"),
      col("lat").cast("double"),
      col("lon").cast("double"),
      col("value").cast("double"))
      .as[(String, String, String, Int, Int, Double, Double, Double)]
    rows
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups { (key: (String, String, String), it: Iterator[(String, String, String, Int, Int, Double, Double, Double)]) =>
        val (target, variable, day) = key
        val cells = it.toArray
        val nLat  = cells.map(_._4).max + 1
        val nLon  = cells.map(_._5).max + 1
        val data  = Array.fill(nLat * nLon)(Double.NaN)
        cells.foreach { c =>
          // G6 flip: lat_idx ascends south→north; raster row 0 is north
          data((nLat - 1 - c._4) * nLon + c._5) = c._8
        }
        // the grid is an exact linspace: any two cells with distinct indices
        // recover the step; extrapolate to index 0 / nLat-1 for the origin
        val byLon = cells.sortBy(_._5)
        val dLon =
          if (byLon.last._5 == byLon.head._5) 1.0
          else (byLon.last._7 - byLon.head._7) / (byLon.last._5 - byLon.head._5)
        val byLat = cells.sortBy(_._4)
        val dLat =
          if (byLat.last._4 == byLat.head._4) 1.0
          else (byLat.last._6 - byLat.head._6) / (byLat.last._4 - byLat.head._4)
        val lon0   = byLon.head._7 - byLon.head._5 * dLon
        val latTop = byLat.last._6 + (nLat - 1 - byLat.last._4) * dLat
        val bytes = GeoTiff.encode(
          data, nLon, nLat,
          originLon = lon0 - dLon / 2, originLat = latTop + dLat / 2,
          scaleLon = dLon, scaleLat = dLat)
        val out = new Path(outDir, s"${target}_${variable}_$day.tif")
        val fs  = out.getFileSystem(conf.value)
        val os  = fs.create(out, true)
        try os.write(bytes) finally os.close()
        SliceFile(target, variable, day, out.toString)
      }
  }
}
