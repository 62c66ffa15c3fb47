package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal tiled GeoTIFF codec (SURVEY S9, reference
  * `writers/CoGWriter.py:102-217`).
  *
  * Cloud-Optimized GeoTIFF layout from the public TIFF 6.0 + GeoTIFF specs:
  * little-endian, ALL IFDs at the FRONT of the file (the cloud-optimized
  * property: readers fetch every level's metadata with one ranged read),
  * 256x256 tiles of IEEE float64 samples (NaN = nodata), GeoTIFF
  * georeferencing tags on the full-resolution IFD (ModelPixelScale,
  * ModelTiepoint, GeoKeyDirectory with EPSG:4326 geographic keys), and an
  * overview pyramid: successive 2x reductions (NaN-aware 2x2 average -
  * GDAL's `average` resampling) as chained IFDs marked
  * NewSubfileType=ReducedImage.
  *
  * Encoder + decoder are symmetric so exports are verifiable in-repo.
  */
object GeoTiff {

  val TileSize = 256

  private def tilesAcross(n: Int) = (n + TileSize - 1) / TileSize
  private val TileLen = TileSize * TileSize * 8

  /** NaN-aware 2x2 mean reduction (all-NaN block stays NaN). */
  private[sinks] def downsample(data: Array[Double], w: Int, h: Int): (Array[Double], Int, Int) = {
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val out = Array.fill(w2 * h2)(Double.NaN)
    var r = 0
    while (r < h2) {
      var c = 0
      while (c < w2) {
        var sum = 0.0; var n = 0
        var dr = 0
        while (dr < 2) {
          var dc = 0
          while (dc < 2) {
            val rr = r * 2 + dr; val cc = c * 2 + dc
            if (rr < h && cc < w) {
              val v = data(rr * w + cc)
              if (!v.isNaN) { sum += v; n += 1 }
            }
            dc += 1
          }
          dr += 1
        }
        if (n > 0) out(r * w2 + c) = sum / n
        c += 1
      }
      r += 1
    }
    (out, w2, h2)
  }

  /** Encode one north-up raster (row 0 = northernmost; callers flip lat
    * ascending -> descending first, the G6 flip) with georeferencing:
    * `originLon/originLat` = outer corner of pixel (0,0), `scaleLon/
    * scaleLat` = pixel size in degrees. `overviews` extra pyramid levels
    * are appended (each halves both dims; levels smaller than one pixel
    * are skipped). */
  def encode(
      data: Array[Double], // row-major, length = width*height
      width: Int,
      height: Int,
      originLon: Double,
      originLat: Double,
      scaleLon: Double,
      scaleLat: Double,
      overviews: Int = 0,
      deflate: Boolean = true): Array[Byte] = {
    require(data.length == width * height, "data length must be width*height")

    // pyramid levels: (data, w, h)
    val levels = scala.collection.mutable.ArrayBuffer((data, width, height))
    var l = 0
    while (l < overviews && levels.last._2 > 1 && levels.last._3 > 1) {
      val (d, w, h) = levels.last
      levels += downsample(d, w, h)
      l += 1
    }

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
    val geoKeys = Seq(
      1, 1, 0, 3,
      1024, 0, 1, 2,   // GTModelType = geographic
      1025, 0, 1, 1,   // GTRasterType = PixelIsArea
      2048, 0, 1, 4326) // GeographicType = WGS84

    // materialize each level's tile bytes first (deflate makes lengths
    // data-dependent, so offsets need the real sizes)
    def tileBytes(d: Array[Double], w: Int, h: Int): IndexedSeq[Array[Byte]] =
      for (ty <- 0 until tilesAcross(h); tx <- 0 until tilesAcross(w)) yield {
        val b = ByteBuffer.allocate(TileLen).order(ByteOrder.LITTLE_ENDIAN)
        var r = 0
        while (r < TileSize) {
          var c = 0
          while (c < TileSize) {
            val row = ty * TileSize + r
            val col = tx * TileSize + c
            b.putDouble(if (row < h && col < w) d(row * w + col) else Double.NaN)
            c += 1
          }
          r += 1
        }
        if (deflate) {
          val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
          defl.setInput(b.array()); defl.finish()
          val outB = new java.io.ByteArrayOutputStream(TileLen / 4)
          val buf  = new Array[Byte](8192)
          while (!defl.finished()) outB.write(buf, 0, defl.deflate(buf))
          defl.end()
          outB.toByteArray
        } else b.array()
      }
    val levelTiles = levels.map { case (d, w, h) => tileBytes(d, w, h) }

    // entry spec per level: (tag, type, count, Left(inline)|Right(payload));
    // TileOffsets carry a placeholder resolved once data offsets are known
    def levelEntries(li: Int): Seq[(Int, Int, Int, Either[Long, Array[Byte]])] = {
      val (_, w, h) = levels(li)
      val nT = tilesAcross(w) * tilesAcross(h)
      val common = Seq(
        (256, 4, 1, Left(w.toLong)),
        (257, 4, 1, Left(h.toLong)),
        (258, 3, 1, Left(64L)),
        (259, 3, 1, Left(if (deflate) 8L else 1L)), // 8 = Adobe deflate
        (262, 3, 1, Left(1L)),
        (277, 3, 1, Left(1L)),
        (322, 3, 1, Left(TileSize.toLong)),
        (323, 3, 1, Left(TileSize.toLong)),
        (324, 4, nT, Right(longsA(Seq.fill(nT)(0L)))),
        (325, 4, nT, Right(longsA(levelTiles(li).map(_.length.toLong)))),
        (339, 3, 1, Left(3L)))
      val geo =
        if (li == 0) Seq(
          (33550, 12, 3, Right(doubles(Seq(scaleLon, scaleLat, 0.0)): Array[Byte])),
          (33922, 12, 6, Right(doubles(Seq(0.0, 0.0, 0.0, originLon, originLat, 0.0)): Array[Byte])),
          (34735, 3, geoKeys.length, Right(shorts(geoKeys): Array[Byte])))
        else Seq((254, 4, 1, Left(1L))) // NewSubfileType = reduced image
      (geo.filter(_._1 == 254) ++ common ++ geo.filterNot(_._1 == 254)).sortBy(_._1)
    }

    // ---- layout pass: header, then each level's IFD + payload block ----
    var off = 8
    val ifdOffsets = new Array[Int](levels.length)
    val payloadOffsets = Array.ofDim[Array[Int]](levels.length)
    val specs = levels.indices.map(levelEntries)
    levels.indices.foreach { li =>
      ifdOffsets(li) = off
      off += 2 + specs(li).length * 12 + 4
      payloadOffsets(li) = specs(li).map {
        case (_, _, _, Right(p)) if p.length > 4 => val o = off; off += p.length; o
        case _ => -1
      }.toArray
    }
    val dataStart = (off + 7) / 8 * 8
    // per-tile offsets: each level's tiles laid out sequentially
    var dOff = dataStart.toLong
    val tileOffs: IndexedSeq[IndexedSeq[Long]] = levelTiles.toIndexedSeq.map { ts =>
      ts.map { t => val o = dOff; dOff += t.length; o }
    }

    val out = ByteBuffer.allocate(dOff.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffsets(0))
    levels.indices.foreach { li =>
      out.position(ifdOffsets(li))
      out.putShort(specs(li).length.toShort)
      val resolved = specs(li).map {
        case (324, t, c, Right(_)) => (324, t, c, Right(longsA(tileOffs(li))))
        case e                     => e
      }
      resolved.zipWithIndex.foreach { case ((tag, typ, count, v), ei) =>
        out.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
        v match {
          case Left(inline) => out.putInt(inline.toInt)
          case Right(p) if p.length <= 4 => out.put(java.util.Arrays.copyOf(p, 4))
          case Right(_) => out.putInt(payloadOffsets(li)(ei))
        }
      }
      out.putInt(if (li + 1 < levels.length) ifdOffsets(li + 1) else 0)
      resolved.zipWithIndex.foreach { case ((_, _, _, v), ei) =>
        v match {
          case Right(p) if p.length > 4 => out.position(payloadOffsets(li)(ei)); out.put(p)
          case _ => ()
        }
      }
    }
    levels.indices.foreach { li =>
      levelTiles(li).zipWithIndex.foreach { case (t, ti) =>
        out.position(tileOffs(li)(ti).toInt)
        out.put(t)
      }
    }
    out.array()
  }

  /** Decoded raster + georeferencing (geo tags are NaN on overview levels). */
  final case class Raster(
      data: Array[Double],
      width: Int,
      height: Int,
      originLon: Double,
      originLat: Double,
      scaleLon: Double,
      scaleLat: Double)

  /** Number of IFDs (1 + overview levels). */
  def levelCount(bytes: Array[Byte]): Int = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var n = 0
    var off = in.getInt(4)
    while (off != 0) {
      n += 1
      val count = in.getShort(off).toInt
      off = in.getInt(off + 2 + count * 12)
    }
    n
  }

  /** Decode one pyramid level of a GeoTIFF produced by [[encode]]. */
  def decode(bytes: Array[Byte], level: Int = 0): Raster = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(in.get(0) == 'I' && in.get(1) == 'I' && in.getShort(2) == 42, "not a little-endian TIFF")
    var ifd = in.getInt(4)
    var li = 0
    while (li < level) {
      val count = in.getShort(ifd).toInt
      ifd = in.getInt(ifd + 2 + count * 12)
      require(ifd != 0, s"level $level not present")
      li += 1
    }
    val n = in.getShort(ifd).toInt
    var width = 0; var height = 0; var tileW = TileSize; var tileH = TileSize
    var compression = 1
    var tileOffsets: Array[Long] = Array.empty
    var tileCounts: Array[Long] = Array.empty
    var scale: Array[Double] = Array(Double.NaN, Double.NaN, Double.NaN)
    var tie: Array[Double] = Array.fill(6)(Double.NaN)
    (0 until n).foreach { i =>
      val base  = ifd + 2 + i * 12
      val tag   = in.getShort(base) & 0xffff
      val count = in.getInt(base + 4)
      val value = in.getInt(base + 8)
      def payloadDoubles(c: Int): Array[Double] = {
        val b = ByteBuffer.wrap(bytes, value, c * 8).order(ByteOrder.LITTLE_ENDIAN)
        Array.fill(c)(b.getDouble())
      }
      def payloadLongs(c: Int): Array[Long] =
        if (c == 1) Array(value.toLong)
        else {
          val b = ByteBuffer.wrap(bytes, value, c * 4).order(ByteOrder.LITTLE_ENDIAN)
          Array.fill(c)(b.getInt().toLong)
        }
      tag match {
        case 256   => width = value
        case 257   => height = value
        case 259   => compression = value
        case 322   => tileW = value
        case 323   => tileH = value
        case 324   => tileOffsets = payloadLongs(count)
        case 325   => tileCounts = payloadLongs(count)
        case 33550 => scale = payloadDoubles(3)
        case 33922 => tie = payloadDoubles(6)
        case _     => ()
      }
    }
    val tilesX = (width + tileW - 1) / tileW
    val data   = Array.fill(width * height)(Double.NaN)
    tileOffsets.zipWithIndex.foreach { case (toff, t) =>
      val ty = t / tilesX; val tx = t % tilesX
      val tileRaw: Array[Byte] =
        if (compression == 8) {
          val infl = new java.util.zip.Inflater()
          val cnt  = tileCounts(t).toInt
          infl.setInput(bytes, toff.toInt, cnt)
          val outB = new Array[Byte](tileW * tileH * 8)
          var filled = 0
          while (!infl.finished() && filled < outB.length)
            filled += infl.inflate(outB, filled, outB.length - filled)
          infl.end()
          outB
        } else java.util.Arrays.copyOfRange(bytes, toff.toInt, toff.toInt + tileW * tileH * 8)
      val b = ByteBuffer.wrap(tileRaw).order(ByteOrder.LITTLE_ENDIAN)
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
          scaleLon = dLon, scaleLat = dLat,
          overviews = 3)
        val out = new Path(outDir, s"${target}_${variable}_$day.tif")
        ZarrStore.atomicWriteFile(conf.value, out, bytes)
        SliceFile(target, variable, day, out.toString)
      }
  }
}
