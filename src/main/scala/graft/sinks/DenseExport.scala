package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Dense export layer (SURVEY S9 CoG / S10 NetCDF / G6 latitude flip).
  *
  * The reference exports each (variable × time slice) as a Cloud-Optimized
  * GeoTIFF with latitude flipped to descending (`writers/CoGWriter.py:
  * 102-217`) and whole group dicts as NetCDF (`writers/NetCDFWriter.py:
  * 30-61`). The raster codecs themselves (GDAL / libnetcdf) are not in this
  * container, so the export boundary is: pivot the sparse long form into
  * dense per-slice row-major order — exactly the byte layout a raster
  * encoder consumes — and hand each partition to a pluggable encoder
  * (default: parquet per slice). Swapping in a real GDAL/netCDF binding
  * touches only `encode`.
  *
  * Scale notes: one output slice = one (variable, day) partition, written by
  * the tasks owning that partition — a 1000-executor export writes slices
  * concurrently with no driver funnel. The pivot is a per-slice pipeline:
  * no global shuffle beyond the partition-by.
  */
object DenseExport {

  /** Long form → dense wide form: one row per (time, target, pixel) with a
    * column per variable (absent pixels are simply absent — fill on read). */
  def pivotVariables(long: DataFrame, variables: Seq[String]): DataFrame =
    long
      .groupBy(col("target_id"), col("time"), col("lat_idx"), col("lon_idx"), col("lat"), col("lon"))
      .pivot("variable", variables)
      .agg(first(col("value")))

  /** Raster-order export: slices partitioned by (variable, day), rows in
    * raster order — latitude DESCENDING (the G6 flip: north-up rasters),
    * longitude ascending. */
  def exportRasterLayout(long: DataFrame, path: String): Unit =
    long
      .withColumn("day", col("time").cast("date"))
      // partition cols lead the sort so the writer's required ordering is
      // already satisfied and no (unstable) extra sort gets inserted
      .repartition(col("variable"), col("day"))
      .sortWithinPartitions(col("variable"), col("day"), col("lat_idx").desc, col("lon_idx").asc)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("variable", "day")
      .parquet(path)

  /** Chunk shape in (time, lat, lon) — the reference's production store uses
    * 5-day × 250×250-pixel chunks (`writers/ZarrWriter.py:236-263`). */
  final case class ChunkSpec(timeDays: Int = 5, latPx: Int = 250, lonPx: Int = 250)

  /** Chunk-granularity export (`ZarrWriter.py:236-263` chunk alignment):
    * every output directory is exactly one (variable, time-chunk, lat-chunk,
    * lon-chunk) cell, so file boundaries ARE chunk boundaries — appends of
    * new days rewrite only the chunk cells they touch (dynamic partition
    * overwrite = the reference's append-time chunk alignment without the
    * re-chunk read-modify-write). Time chunks are fixed epoch-day windows so
    * alignment never depends on what arrived first; rows inside a cell are
    * raster-ordered (day, lat desc, lon asc).
    *
    * Chunk payloads are compressed per cell with `codec` (zstd by default —
    * the parquet analog of the reference store's Blosc clevel-9 chunks,
    * `ZarrWriter.py:205`), and every export refreshes the store-level attrs
    * (coverage window + chunk-grid shape) so a reader can discover the grid
    * without listing files. */
  def exportChunkedLayout(
      long: DataFrame,
      path: String,
      chunks: ChunkSpec = ChunkSpec(),
      codec: String = "zstd"): Unit = {
    long
      .withColumn("day", col("time").cast("date"))
      .withColumn(
        "t_chunk",
        floor(datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))) / chunks.timeDays).cast("int"))
      .withColumn("lat_chunk", floor(col("lat_idx") / chunks.latPx).cast("int"))
      .withColumn("lon_chunk", floor(col("lon_idx") / chunks.lonPx).cast("int"))
      .repartition(col("variable"), col("t_chunk"), col("lat_chunk"), col("lon_chunk"))
      .sortWithinPartitions(
        col("variable"), col("t_chunk"), col("lat_chunk"), col("lon_chunk"),
        col("day").asc, col("lat_idx").desc, col("lon_idx").asc)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", codec)
      .partitionBy("variable", "t_chunk", "lat_chunk", "lon_chunk")
      .parquet(path)
    // coverage attrs come from the store just written, NOT from `long`:
    // aggregating the input plan here would re-execute the entire upstream
    // pipeline a second time (the toStoreVariables double-execution class —
    // at the deploy mesh that doubled cost and OOM'd the driver). The
    // readback is column-pruned to `time` only, and it also widens coverage
    // over days already in the store from earlier appends. An empty input
    // writes no partition directories — nothing to describe, skip the
    // attrs (a readback would fail schema inference on the bare _SUCCESS).
    val rootP = new org.apache.hadoop.fs.Path(path)
    val fs    = rootP.getFileSystem(long.sparkSession.sessionState.newHadoopConf())
    if (!fs.listStatus(rootP).exists(_.isDirectory)) return
    updateStoreAttrs(long.sparkSession.read.parquet(path), path, extra = Map(
      "chunk_time_days" -> chunks.timeDays.toString,
      "chunk_lat_px"    -> chunks.latPx.toString,
      "chunk_lon_px"    -> chunks.lonPx.toString,
      "chunk_codec"     -> codec))
    ()
  }

  /** Store-level dynamic attributes (`ZarrWriter.py:140-167`): ISO-8601
    * date_created / date_updated / coverage_start / coverage_end, merged
    * with any existing attrs on append (created kept, coverage widened).
    * Stored as a flat JSON file at the store root — the parquet-store analog
    * of the Zarr root .zattrs. Returns the merged attrs. */
  def updateStoreAttrs(
      df: DataFrame,
      path: String,
      now: String = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now()),
      extra: Map[String, String] = Map.empty): Map[String, String] = {
    val iso = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    val mm  = df.agg(
      date_format(min(col("time")), iso).as("s"),
      date_format(max(col("time")), iso).as("e")).collect()(0)
    val (aStart, aEnd) = (mm.getString(0), mm.getString(1))
    val spark   = df.sparkSession
    val attrsP  = new org.apache.hadoop.fs.Path(path, "_store_attrs.json")
    val fs      = attrsP.getFileSystem(spark.sessionState.newHadoopConf())
    val existing: Map[String, String] =
      if (fs.exists(attrsP)) {
        val src = scala.io.Source.fromInputStream(fs.open(attrsP), "UTF-8")
        try "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
          .findAllMatchIn(src.mkString).map(m => m.group(1) -> m.group(2)).toMap
        finally src.close()
      } else Map.empty
    val merged = Map(
      "date_created"   -> existing.getOrElse("date_created", now),
      "date_updated"   -> now,
      "coverage_start" -> existing.get("coverage_start").filter(_ <= aStart).getOrElse(aStart),
      "coverage_end"   -> existing.get("coverage_end").filter(_ >= aEnd).getOrElse(aEnd)) ++ extra
    val out = fs.create(attrsP, true)
    try out.write(
      merged.toSeq.sorted.map { case (k, v) => s""""$k": "$v"""" }
        .mkString("{\n  ", ",\n  ", "\n}\n").getBytes("UTF-8"))
    finally out.close()
    merged
  }
}
