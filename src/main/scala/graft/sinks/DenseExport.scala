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
}
