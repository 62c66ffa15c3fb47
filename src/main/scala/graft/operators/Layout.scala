package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ZOrder2

/** Write-layout clustering (SURVEY "beyond the reference" tier): physical
  * data organization that turns parquet min/max statistics into effective
  * 2-D indexes at 100 TB.
  *
  * A dense raster store written row-major (sorted `lat_idx, lon_idx`)
  * prunes scans only on the leading column: a longitude-box query
  * intersects EVERY row group, because each one spans the full longitude
  * range of its latitude strip. Sorting by the Morton code of
  * (lat_idx, lon_idx) instead makes every row group a compact rectangle,
  * so an arbitrary spatial box skips all but the few groups it overlaps —
  * the scan-side benefit lands automatically in any engine that reads
  * parquet stats (Spark, DuckDB, Trino), with no reader-side changes.
  */
object Layout {

  /** Write `df` as parquet clustered by the Z-order of (`xCol`, `yCol`).
    *
    * `numFiles` range-partitions on the Morton key (boundaries sampled —
    * layout only, content identical), each partition sorted by the key so
    * row-group stats within a file stay tight too. The key column is
    * dropped before the write: the pruning value lives in the x/y stats
    * themselves. */
  /** `bloomFilterCols` additionally writes parquet split-block bloom
    * filters for the named columns — POINT-lookup skipping on
    * high-cardinality columns the z-order key does not cluster (e.g. a
    * sounding/document id): min/max stats are useless there (every file
    * spans the id range), the bloom answers "definitely not in this row
    * group" instead. Complementary axes: z-order for range boxes, bloom
    * for point probes. */
  def zOrderedParquet(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int,
      bloomFilterCols: Seq[String] = Nil): Unit = {
    require(!df.columns.contains("_z"), "input already has a '_z' column")
    val writer = df.withColumn("_z", ZOrder2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      // projection keeps the per-partition sort order
      .drop("_z")
      .write.mode("overwrite")
    bloomFilterCols
      .foldLeft(writer)((w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true"))
      .parquet(path)
  }
}
