package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every table is one parquet file under the scale-factor directory; reads go
  * through `spark.read.parquet` so Catalyst performs column pruning and filter
  * pushdown into the scan (the reference does both by hand —
  * `sam_extract/readers/GranuleReader.py:115-117`,
  * `sam_extract/processors/Processor.py:85-99`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong`, the
    * column arrives as epoch-nanos long, and we truncate to microseconds here
    * (exactly what Spark would do if it read NANOS natively). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Per-run scratch directory that the JVM deletes on exit. Query closures
    * that materialize intermediate state (q31's demo store, q102's
    * climatology state) MUST allocate here, not bare createTempDirectory —
    * the returned DataFrame is lazy, so the dir can only be reclaimed after
    * the run, and harness/bench invocations would otherwise leak one dir per
    * call. Deletion is a single shutdown hook over the tree (bounded: a few
    * MB of per-query state, never input data). */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchRoots.add(p)
    p
  }

  private val scratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private val _hook = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchRoots.forEach { root =>
        try {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          val all = Files.walk(root)
          try all.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
          finally all.close()
        } catch { case _: Throwable => () } // best-effort: exit cleanup only
      }
    }, "graft-scratch-cleanup"))
  }
}
