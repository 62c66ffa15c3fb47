package graft.tools

import org.apache.spark.sql.functions._
import graft.domain.{Pipeline, TargetCatalog}
import graft.domain.TargetCatalog.Target

/** Domain-scale throughput probe: build a parametric synthetic granule
  * (reference scale: O(10⁴-10⁵) soundings/day, 559-target catalog —
  * BASELINE.md) entirely on executors and run the full pipeline.
  *
  * Usage: ScaleProbe [nSoundings] [nTargets] [gridN] [method] [variant]
  * variant = target (default) | global (GlobalPipeline over an nGx×nGy
  * mesh — gridN is reused as nGx/100⇒ mesh 100·gridN × 50·gridN).
  * Prints one JSON line: rows in/out + wall seconds.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n       = if (args.length > 0) args(0).toInt else 100000
    val nTgt    = if (args.length > 1) args(1).toInt else 50
    val gridN   = if (args.length > 2) args(2).toInt else 64
    val method  = if (args.length > 3) args(3) else "linear"
    val spark   = Jobs.session("graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")

    // catalog: nTgt 2°×2° boxes in a row along the equator band
    val catalog = TargetCatalog.toDF(
      spark,
      (0 until nTgt).map { i =>
        val lon = -170.0 + (i % 160) * 2.0
        val lat = -40.0 + (i / 160) * 4.0
        Target(f"fossil$i%04d", s"T$i", lon, lat, lon + 2.0, lat + 2.0)
      })

    // granule: runs of ~200 soundings per region, cycling over targets,
    // every 5th block nadir-mode noise; built distributed via spark.range
    val granule = spark
      .range(n)
      .select(
        col("id").as("sounding_index"),
        (col("id") / 200).cast("long").as("_block"))
      .withColumn("_tgt", pmod(col("_block"), lit(nTgt * 5 / 4)).cast("int"))
      .withColumn("_isObs", col("_tgt") < nTgt)
      .withColumn("operation_mode", when(col("_isObs"), when(pmod(col("_block"), lit(2)) === 0, 4).otherwise(2)).otherwise(0))
      .withColumn("target_id", when(col("_isObs"), format_string("fossil%04d", col("_tgt"))).otherwise("Missing"))
      .withColumn("_lonBase", lit(-170.0) + pmod(col("_tgt"), lit(160)) * 2.0)
      .withColumn("_latBase", lit(-40.0) + (col("_tgt") / 160).cast("int") * 4.0)
      .withColumn("longitude", col("_lonBase") + pmod(col("sounding_index") * 7919, lit(2000)) / 1000.0)
      .withColumn("latitude", col("_latBase") + pmod(col("sounding_index") * 104729, lit(2000)) / 1000.0)
      .withColumn("time", to_timestamp(lit("2023-06-15 10:30:00")))
      .withColumn("vertex_longitude", array(col("longitude") - 0.01, col("longitude") + 0.01, col("longitude") + 0.01, col("longitude") - 0.01))
      .withColumn("vertex_latitude", array(col("latitude") - 0.01, col("latitude") - 0.01, col("latitude") + 0.01, col("latitude") + 0.01))
      .withColumn("xco2_quality_flag", when(pmod(col("sounding_index"), lit(10)) === 9, 1).otherwise(0))
      .withColumn("xco2", lit(400.0) + pmod(col("sounding_index"), lit(100)) / 10.0)
      .withColumn("xco2_uncertainty", lit(0.5))
      .drop("_block", "_tgt", "_isObs", "_lonBase", "_latBase")

    val variant = if (args.length > 4) args(4) else "target"
    val t0  = System.nanoTime()
    val out = variant match {
      case "global" =>
        // production-shaped global mesh (18000×36000 at full scale); the
        // sparse design generates only covered index ranges, so mesh size
        // enters through per-region explode width, not materialization
        val mesh = graft.operators.Grid.GridSpec(-180.0, 180.0, 100 * gridN, -90.0, 90.0, 50 * gridN)
        graft.domain.GlobalPipeline.process(granule, mesh, Pipeline.Config(gridN = gridN, method = method))
      case _ =>
        Pipeline.process(granule, catalog, Pipeline.Config(gridN = gridN, method = method))
    }
    val nOut = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"domain_pipeline","variant":"$variant","soundings":$n,"targets":$nTgt,"gridN":$gridN,"method":"$method","out_rows":$nOut,"sec":$sec}""")
    spark.stop()
  }
}
