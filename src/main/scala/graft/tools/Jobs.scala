package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Climatology
import graft.sinks.ProductStore

/** CLI equivalents of the reference's companion tools. */
object Jobs {
  private[tools] def session(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/** `tools/climatology` analog (SURVEY §3.3 / A7-A8): temporal-mean
  * climatology over a product store.
  *
  * Usage: ClimatologyJob <storePath> <outPath> [span] [consolidated]
  *   span ∈ month|season|quarter|year (default month)
  *   consolidated = "true" → second-level month-of-year mean-of-means
  *
  * One groupBy per level — the entire reference tool (span slicing, dask
  * pools, temp-Zarr spills, `tools/climatology/main.py:151-486`) reduces to
  * these aggregates; day-partition pruning serves the time subsetting.
  */
object ClimatologyJob {
  def main(args: Array[String]): Unit = {
    val Array(store, out) = args.take(2)
    val span         = if (args.length > 2) args(2) else "month"
    val consolidated = args.length > 3 && args(3).toBoolean
    val spark        = Jobs.session("graft-climatology")
    spark.sparkContext.setLogLevel("WARN")
    val product = ProductStore.read(spark, store)
    val monthly = Climatology.temporalMean(product, "time", "value", span, Seq("target_id", "variable"))
    val result =
      if (consolidated) Climatology.consolidateMonthly(monthly, Seq("target_id", "variable"))
      else monthly
    result.write.mode("overwrite").parquet(out)
    spark.stop()
  }
}

/** `tools/repair` analog (SURVEY S8/S12): verify a store for duplicate
  * logical rows and repair keep-first if dirty.
  *
  * Usage: RepairJob <storePath>
  */
object RepairJob {
  def main(args: Array[String]): Unit = {
    val Array(store) = args.take(1)
    val spark        = Jobs.session("graft-repair")
    spark.sparkContext.setLogLevel("WARN")
    val fixed = ProductStore.repair(spark, store)
    println(s"""{"store":"$store","duplicate_groups_repaired":$fixed}""")
    spark.stop()
  }
}
