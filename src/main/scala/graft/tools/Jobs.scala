package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sinks.ProductStore

/** CLI equivalents of the reference's companion tools. */
object Jobs {
  private[tools] def session(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE sizes every shuffle by data volume: start wide (8× slots) so a
      // large stage's partitions stay memory-sized instead of spilling at a
      // fixed 32, and let coalescing shrink small stages back down. The
      // static shuffle.partitions above is only the non-AQE fallback.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
