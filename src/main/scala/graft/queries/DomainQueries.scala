package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain.{GlobalPipeline, Oco2Pipeline, Pipeline, TargetCatalog}
import graft.domain.TargetCatalog.Target
import graft.sources.SyntheticGranule
import graft.sources.SyntheticGranule.sounding

/** The domain showcase: full satellite observation pipeline (sessionize →
  * QF → catalog join → grid → interpolate → mask → long form) over a
  * deterministic synthetic granule. No SQL oracle (the granule is built
  * in-process and the mask uses the custom PointInPolygon expression), so
  * the driver records a rows-only check; semantic coverage lives in
  * PipelineSpec.
  */
object DomainQueries {

  type Q = (SparkSession, String) => DataFrame

  def demoGranule(s: SparkSession): DataFrame =
    SyntheticGranule.toDF(
      s,
      (0 until 40).map(i =>
        sounding(i, 41.0 + 0.02 * (i % 20), 11.0 + 0.04 * (i % 20), mode = 4,
          target = "fossil0001", xco2 = 400.0 + (i % 7), qf = i % 5 min 1)) ++
        (40 until 70).map(i =>
          sounding(i, -0.8 + 0.05 * (i - 40), -4.8 + 0.05 * (i - 40), mode = 2,
            target = "volcano0002", xco2 = 410.0 + (i % 3))))

  def demoCatalog(s: SparkSession): DataFrame =
    TargetCatalog.toDF(
      s,
      Seq(
        Target("fossil0001", "Plant A", 10.0, 40.0, 12.0, 42.0),
        Target("volcano0002", "Volcano B", -5.0, -1.0, -3.0, 1.0)))

  /** Runs the pipeline AND round-trips the result through the idempotent
    * product store (write partition-overwrite, read back) so the sink layer
    * is exercised at the driver surface. */
  private val q31: Q = (s, _) => {
    val out = Pipeline.process(
      demoGranule(s), demoCatalog(s),
      Pipeline.Config(gridN = 16, method = "linear"))
    // per-run store dir: a fixed shared path races when two driver
    // processes (e.g. parallel Verify sweeps) overwrite/read concurrently
    val path = java.nio.file.Files
      .createTempDirectory("graft_demo_store")
      .resolve("store")
      .toString
    graft.sinks.ProductStore.appendIdempotent(out, path)
    graft.sinks.ProductStore
      .read(s, path)
      .drop("day")
      .orderBy(col("target_id"), col("variable"), col("lat_idx"), col("lon_idx"))
  }

  /** Global-product variant + multi-mission merge: R4 sessionization,
    * per-pixel first-writer-wins annotation, sparse global mesh indices;
    * merged with an OCO-2-style product under a mission discriminator. */
  private val q32: Q = (s, _) => {
    val oco3 = GlobalPipeline.process(demoGranule(s))
    val oco2 = Oco2Pipeline.process(
      demoGranule(s).drop("target_id").withColumn("target_id", lit("")),
      demoCatalog(s))
    GlobalPipeline
      .mergeMissions(Map("oco3_global" -> oco3, "oco2" -> oco2))
      .orderBy(col("mission"), col("variable"), col("lat_idx"), col("lon_idx"))
  }

  val queries: Map[String, Q] =
    Map("q31_domain_pipeline" -> q31, "q32_global_merge" -> q32)
  val oracles: Map[String, String] = Map.empty
}
