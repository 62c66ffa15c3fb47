package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Target catalog model + target-id parsing/classification (SURVEY J1/M5).
  *
  * The reference's catalog (`targets.json`, 559 entries) maps
  * `target_id → {name, bbox, centroid}` and is consulted as a broadcast
  * lookup (`OCO3SamProcessor.py:70-78`). Id classification
  * (`sam_extract/targets/TargetInfo.py:128-154`) prefix-matches the id
  * family and extracts a numeric id from trailing digits, with lookup tables
  * for text ids. Here both are pure built-in-function expressions — no UDF,
  * fully codegen'd, and the catalog stays broadcast-sized by construction.
  */
object TargetCatalog {

  final case class Target(
      target_id: String,
      name: String,
      min_lon: Double,
      min_lat: Double,
      max_lon: Double,
      max_lat: Double)

  def toDF(spark: SparkSession, targets: Seq[Target]): DataFrame = {
    import spark.implicits._
    targets.toDF()
  }

  /** Prefix-family classification (`TargetInfo.py:149-154`): first matching
    * prefix of {fossil, ecostress, sif, volcano, tccon}, else 'other'. */
  def idType(id: Column): Column =
    when(id.startsWith("fossil"), "fossil")
      .when(id.startsWith("ecostress"), "ecostress")
      .when(id.startsWith("sif"), "sif")
      .when(id.startsWith("volcano"), "volcano")
      .when(id.startsWith("tccon"), "tccon")
      .otherwise("other")

  /** Numeric type codes as stored per-pixel in the global product
    * (`OCO3SamGlobalProcessor.py:353-410`; int8 with fill -1). */
  def idTypeCode(id: Column): Column =
    when(id.startsWith("fossil"), 0)
      .when(id.startsWith("ecostress"), 1)
      .when(id.startsWith("sif"), 2)
      .when(id.startsWith("volcano"), 3)
      .when(id.startsWith("tccon"), 4)
      .otherwise(5)
      .cast("byte")

  /** Trailing-digit numeric id (`TargetInfo.py:139-146`); null when the id
    * has no trailing digits (text ids resolve via a lookup table join). */
  def extractNumericId(id: Column): Column = {
    val digits = regexp_extract(id, "(\\d+)$", 1)
    when(digits === "", lit(null)).otherwise(digits.cast("int"))
  }

  /** Broadcast catalog association (J1): inner join dropping regions whose
    * target is missing from the catalog or has a null bbox (P7). */
  def associate(regions: DataFrame, catalog: DataFrame, idCol: String = "target_id"): DataFrame =
    regions.join(
      broadcast(catalog.filter(col("min_lon").isNotNull && col("max_lon").isNotNull)),
      idCol)
}
