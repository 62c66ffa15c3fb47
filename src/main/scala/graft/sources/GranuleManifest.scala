package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-driven granule input (SURVEY S4, with the filename→date codec
  * of `Processor.granule_to_dt`, `sam_extract/processors/Processor.py:78-83`).
  *
  * The reference processes an explicit list of per-day granule files, one
  * data-day per file, date encoded in the filename
  * (`<mission>_LtCO2_<yyMMdd>_...`). Here a manifest is just a path list:
  * each file becomes input splits tagged with its granule date and mission
  * parsed from `input_file_name()` — executed in the data plane, no driver
  * listing loop. (The NetCDF byte decode itself is out-of-container; files
  * are parquet with the granule's logical schema — swapping in a NetCDF
  * DataSource changes only the format string.)
  *
  * Filenames use 4-digit years (the reference's 2-digit `%y` is ambiguous
  * across engines/pivot rules; see FunctionQueries q34).
  */
object GranuleManifest {

  val FilenameDate = "_(\\d{8})_"

  def readGranules(spark: SparkSession, manifest: Seq[String]): DataFrame =
    spark.read
      .parquet(manifest: _*)
      // classify on the true basename — a parent directory containing
      // "oco2" must not re-tag an oco3 granule. Spark-written directory
      // granules surface as part-* files, whose name carries no granule
      // info: for those, fall back to the parent directory (the granule
      // name); single-file granules (the reference's one-file-per-day
      // layout) classify on the file name itself.
      .withColumn("_fn", element_at(split(input_file_name(), "/"), -1))
      .withColumn("_parent", element_at(split(input_file_name(), "/"), -2))
      .withColumn(
        "_base",
        when(col("_fn").rlike("^(part-|_)"), col("_parent")).otherwise(col("_fn")))
      .withColumn("granule_date", to_date(regexp_extract(col("_base"), FilenameDate, 1), "yyyyMMdd"))
      .withColumn(
        "mission",
        when(col("_base").startsWith("oco3_sif"), "oco3_sif")
          .when(col("_base").startsWith("oco2"), "oco2")
          .otherwise("oco3"))
      .drop("_base", "_fn", "_parent")

  /** Manifest sanitation (SURVEY P11): drop nulls/blank entries, keep known
    * missions only, warn-count unknown keys via the returned tuple. */
  def sanitize(entries: Seq[(String, String)]): (Seq[(String, String)], Seq[(String, String)]) = {
    val known = Set("oco2", "oco3", "oco3_sif")
    val (good, bad) = entries
      .filter { case (_, p) => p != null && p.nonEmpty }
      .partition { case (m, _) => known(m) }
    (good, bad)
  }

  /** Completeness gating (SURVEY §2.9 "late/missing upstream data",
    * `tools/deploy/run.py:217-333`): a day is ready to process only when
    * every expected mission is either PRESENT or inside a known gap window
    * for that mission. Days with unexplained absences are held. Driver-side
    * manifest logic, as in the reference.
    *
    * @param present   (day, mission) pairs that have arrived
    * @param expected  missions expected every day
    * @param knownGaps mission → inclusive (from, to) day ranges with no data
    * @return (ready days, held days with their missing missions)
    */
  def gateCompleteness(
      present: Seq[(String, String)],
      expected: Set[String],
      knownGaps: Map[String, Seq[(String, String)]]): (Seq[String], Map[String, Set[String]]) = {
    val byDay = present.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def inGap(mission: String, day: String): Boolean =
      knownGaps.getOrElse(mission, Nil).exists { case (from, to) => day >= from && day <= to }
    val held = byDay.flatMap { case (day, missions) =>
      val missing = expected.diff(missions).filterNot(m => inGap(m, day))
      if (missing.nonEmpty) Some(day -> missing) else None
    }
    (byDay.keys.toSeq.filterNot(held.contains).sorted, held)
  }
}
