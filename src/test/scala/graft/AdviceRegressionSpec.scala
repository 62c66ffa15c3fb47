package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, NearestJoin}

/** Pins the round-1 advisor scenarios that the oracle queries do not reach
  * directly: torn as-of rows under null value columns, left-row retention
  * under null payloads in the argmin join, and basename-based manifest
  * classification for single-file granules. */
class AdviceRegressionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bench delta parser reads raw timings only, never the delta_sec block (r3 artifact)") {
    // a committed BENCH_r*.json holds BOTH objects keyed by query name; the
    // r3 harness scraped keys file-wide and delta values overwrote raw
    // timings for every query present in both blocks
    val committed =
      """{"metric":"total","value":10.0,"unit":"sec",""" +
        """"queries":{"q01_a":1.500,"q02_b":2.000},""" +
        """"failed":[],"sf":"sf0.1",""" +
        """"delta_vs":"BENCH_r02.json","delta_sec":{"q01_a":9.999,"q02_b":-9.999}}"""
    val parsed = Bench.parsePrevQueries(committed)
    assert(parsed === Map("q01_a" -> 1.5, "q02_b" -> 2.0))
    // driver-escaped form (the metric line stored as a quoted string)
    val escaped = committed.replace("\"", "\\\"")
    assert(Bench.parsePrevQueries(escaped) === Map("q01_a" -> 1.5, "q02_b" -> 2.0))
    // no queries block → empty, not a crash
    assert(Bench.parsePrevQueries("""{"metric":"total"}""") === Map.empty)
  }

  test("as-of join never tears a row: null value columns stay with the newest right row") {
    // right rows: older row has val_a set; NEWEST prior row has val_a NULL.
    // A per-column fill would steal val_a from the older row; the struct
    // fill must keep (val_a=null, val_b=20) together from the newest row.
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("user_id", "ts", "kind")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 100L, Option(99.0), Option(1.0)),
      (1L, ts("2024-01-01 09:00:00"), 101L, Option.empty[Double], Option(20.0)))
      .toDF("user_id", "ts", "rid", "val_a", "val_b")
    val out = AsOfJoin
      .lastPrior(left, right, Seq("user_id"), "ts", "rid", Seq("rid", "val_a", "val_b"))
      .collect()(0)
    assert(out.getAs[Long]("asof_rid") === 101L)
    assert(out.isNullAt(out.fieldIndex("asof_val_a"))) // NOT 99.0 from the older row
    assert(out.getAs[Double]("asof_val_b") === 20.0)
    assert(out.getAs[Timestamp]("asof_ts") === ts("2024-01-01 09:00:00"))
  }

  test("as-of tolerance nulls out-of-window matches without falling back") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 7L), // within 1h
      (2L, ts("2024-01-01 07:00:00"), 8L)) // nearest prior, but 3h old
      .toDF("user_id", "ts", "rid")
    val out = AsOfJoin
      .lastPrior(left, right, Seq("user_id"), "ts", "rid", Seq("rid"),
        toleranceSeconds = Some(3600L))
      .orderBy("user_id").collect()
    assert(out(0).getAs[Long]("asof_rid") === 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("asof_rid"))) // nulled, no fallback
  }

  test("argmin join keeps left rows whose payload columns are null") {
    val left = Seq(
      (1L, 5.0, Option("x")),
      (2L, 7.0, Option.empty[String])) // null payload must NOT vanish
      .toDF("lid", "v", "tag")
    val right = Seq((10L, 4.0), (20L, 8.0)).toDF("rid", "rv")
    val out = NearestJoin
      .argmin1D(left, right, leftKey = "lid", leftVal = "v",
        rightKey = "rid", rightVal = "rv")
      .orderBy("lid").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("rid") === 10L)
    assert(out(1).getAs[Long]("rid") === 20L)
    assert(out(1).isNullAt(out(1).fieldIndex("tag")))
    // null coordinates are absent from the output (no valid match)
    val withNullCoord = left.withColumn("v", when(col("lid") === 1, lit(null)).otherwise(col("v")))
    val out2 = NearestJoin.argmin1D(withNullCoord, right, "lid", "v", "rid", "rv").collect()
    assert(out2.map(_.getAs[Long]("lid")).toSeq === Seq(2L))
  }

  test("manifest classification uses the true basename for single-file granules") {
    import graft.sources.GranuleManifest
    val dir = java.nio.file.Files.createTempDirectory("oco2_drop") // parent dir says oco2...
    val p   = dir.resolve("oco3_sif_LtSIF_20230615_B.parquet")     // ...file says oco3_sif
    Seq((1L, "a")).toDF("sounding_index", "x").coalesce(1).write.mode("overwrite")
      .parquet(p.toString)
    val got = GranuleManifest.readGranules(spark, Seq(p.toString))
      .select("mission", "granule_date").distinct().collect()(0)
    // part-file fallback: parquet dirs surface part-* files, so the parent
    // (the granule name, oco3_sif...) classifies — not the oco2 grandparent
    assert(got.getString(0) === "oco3_sif")
    assert(got.getDate(1).toString === "2023-06-15")
  }
}
