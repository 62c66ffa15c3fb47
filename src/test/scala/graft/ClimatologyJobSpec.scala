package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ZarrStore
import graft.sources.SyntheticGranule.sounding
import graft.sources.netcdf.NetCDFGranules

/** The climatology companion tool over a Zarr store the engine itself
  * wrote: granules → RunJob (global mode, zarr) → ClimatologyJob monthly +
  * consolidated, with the q13 semantics check (mean-of-monthly-means, not
  * mean-of-days) on the numbers that come back out of the output stores. */
class ClimatologyJobSpec extends SparkSpec {

  test("monthly + consolidated climatology over a RunJob-written store") {
    val dir = Files.createTempDirectory("climo")
    // three single-day granules at one site: Jan 2023 at 400, and TWO Jan
    // 2024 days at 410/430 — the unequal day count is the classic
    // mean-of-means vs mean-of-days distinguisher
    def granule(name: String, day: String, xco2: Double) = {
      val p = dir.resolve(name)
      Files.write(p, NetCDFGranules.writeGranuleH5(
        (0 until 8).map(i =>
          sounding(i, 40.9 + 0.02 * i, 10.9 + 0.02 * i, mode = 4, target = "fossil0001",
            xco2 = xco2, day = day))))
      p.toString
    }
    val files = Seq(
      granule("g1.nc4", "2023-01-15", 400.0),
      granule("g2.nc4", "2024-01-10", 410.0),
      granule("g3.nc4", "2024-01-20", 430.0))
    val store = dir.resolve("store").toString
    val cfg   = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files: [${files.mkString(", ")}]
         |output:
         |  local: $store
         |  format: zarr
         |  global: true
         |grid:
         |  latitude: 180
         |  longitude: 360
         |  method: nearest
         |""".stripMargin.getBytes("UTF-8"))
    graft.tools.RunJob.main(Array(cfg.toString))
    assert(ZarrStore.existingDays(spark, store).length === 3)

    val out = dir.resolve("climo-out").toString
    graft.tools.ClimatologyJob.main(Array(store, out, "month", "--consolidated", "--variable", "xco2"))

    // monthly store: two spans (2023-01, 2024-01); Jan 2024 pixels average
    // their two days to 420
    val monthlyDays = ZarrStore.existingDays(spark, out)
    assert(monthlyDays.map(java.time.LocalDate.ofEpochDay(_).toString) ===
      Seq("2023-01-01", "2024-01-01"))
    val monthly = ZarrStore.read(spark, out, "xco2_month_mean")
      .select("time_idx", "value").distinct()
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(monthly === Set((0, 400.0), (1, 420.0)))

    // consolidated store: one nominal month (2000-01-01); every pixel is
    // mean(400, 420) = 410 — mean-of-days would read 413.33
    val consDays = ZarrStore.existingDays(spark, s"$out-consolidated")
    assert(consDays.map(java.time.LocalDate.ofEpochDay(_).toString) === Seq("2000-01-01"))
    val cons = ZarrStore.read(spark, s"$out-consolidated", "xco2_monthly_climatology")
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(cons === Array(410.0))
  }

  test("gridOf reconstructs the store's mesh from its coordinate arrays") {
    val dir = Files.createTempDirectory("gridof")
    import spark.implicits._
    val long = Seq(("2023-06-15", "xco2", 10, 20, 400.0))
      .toDF("time", "variable", "lat_idx", "lon_idx", "value")
      .withColumn("time", col("time").cast("timestamp"))
    val grid = ZarrStore.GridSpec(180, 360, -89.5, 1.0, -179.5, 1.0)
    ZarrStore.write(long, dir.toString, grid)
    assert(ZarrStore.gridOf(spark, dir.toString) === grid)
  }
}
