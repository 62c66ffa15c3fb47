package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ZarrStore
import graft.sources.SyntheticGranule.sounding
import graft.sources.netcdf.NetCDFGranules

/** Config-driven entry point: the reference's run-config YAML shape and
  * its own targets.json catalog format drive a full granule→store run. */
class RunJobSpec extends SparkSpec {

  test("a reference-shaped YAML config + targets.json + netCDF-4 granule runs end-to-end") {
    val dir = Files.createTempDirectory("runjob")
    // granule: the reference's actual container format (netCDF-4/HDF5)
    val ss =
      (0 until 5).map(i => sounding(i, 41.0 + 0.1 * i, 11.0 + 0.1 * i, mode = 4, target = "fossil0001", xco2 = 400.0 + i)) ++
        (5 until 9).map(i => sounding(i, -36.5 + 0.1 * (i - 5), 174.0 + 0.1 * (i - 5), mode = 2, target = "C40_001", xco2 = 410.0 + i))
    val granule = dir.resolve("oco3_LtCO2_20230615_B10400Br.nc4")
    Files.write(granule, NetCDFGranules.writeGranuleH5(ss, chunkRows = 4))
    // catalog: the reference's exact targets.json shape
    val targets = dir.resolve("targets.json")
    Files.write(targets,
      """{
        |  "fossil0001": {"bbox": {"max_lat": 42.0, "max_lon": 12.0, "min_lat": 40.0, "min_lon": 10.0},
        |                 "centroid_wkt": "POINT(11.0 41.0)", "id": "fossil0001", "name": "Plant A"},
        |  "C40_001": {"bbox": {"max_lat": -35.3, "max_lon": 176.3, "min_lat": -38.3, "min_lon": 173.3},
        |              "centroid_wkt": "POINT(174.8 -36.8)", "id": "C40_001", "name": "Auckland_NewZealand"}
        |}""".stripMargin.getBytes("UTF-8"))
    val store = dir.resolve("store").toString
    val cog   = dir.resolve("cog").toString
    val cfg   = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files:
         |    oco3: [${granule.toString}]
         |output:
         |  local: $store
         |  format: parquet
         |  drop-empty: true
         |  cog:
         |    output:
         |      local: $cog
         |grid:
         |  latitude: 1800
         |  longitude: 3600
         |  method: nearest
         |  target-n: 8
         |chunking:
         |  time: 5
         |  latitude: 250
         |  longitude: 250
         |mask-scaling: 1.0
         |target-file: ${targets.toString}
         |""".stripMargin.getBytes("UTF-8"))
    graft.tools.RunJob.main(Array(cfg.toString))
    // store has pixels for both targets (incl. the real C40-style id)
    val out = spark.read.parquet(store)
    val tgts = out.select("target_id").distinct().collect().map(_.getString(0)).sorted
    assert(tgts === Array("C40_001", "fossil0001"))
    assert(out.count() > 0)
    // CoG slices written per (target, variable, day)
    val tifs = new java.io.File(cog).listFiles().map(_.getName).filter(_.endsWith(".tif"))
    assert(tifs.length === 4) // 2 targets × 2 variables
    assert(tifs.exists(_.startsWith("C40_001_xco2_")))
  }

  test("a mission-keyed config dispatches each mission through its own pipeline and merges per J5") {
    val dir = Files.createTempDirectory("runjob-missions")
    // OCO-2 granule: NO target ids in the input — any target in the output
    // can only come from Oco2Pipeline's nearest-centroid association (J2)
    val oco2 = dir.resolve("oco2_LtCO2_20230615.nc4")
    Files.write(oco2, NetCDFGranules.writeGranuleH5(
      (0 until 6).map(i => sounding(i, 40.9 + 0.05 * i, 10.9 + 0.05 * i, mode = 2, target = "", xco2 = 400.0 + i))))
    // SIF granule: targets resolve through /Sequences; delta_time is
    // seconds since 1990 — a correct epoch decode is observable in `time`
    val sif = dir.resolve("oco3_LtSIF_20231220.nc4")
    val sifRows = (0 until 4).map { i =>
      val lat = -0.5 + 0.05 * i; val lon = -4.5 + 0.05 * i
      NetCDFGranules.SifSounding(
        i.toLong, lat, lon, 1071878400.0 + i, // ~2023-12 since 1990
        Seq(lat - 0.3, lat - 0.3, lat + 0.3, lat + 0.3),
        Seq(lon - 0.3, lon + 0.3, lon + 0.3, lon - 0.3),
        quality_flag = 0, daily_sif = 1.5 + i, operation_mode = 3, sequences_index = 0)
    }
    Files.write(sif, NetCDFGranules.writeSifGranuleH5(sifRows, Seq("volcano0002")))
    val targets = dir.resolve("targets.json")
    Files.write(targets,
      """{
        |  "fossil0001": {"bbox": {"max_lat": 42.0, "max_lon": 12.0, "min_lat": 40.0, "min_lon": 10.0},
        |                 "centroid_wkt": "POINT(11.0 41.0)", "id": "fossil0001", "name": "Plant A"},
        |  "volcano0002": {"bbox": {"max_lat": 1.0, "max_lon": -3.0, "min_lat": -1.0, "min_lon": -5.0},
        |                  "centroid_wkt": "POINT(-4.0 0.0)", "id": "volcano0002", "name": "Volcano B"}
        |}""".stripMargin.getBytes("UTF-8"))
    val store = dir.resolve("store").toString
    val cfg   = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files:
         |    oco2: [${oco2.toString}]
         |    oco3_sif: [${sif.toString}]
         |output:
         |  local: $store
         |  format: parquet
         |grid:
         |  method: nearest
         |  target-n: 8
         |target-file: ${targets.toString}
         |""".stripMargin.getBytes("UTF-8"))
    graft.tools.RunJob.main(Array(cfg.toString))
    val out = spark.read.parquet(store)
    val missions = out.select("mission").distinct().collect().map(_.getString(0)).sorted
    assert(missions === Array("oco2", "oco3_sif"))
    // OCO-2 rows: nearest-centroid target assignment, xco2 variables
    val o2 = out.filter(col("mission") === "oco2")
    assert(o2.select("target_id").distinct().collect().map(_.getString(0)) === Array("fossil0001"))
    assert(o2.select("variable").distinct().collect().map(_.getString(0)).sorted ===
      Array("xco2", "xco2_uncertainty"))
    // SIF rows: sequence-resolved target, daily_sif variable, 1990 epoch
    val sf = out.filter(col("mission") === "oco3_sif")
    assert(sf.select("target_id").distinct().collect().map(_.getString(0)) === Array("volcano0002"))
    assert(sf.select("variable").distinct().collect().map(_.getString(0)) === Array("daily_sif"))
    val yrs = sf.select(year(col("time"))).distinct().collect().map(_.getInt(0))
    assert(yrs === Array(2023)) // a silent 1970 fallback would read 2003
  }

  test("a mixed-mission GLOBAL config builds one 3-mission-shaped store with reference prefixes") {
    val dir = Files.createTempDirectory("runjob-global")
    // oco3 SAM capture on 2023-06-15
    val oco3 = dir.resolve("oco3_LtCO2_20230615.nc4")
    Files.write(oco3, NetCDFGranules.writeGranuleH5(
      (0 until 6).map(i => sounding(i, 41.0 + 0.05 * i, 11.0 + 0.05 * i, mode = 4,
        target = "fossil0001", xco2 = 400.0 + i, day = "2023-06-15"))))
    // SIF capture the NEXT day (multi-day forward append in one write);
    // sequence-resolved volcano target, 1990-epoch delta_time
    val sif = dir.resolve("oco3_LtSIF_20230616.nc4")
    val sifT0 = (java.time.LocalDate.of(2023, 6, 16).toEpochDay -
      java.time.LocalDate.of(1990, 1, 1).toEpochDay) * 86400.0
    val sifRows = (0 until 5).map { i =>
      val lat = -0.5 + 0.05 * i; val lon = -4.5 + 0.05 * i
      NetCDFGranules.SifSounding(
        i.toLong, lat, lon, sifT0 + 600 * i,
        Seq(lat - 0.3, lat - 0.3, lat + 0.3, lat + 0.3),
        Seq(lon - 0.3, lon + 0.3, lon + 0.3, lon - 0.3),
        quality_flag = 0, daily_sif = 1.5 + i, operation_mode = 3, sequences_index = 0)
    }
    Files.write(sif, NetCDFGranules.writeSifGranuleH5(sifRows, Seq("volcano0002")))
    val store = dir.resolve("store").toString
    val gcog  = dir.resolve("gcog").toString
    val gnc   = dir.resolve("gnc").toString
    val cfg   = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files:
         |    oco3: [${oco3.toString}]
         |    oco3_sif: [${sif.toString}]
         |output:
         |  local: $store
         |  format: zarr
         |  global: true
         |  cog:
         |    output:
         |      local: $gcog
         |  nc4:
         |    output:
         |      local: $gnc
         |grid:
         |  latitude: 180
         |  longitude: 360
         |  method: nearest
         |""".stripMargin.getBytes("UTF-8"))
    graft.tools.RunJob.main(Array(cfg.toString))

    // one store, both days on the time axis
    assert(ZarrStore.existingDays(spark, store)
      .map(java.time.LocalDate.ofEpochDay(_).toString) === Seq("2023-06-15", "2023-06-16"))
    // all THREE mission prefixes exist as arrays — including the absent
    // oco2 mission (empty-day synthesis: metadata, no chunks, reads as fill)
    val root = new java.io.File(store)
    def hasArray(v: String) = new java.io.File(new java.io.File(root, v), ".zarray").isFile
    def chunkFiles(v: String) = Option(new java.io.File(root, v).listFiles()).toSeq.flatten
      .count(_.getName.matches("\\d+\\.\\d+\\.\\d+"))
    for (v <- Seq("OCO3_global_xco2", "OCO3_global_xco2_uncertainty", "OCO3_global_target_id",
      "OCO3_global_target_type", "OCO3_global_operation_mode",
      "OCO2_global_xco2", "OCO2_global_xco2_uncertainty",
      "OCO3_SIF_global_daily_sif", "OCO3_SIF_global_target_id",
      "OCO3_SIF_global_target_type", "OCO3_SIF_global_operation_mode"))
      assert(hasArray(v), s"missing store array $v")
    assert(chunkFiles("OCO3_global_xco2") > 0)
    assert(chunkFiles("OCO3_SIF_global_daily_sif") > 0)
    assert(chunkFiles("OCO2_global_xco2") === 0) // synthesized absent mission
    // data lands on the right day with the right annotations
    val xco2 = ZarrStore.read(spark, store, "OCO3_global_xco2")
    assert(xco2.filter(col("time_idx") === 0).count() > 0)
    assert(xco2.filter(col("time_idx") === 1).count() === 0)
    val sifV = ZarrStore.read(spark, store, "OCO3_SIF_global_daily_sif")
    assert(sifV.filter(col("time_idx") === 1).count() > 0) // 1990 epoch decoded to 2023-06-16
    assert(sifV.filter(col("time_idx") === 0).count() === 0)
    val mode = ZarrStore.read(spark, store, "OCO3_global_operation_mode")
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(mode === Array(4.0)) // the SAM capture
    val sifTgt = ZarrStore.read(spark, store, "OCO3_SIF_global_target_id")
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(sifTgt === Array(2.0)) // volcano0002 -> numeric id 2

    // the same cog/nc4 config keys dispatch to the GLOBAL exporters here:
    // one sparse full-mesh COG per (variable, day), one netCDF-4 per day
    val tifs = Option(new java.io.File(gcog).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".tif"))
    assert(tifs.contains("global_OCO3_global_xco2_2023-06-15.tif"))
    assert(tifs.contains("global_OCO3_SIF_global_daily_sif_2023-06-16.tif"))
    val tif = graft.sinks.GeoTiff.decode(java.nio.file.Files.readAllBytes(
      new java.io.File(gcog, "global_OCO3_global_xco2_2023-06-15.tif").toPath))
    assert(tif.width === 360 && tif.height === 180)
    assert(tif.data.count(!_.isNaN) === xco2.filter(col("time_idx") === 0).count())
    val ncs = Option(new java.io.File(gnc).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".nc4"))
    assert(ncs.sorted === Seq("global_2023-06-15.nc4", "global_2023-06-16.nc4"))
    val back = spark.read.format("hdf5").option("rowdim", "lat")
      .load(new java.io.File(gnc, "global_2023-06-16.nc4").toString)
      .selectExpr("explode(OCO3_SIF_global_daily_sif) AS v").filter(col("v").isNotNull)
    assert(back.count() === sifV.filter(col("time_idx") === 1).count())
  }

  test("an oco3_sif-only config runs end-to-end through SifPipeline to parquet") {
    val dir = Files.createTempDirectory("runjob-sifonly")
    val sif = dir.resolve("oco3_LtSIF_20231220.nc4")
    val sifRows = (0 until 4).map { i =>
      val lat = -0.5 + 0.05 * i; val lon = -4.5 + 0.05 * i
      NetCDFGranules.SifSounding(
        i.toLong, lat, lon, 1071878400.0 + i, // ~2023-12 seconds since 1990
        Seq(lat - 0.3, lat - 0.3, lat + 0.3, lat + 0.3),
        Seq(lon - 0.3, lon + 0.3, lon + 0.3, lon - 0.3),
        quality_flag = 1, daily_sif = 1.5 + i, operation_mode = 3, sequences_index = 0)
    }
    Files.write(sif, NetCDFGranules.writeSifGranuleH5(sifRows, Seq("volcano0002")))
    val targets = dir.resolve("targets.json")
    Files.write(targets,
      """{"volcano0002": {"bbox": {"max_lat": 1.0, "max_lon": -3.0, "min_lat": -1.0, "min_lon": -5.0},
        |  "centroid_wkt": "POINT(-4.0 0.0)", "id": "volcano0002", "name": "Volcano B"}}""".stripMargin.getBytes("UTF-8"))
    val store = dir.resolve("store").toString
    val cfg   = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files:
         |    oco3_sif: [${sif.toString}]
         |output:
         |  local: $store
         |  format: parquet
         |grid:
         |  method: nearest
         |  target-n: 8
         |target-file: ${targets.toString}
         |""".stripMargin.getBytes("UTF-8"))
    graft.tools.RunJob.main(Array(cfg.toString))
    val out = spark.read.parquet(store)
    // sequence-resolved target id, SIF science variable, quality flag 1 kept
    assert(out.select("target_id").distinct().collect().map(_.getString(0)) === Array("volcano0002"))
    assert(out.select("variable").distinct().collect().map(_.getString(0)) === Array("daily_sif"))
    assert(out.count() > 0)
    // 1990-epoch decode is observable: a silent 1970 fallback reads 2003
    val yrs = out.select(year(col("time"))).distinct().collect().map(_.getInt(0))
    assert(yrs === Array(2023))
  }

  test("unknown mission keys in the config are rejected loudly") {
    val dir = Files.createTempDirectory("runjob-badmission")
    val cfg = dir.resolve("run-config.yaml")
    Files.write(cfg,
      s"""input:
         |  files:
         |    tropomi: [/nonexistent.nc4]
         |output:
         |  local: ${dir.resolve("store")}
         |""".stripMargin.getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      graft.tools.RunJob.main(Array(cfg.toString))
    }
    assert(err.getMessage.contains("tropomi"))
  }

  test("catalog parser reads the reference targets.json format faithfully") {
    val dir = Files.createTempDirectory("cat")
    val f = dir.resolve("targets.json")
    Files.write(f,
      """{"C40_007": {"bbox": {"max_lat": 16.25, "max_lon": -15.7, "min_lat": 13.25, "min_lon": -18.7},
        |  "centroid_wkt": "POINT(-17.2 14.75)", "id": "C40_007", "name": "Dakar_Senegal"}}""".stripMargin.getBytes("UTF-8"))
    val cat = graft.domain.TargetCatalog.fromJson(spark, f.toString).collect()
    assert(cat.length === 1)
    val r = cat(0)
    assert(r.getAs[String]("target_id") === "C40_007")
    assert(r.getAs[String]("name") === "Dakar_Senegal")
    assert(r.getAs[Double]("min_lon") === -18.7 && r.getAs[Double]("max_lat") === 16.25)
  }
}
