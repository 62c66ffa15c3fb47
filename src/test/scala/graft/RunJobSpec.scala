package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

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
