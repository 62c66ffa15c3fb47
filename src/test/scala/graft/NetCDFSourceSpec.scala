package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.domain.{Pipeline, TargetCatalog}
import graft.domain.TargetCatalog.Target
import graft.sources.SyntheticGranule
import graft.sources.SyntheticGranule.sounding
import graft.sources.netcdf.NetCDFGranules

/** NetCDF granule front door (SURVEY S1): classic-format codec round-trip,
  * DataSource V2 scan with real projection pruning, fill→null, row-range
  * splits, and end-to-end Pipeline.process parity with the in-memory
  * granule path. */
class NetCDFSourceSpec extends SparkSpec {

  private lazy val soundings =
    (0 until 5).map(i => sounding(i, 41.0 + 0.1 * i, 11.0 + 0.1 * i, mode = 4, target = "fossil0001", xco2 = 400.0 + i)) ++
      Seq(sounding(5, 0.0, 0.0, mode = 0, target = "Missing")) ++
      (6 until 10).map(i => sounding(i, -0.5 + 0.2 * (i - 6), -4.5 + 0.2 * (i - 6), mode = 2, target = "volcano0002", xco2 = 410.0 + i))

  private lazy val catalog = TargetCatalog.toDF(
    spark,
    Seq(
      Target("fossil0001", "Plant A", 10.0, 40.0, 12.0, 42.0),
      Target("volcano0002", "Volcano B", -5.0, -1.0, -3.0, 1.0)))

  private lazy val granulePath: String = {
    val dir  = Files.createTempDirectory("nc-granules")
    val path = dir.resolve("oco3_LtCO2_20230615_B10400Br.nc")
    val os   = new BufferedOutputStream(new FileOutputStream(path.toFile))
    try NetCDFGranules.writeGranule(os, soundings) finally os.close()
    path.toString
  }

  test("netcdf3 scan reads every variable with granule-faithful values") {
    val raw = NetCDFGranules.read(spark, Seq(granulePath))
    assert(raw.count() === soundings.length)
    val r = raw.orderBy("row_index").collect()
    assert(r(0).getAs[Long]("sounding_id") === soundings.head.sounding_id)
    assert(r(3).getAs[Double]("latitude") === soundings(3).latitude)
    assert(r(7).getAs[Int]("Sounding_operation_mode") === 2)
    assert(r(7).getAs[String]("Sounding_target_id") === "volcano0002")
    assert(r(2).getAs[Seq[Double]]("vertex_longitude").length === 4)
    assert(r.forall(_.getAs[String]("granule_path").endsWith(".nc")))
    // variable attributes ride the schema as column metadata
    assert(raw.schema("time").metadata.getString("units") === "seconds since 1970-01-01 00:00:00")
    assert(raw.schema("xco2").metadata.getDouble("_FillValue") === 999999.0)
  }

  test("projection pushdown prunes the scan to the selected variables") {
    val pruned = NetCDFGranules.read(spark, Seq(granulePath)).select("latitude", "xco2")
    val scans = pruned.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("latitude", "xco2"))
    assert(pruned.collect().length === soundings.length)
  }

  test("_FillValue and NaN normalize to null (reference fill semantics)") {
    val dir  = Files.createTempDirectory("nc-fill")
    val path = dir.resolve("oco3_LtCO2_20230616_B10400Br.nc")
    val filled = soundings.take(3).zipWithIndex.map {
      case (s, 1) => s.copy(xco2 = 999999.0) // the declared _FillValue
      case (s, 2) => s.copy(xco2 = Double.NaN)
      case (s, _) => s
    }
    val os = new BufferedOutputStream(new FileOutputStream(path.toFile))
    try NetCDFGranules.writeGranule(os, filled) finally os.close()
    val xs = NetCDFGranules.read(spark, Seq(path.toString))
      .orderBy("row_index").select("xco2").collect()
    assert(!xs(0).isNullAt(0))
    assert(xs(1).isNullAt(0))
    assert(xs(2).isNullAt(0))
  }

  test("row-range splits partition one file without changing its contents") {
    val whole = NetCDFGranules.read(spark, Seq(granulePath))
    val split = NetCDFGranules.read(spark, Seq(granulePath), maxRowsPerSplit = 3)
    assert(split.rdd.getNumPartitions === (soundings.length + 2) / 3)
    val a = whole.orderBy("row_index").collect().toSeq
    val b = split.orderBy("row_index").collect().toSeq
    assert(a === b)
  }

  test("row_index range filters prune partition planning (P10 pushdown)") {
    val df = spark.read.format("netcdf3").option("maxrowspersplit", 1).load(granulePath)
    assert(df.rdd.getNumPartitions === soundings.length)
    val sliced = df.filter(col("row_index") >= 2 && col("row_index") < 5)
    assert(sliced.rdd.getNumPartitions === 3)
    assert(sliced.select("row_index").collect().map(_.getLong(0)).sorted === Array(2L, 3L, 4L))
    val scans = sliced.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("rows=[2,5)"))
    // disjoint OR unions ranges; IN unions points
    val twoArm = df.filter(col("row_index") < 1 || col("row_index") > 7)
    assert(twoArm.rdd.getNumPartitions === 3)
    assert(twoArm.select("row_index").collect().map(_.getLong(0)).sorted === Array(0L, 8L, 9L))
    assert(df.filter(col("row_index").isin(2L, 5L)).rdd.getNumPartitions === 2)
  }

  test("pushed LIMIT truncates partition planning; scan stats come from the header") {
    val df = spark.read.format("netcdf3").option("maxrowspersplit", 1).load(granulePath)
    val limited = df.limit(4)
    assert(limited.collect().length === 4)
    val scans = limited.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("limit=4"))
    assert(scans.head.inputPartitions.length === 4)
    val stats = spark.read.format("netcdf3").load(granulePath)
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(soundings.length)))
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 1000000)
  }

  test("COUNT(*) pushes down to a header-only scan: one partition, no data read") {
    // aggregates plan under AQE — descend through the adaptive root and
    // materialized query-stage leaves to reach the scan
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec => Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(s.plan)
      }.flatten
    def scansOf(d: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
      allScans(d.queryExecution.executedPlan)
    val df = spark.read.format("netcdf3").option("maxrowspersplit", 1).load(granulePath)
    val counted = df.groupBy().count()
    assert(counted.collect().map(_.getLong(0)) === Array(soundings.length.toLong))
    val scans = scansOf(counted)
    assert(scans.head.scan.description().contains("count(*) header-only"))
    assert(scans.head.inputPartitions.length === 1) // not one split per row
    // a FILTERED count must NOT take the metadata path (residual filters
    // re-evaluate post-scan, which an aggregated scan cannot support)
    val filtered = df.filter(col("row_index") < 3).groupBy().count()
    assert(filtered.collect().map(_.getLong(0)) === Array(3L))
    assert(!scansOf(filtered).head.scan.description().contains("header-only"))
  }

  test("the DSv2 scan reads CDF-2 (and CDF-1) files, not just the CDF-5 the fixture writer emits") {
    import graft.sources.netcdf.NetCDF3
    import graft.sources.netcdf.NetCDF3._
    val dir = Files.createTempDirectory("nc-v2")
    Seq(1, 2).foreach { version =>
      val path = dir.resolve(s"legacy_v$version.nc")
      val os   = new BufferedOutputStream(new FileOutputStream(path.toFile))
      try NetCDF3.write(
        os,
        Seq(Dim("sounding", 4L)),
        Seq(
          VarData("latitude", NC_DOUBLE, Seq("sounding"), Array(1.0, 2.0, 3.0, 4.0)),
          VarData("flag", NC_SHORT, Seq("sounding"), Array[Short](0, 1, 0, 1))),
        version = version)
      finally os.close()
      val rows = spark.read.format("netcdf3").load(path.toString)
        .orderBy("row_index").collect()
      assert(rows.map(_.getAs[Double]("latitude")).toSeq === Seq(1.0, 2.0, 3.0, 4.0))
      assert(rows.map(_.getAs[Short]("flag")).toSeq === Seq[Short](0, 1, 0, 1))
    }
  }

  test("multi-granule read sessionizes per granule: regions never merge across files") {
    val dir = Files.createTempDirectory("nc-multi")
    // two granules, both starting at sounding_index 0 with the SAME target —
    // without per-granule windows their runs would fuse into one region
    val dayA = soundings.take(5)
    val dayB = soundings.take(5).map(s => s.copy(time = java.sql.Timestamp.valueOf("2023-06-16 10:30:00")))
    Seq("oco3_LtCO2_20230615_B.nc" -> dayA, "oco3_LtCO2_20230616_B.nc" -> dayB).foreach {
      case (name, ss) =>
        val os = new BufferedOutputStream(new FileOutputStream(dir.resolve(name).toFile))
        try NetCDFGranules.writeGranule(os, ss) finally os.close()
    }
    val granules = NetCDFGranules.readGranules(
      spark,
      Seq(dir.resolve("oco3_LtCO2_20230615_B.nc").toString, dir.resolve("oco3_LtCO2_20230616_B.nc").toString))
      .drop("sounding_id")
    val out = Pipeline.process(granules, catalog, Pipeline.Config(gridN = 8))
    // one product day per granule, each with its own region's pixels
    val days = out.select(col("time").cast("date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days === Array("2023-06-15", "2023-06-16"))
    val perDay = out.groupBy(col("time")).count().collect().map(_.getLong(1)).toSet
    assert(perDay.size === 1) // identical granules -> identical pixel counts
  }

  test("a NetCDF granule flows through Pipeline.process identically to the in-memory path") {
    val fromNc = NetCDFGranules.readGranules(spark, Seq(granulePath)).drop("granule_path", "sounding_id")
    val fromMem = SyntheticGranule.toDF(spark, soundings).drop("sounding_id")
    val cfg = Pipeline.Config(gridN = 8)
    val key = Seq("target_id", "variable", "lat_idx", "lon_idx")
    val a = Pipeline.process(fromNc, catalog, cfg)
      .orderBy(key.map(col): _*).collect().toSeq
    val b = Pipeline.process(fromMem, catalog, cfg)
      .orderBy(key.map(col): _*).collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }
}
