package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.domain.{Pipeline, TargetCatalog}
import graft.domain.TargetCatalog.Target
import graft.sources.SyntheticGranule
import graft.sources.SyntheticGranule.sounding
import graft.sources.netcdf.{Hdf5, NetCDFGranules}

/** netCDF-4/HDF5 granule front door (SURVEY S1): codec round-trip over
  * chunked+deflate layouts, chunk-level I/O pruning, DSv2 scan with
  * projection pushdown, fill→null, format dispatch, and end-to-end
  * Pipeline.process parity with both the in-memory path and the classic
  * codec path. */
class Hdf5SourceSpec extends SparkSpec {

  private lazy val soundings =
    (0 until 5).map(i => sounding(i, 41.0 + 0.1 * i, 11.0 + 0.1 * i, mode = 4, target = "fossil0001", xco2 = 400.0 + i)) ++
      Seq(sounding(5, 0.0, 0.0, mode = 0, target = "Missing")) ++
      (6 until 10).map(i => sounding(i, -0.5 + 0.2 * (i - 6), -4.5 + 0.2 * (i - 6), mode = 2, target = "volcano0002", xco2 = 410.0 + i))

  private lazy val catalog = TargetCatalog.toDF(
    spark,
    Seq(
      Target("fossil0001", "Plant A", 10.0, 40.0, 12.0, 42.0),
      Target("volcano0002", "Volcano B", -5.0, -1.0, -3.0, 1.0)))

  private def writeFixture(dir: java.nio.file.Path, name: String, ss: Seq[SyntheticGranule.Sounding], chunkRows: Int = 4): String = {
    val p = dir.resolve(name)
    Files.write(p, NetCDFGranules.writeGranuleH5(ss, chunkRows = chunkRows))
    p.toString
  }

  private lazy val granulePath: String =
    writeFixture(Files.createTempDirectory("h5-granules"), "oco3_LtCO2_20230615_B10400Br.nc4", soundings)

  test("codec round-trip: chunked+deflate datasets decode bit-exactly") {
    val bytes = NetCDFGranules.writeGranuleH5(soundings, chunkRows = 3)
    val f = Hdf5.open(new Hdf5.BytesInput(bytes))
    // groups walked: root + /Sounding
    assert(f.dataset("xco2").isDefined)
    assert(f.dataset("Sounding/operation_mode").isDefined)
    val lat = f.dataset("latitude").get
    assert(lat.shape.toSeq === Seq(soundings.length.toLong))
    val raw = f.readRows(lat, 0, soundings.length)
    val bb  = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    soundings.indices.foreach(i => assert(bb.getDouble(i * 8) === soundings(i).latitude))
    // 2-D chunked variable decodes row-major
    val vlat = f.dataset("vertex_latitude").get
    val vraw = f.readRows(vlat, 2, 3)
    val vbb  = java.nio.ByteBuffer.wrap(vraw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    soundings(2).vertex_latitude.zipWithIndex.foreach { case (v, j) =>
      assert(vbb.getDouble(j * 8) === v)
    }
    // fixed-size string dataset
    val tid  = f.dataset("Sounding/target_id").get
    val traw = f.readRows(tid, 7, 8)
    assert(new String(traw, "UTF-8").takeWhile(_ != 0) === "volcano0002")
    // the fill value is visible through the attribute
    assert(f.dataset("xco2").get.fillValue.contains(999999.0))
  }

  test("v2 layout (superblock v2 + OHDR headers) round-trips through the same reader paths") {
    val ss = soundings.take(6)
    val v2 = Hdf5.write(
      Seq(Hdf5.WGroup("", Seq(
        Hdf5.WVar("latitude", Seq(6L), ss.map(_.latitude).toArray, chunkRows = 2, deflateLevel = 6),
        Hdf5.WVar("xco2", Seq(6L), ss.map(_.xco2).toArray,
          atts = Seq(Hdf5.Attr("_FillValue", Array(999999.0)))))),
        Hdf5.WGroup("Sounding", Seq(
          Hdf5.WVar("target_id", Seq(6L), ss.map(_.target_id).toArray, strSize = 24)))),
      v2Layout = true)
    val f = Hdf5.open(new Hdf5.BytesInput(v2))
    val lat = f.dataset("latitude").get
    val bb  = java.nio.ByteBuffer.wrap(f.readRows(lat, 0, 6)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ss.indices.foreach(i => assert(bb.getDouble(i * 8) === ss(i).latitude))
    assert(f.dataset("xco2").get.fillValue.contains(999999.0))
    val traw = f.readRows(f.dataset("Sounding/target_id").get, 5, 6)
    assert(new String(traw, "UTF-8").takeWhile(_ != 0) === "Missing")
  }

  test("chunk index prunes I/O: a row slice reads only overlapping chunks") {
    val bytes = NetCDFGranules.writeGranuleH5(soundings, chunkRows = 2)
    var readBytes = 0L
    val counting = new Hdf5.Input {
      private val inner = new Hdf5.BytesInput(bytes)
      def readAt(off: Long, len: Int): Array[Byte] = { readBytes += len; inner.readAt(off, len) }
    }
    val f = Hdf5.open(counting)
    val metaBytes = readBytes
    val lat = f.dataset("latitude").get
    // rows [0,2) = one btree node walk + exactly one 2-row chunk: far less
    // than the whole variable, and nothing of any other variable
    f.readRows(lat, 0, 2)
    val sliceBytes = readBytes - metaBytes
    assert(sliceBytes > 0 && sliceBytes < 400, s"slice read $sliceBytes bytes")
    // a full-variable read still never touches other variables' chunks
    val before = readBytes
    f.readRows(lat, 0, soundings.length)
    assert(readBytes - before < 1000)
    assert(bytes.length > 3000) // the file holds ~10 variables of chunks
  }

  test("hdf5 scan reads every variable with granule-faithful values") {
    val raw = NetCDFGranules.read(spark, Seq(granulePath))
    assert(raw.count() === soundings.length)
    val r = raw.orderBy("row_index").collect()
    assert(r(0).getAs[Long]("sounding_id") === soundings.head.sounding_id)
    assert(r(3).getAs[Double]("latitude") === soundings(3).latitude)
    assert(r(7).getAs[Int]("Sounding_operation_mode") === 2)
    assert(r(7).getAs[String]("Sounding_target_id") === "volcano0002")
    assert(r(2).getAs[Seq[Double]]("vertex_longitude").length === 4)
    // the dimension-scale dataset is a dim, not a column
    assert(!raw.columns.contains("sounding"))
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
    val dir = Files.createTempDirectory("h5-fill")
    val filled = soundings.take(3).zipWithIndex.map {
      case (s, 1) => s.copy(xco2 = 999999.0) // the declared _FillValue
      case (s, 2) => s.copy(xco2 = Double.NaN)
      case (s, _) => s
    }
    val p  = writeFixture(dir, "fill.nc4", filled, chunkRows = 2)
    val xs = NetCDFGranules.read(spark, Seq(p)).orderBy("row_index").select("xco2").collect()
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

  test("row_index range filters prune partition planning to overlapping chunks (P10 pushdown)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // 1-row splits make planned partitions observable: 10 rows -> 10 splits
    val df = spark.read.format("hdf5").option("maxrowspersplit", 1).load(granulePath)
    assert(df.rdd.getNumPartitions === soundings.length)
    // a record-dim slice plans ONLY the overlapping splits — with chunked
    // datasets (chunkRows=4) the unplanned splits' chunks are never read
    val sliced = df.filter(col("row_index") >= 2 && col("row_index") < 5)
    assert(sliced.rdd.getNumPartitions === 3)
    assert(sliced.select("row_index").collect().map(_.getLong(0)).sorted === Array(2L, 3L, 4L))
    // the scan advertises the pushed range and the pushed filters
    val scans = sliced.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("rows=[2,5)"))
    // values survive a slice that crosses a chunk boundary (chunkRows=4)
    val cross = df.filter(col("row_index") === 3 || col("row_index") === 4)
    assert(cross.select("row_index").collect().map(_.getLong(0)).sorted === Array(3L, 4L))
    // OR of ranges unions: adjacent points merge into one planned range
    assert(cross.rdd.getNumPartitions === 2)
    // a disjoint OR plans both arms and nothing between them
    val twoArm = df.filter(col("row_index") < 2 || col("row_index") >= 8)
    assert(twoArm.rdd.getNumPartitions === 4)
    assert(twoArm.select("row_index").collect().map(_.getLong(0)).sorted === Array(0L, 1L, 8L, 9L))
    val armScan = twoArm.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(armScan.head.scan.description().contains("rows=[0,2)+[8,*)"))
    // IN is a union of points
    val inSet = df.filter(col("row_index").isin(1L, 6L))
    assert(inSet.rdd.getNumPartitions === 2)
    assert(inSet.select("row_index").collect().map(_.getLong(0)).sorted === Array(1L, 6L))
  }

  test("pushed LIMIT truncates partition planning; scan stats come from headers") {
    val df = spark.read.format("hdf5").option("maxrowspersplit", 1).load(granulePath)
    // limit(3) plans 3 single-row splits, not all 10
    val limited = df.limit(3)
    assert(limited.collect().length === 3)
    val scans = limited.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("limit=3"))
    assert(scans.head.inputPartitions.length === 3)
    // header-derived statistics: the scan reports real row counts, so
    // Catalyst can see a small granule scan is broadcast-able
    val stats = spark.read.format("hdf5").load(granulePath)
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(soundings.length)))
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 1000000)
  }

  test("CF time units drive the epoch decode (SIF's 1990 epoch, no caller knowledge)") {
    val dir = Files.createTempDirectory("h5-epoch")
    val p = dir.resolve("sif.nc4")
    Files.write(p, NetCDFGranules.writeGranuleH5(
      soundings.take(3), timeUnits = "seconds since 1990-01-01 00:00:00"))
    // raw values in the file are 1990-relative…
    val raw = spark.read.format("hdf5").load(p.toString)
      .orderBy("row_index").select("time").collect()(0).getDouble(0)
    assert(raw === soundings.head.time.getTime / 1000.0 - 631152000L)
    // …and the granule view decodes them back to the true instants
    val t = NetCDFGranules.readGranules(spark, Seq(p.toString))
      .orderBy("sounding_index").select("time").collect()(0).getTimestamp(0)
    assert(t === soundings.head.time)
  }

  test("COUNT(*) pushes down to a header-only scan: one partition, no data read") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
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
    val df = spark.read.format("hdf5").option("maxrowspersplit", 1).load(granulePath)
    val counted = df.groupBy().count()
    assert(counted.collect().map(_.getLong(0)) === Array(soundings.length.toLong))
    val scans = scansOf(counted)
    assert(scans.head.scan.description().contains("count(*) header-only"))
    assert(scans.head.inputPartitions.length === 1)
    // filtered counts keep the data path (residual-filter contract)
    val filtered = df.filter(col("row_index") < 3).groupBy().count()
    assert(filtered.collect().map(_.getLong(0)) === Array(3L))
    assert(!scansOf(filtered).head.scan.description().contains("header-only"))
  }

  test("VL (NC_STRING-style) attributes decode through the global heap") {
    // codec round trip: scalar and array VL attrs, alongside fixed types
    val bytes = Hdf5.write(Seq(Hdf5.WGroup("", Seq(
      Hdf5.WVar("v", Seq(2L), Array(1.0, 2.0), atts = Seq(
        Hdf5.Attr("units", Hdf5.Vlen("seconds since 1990-01-01 00:00:00")),
        Hdf5.Attr("names", Hdf5.Vlen(Seq("alpha", "", "a longer value crossing the 8-byte pad"))),
        Hdf5.Attr("scale", Array(2.5))))))))
    val f  = Hdf5.open(new Hdf5.BytesInput(bytes))
    val ds = f.dataset("v").get
    assert(ds.att("units") === Some("seconds since 1990-01-01 00:00:00"))
    assert(ds.att("names").get.asInstanceOf[Array[String]].toSeq ===
      Seq("alpha", "", "a longer value crossing the 8-byte pad"))
    assert(ds.att("scale").get.asInstanceOf[Array[Double]].toSeq === Seq(2.5))
  }

  test("a VL-encoded time units attribute drives the epoch decode end to end") {
    val dir = Files.createTempDirectory("h5-vlen-epoch")
    val p = dir.resolve("sif_vlen.nc4")
    Files.write(p, NetCDFGranules.writeGranuleH5(
      soundings.take(3), timeUnits = "seconds since 1990-01-01 00:00:00", vlenUnits = true))
    val raw = spark.read.format("hdf5").load(p.toString)
    assert(raw.schema("time").metadata.getString("units") === "seconds since 1990-01-01 00:00:00")
    val t = NetCDFGranules.readGranules(spark, Seq(p.toString))
      .orderBy("sounding_index").select("time").collect()(0).getTimestamp(0)
    assert(t === soundings.head.time) // no silent 1970 fallback
  }

  test("a present but undecodable time units attribute fails loudly, not as a 1970 fallback") {
    val dir = Files.createTempDirectory("h5-bad-units")
    val p = dir.resolve("bad_units.nc4")
    // bypass writeGranuleH5 (it decodes units itself): patch the fixture's
    // units attr to garbage at the codec level
    import Hdf5._
    val bytes = Hdf5.write(Seq(WGroup("", Seq(
      WVar("sounding", Seq(2L), new Array[Double](2), atts = Seq(
        Attr("CLASS", "DIMENSION_SCALE"),
        Attr("NAME", f"This is a netCDF dimension but not a netCDF variable.${2}%10d"))),
      WVar("time", Seq(2L), Array(1.0, 2.0), atts = Seq(Attr("units", Vlen("cycles of the moon")))),
      WVar("latitude", Seq(2L), Array(0.1, 0.2))))))
    Files.write(p, bytes)
    // the epoch decode happens at plan-build time, before any column checks
    val err = intercept[IllegalArgumentException] {
      NetCDFGranules.toGranule(spark.read.format("hdf5").load(p.toString))
    }
    assert(err.getMessage.contains("cycles of the moon"))
  }

  test("format dispatch unions classic and HDF5 granules in one batch") {
    val dir = Files.createTempDirectory("mixed-granules")
    val h5  = writeFixture(dir, "day1.nc4", soundings.take(5))
    val ncPath = dir.resolve("day2.nc")
    val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(ncPath.toFile))
    try NetCDFGranules.writeGranule(os, soundings.drop(5)) finally os.close()
    val both = NetCDFGranules.read(spark, Seq(h5, ncPath.toString))
    assert(both.count() === soundings.length)
    val byFile = both.groupBy("granule_path").count().collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(byFile === Map("day1.nc4" -> 5L, "day2.nc" -> 5L))
  }

  test("an HDF5 granule flows through Pipeline.process identically to the in-memory and classic paths") {
    val fromH5  = NetCDFGranules.readGranules(spark, Seq(granulePath)).drop("granule_path", "sounding_id")
    val fromMem = SyntheticGranule.toDF(spark, soundings).drop("sounding_id")
    val cfg = Pipeline.Config(gridN = 8)
    val key = Seq("target_id", "variable", "lat_idx", "lon_idx")
    val a = Pipeline.process(fromH5, catalog, cfg)
      .orderBy(key.map(col): _*).collect().toSeq
    val b = Pipeline.process(fromMem, catalog, cfg)
      .orderBy(key.map(col): _*).collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }
}
