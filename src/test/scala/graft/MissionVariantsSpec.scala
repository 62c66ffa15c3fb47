package graft

import org.apache.spark.sql.functions._
import graft.domain._
import graft.domain.TargetCatalog.Target
import graft.sources.SyntheticGranule
import graft.sources.SyntheticGranule.sounding

/** OCO-2 (nearest-centroid association), SIF (sequence resolution + 'none'
  * coalescing), and global-product (first-writer-wins annotation) variants.
  */
class MissionVariantsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog = TargetCatalog.toDF(
    spark,
    Seq(
      Target("fossil0001", "Plant A", 10.0, 40.0, 12.0, 42.0),
      Target("volcano0002", "Volcano B", -5.0, -1.0, -3.0, 1.0)))

  test("OCO-2: regions associate to nearest centroid with bbox validity") {
    // region near Plant A's center (11, 41); no target ids in input
    val g = SyntheticGranule.toDF(
      spark,
      (0 until 6).map(i => sounding(i, 40.9 + 0.05 * i, 10.9 + 0.05 * i, mode = 2, target = "")) ++
        // far-away region: nearest is still one of the two targets, but its
        // bbox does not intersect -> dropped (OCO2Processor.py:427-430)
        (6 until 9).map(i => sounding(i, -40.0, 100.0, mode = 2, target = "")))
    val out = Oco2Pipeline.process(g, catalog)
    val targets = out.select("target_id").distinct().collect().map(_.getString(0))
    assert(targets === Array("fossil0001"))
    assert(out.count() > 0)
  }

  test("SIF: sequence lookup resolves targets and 'none' coalesces into runs") {
    val sequences = Seq((0, "fossil0001"), (1, "volcano0002")).toDF("seq_index", "seq_target")
    // soundings: indices [0,-1,0] -> fossil0001 run with interior 'none'
    // that must coalesce, then a volcano0002 run
    val rows = Seq(
      (0L, 41.0, 11.0, 0),
      (1L, 41.1, 11.1, -1),
      (2L, 41.2, 11.2, 0),
      (3L, -0.5, -4.5, 1),
      (4L, -0.4, -4.4, 1)
    ).map { case (i, lat, lon, seq) =>
      (i, lat, lon, 1071878400.0 + i, // ~2023-12 in s-since-1990
        Seq(lat - 0.3, lat - 0.3, lat + 0.3, lat + 0.3),
        Seq(lon - 0.3, lon + 0.3, lon + 0.3, lon - 0.3),
        0, 1.5 + i, 3, seq)
    }.toDF("sounding_index", "latitude", "longitude", "delta_time",
      "vertex_latitude", "vertex_longitude", "quality_flag", "daily_sif",
      "operation_mode", "sequences_index")
    val out = Pipeline.Config(samMode = 3, targetMode = 2)
    val result = SifPipeline.process(rows, sequences, catalog, out)
    val targets = result.select("target_id").distinct().collect().map(_.getString(0)).sorted
    assert(targets === Array("fossil0001", "volcano0002"))
    // the 'none' sounding joined the fossil0001 run: its value appears there
    val fossilVals = result
      .filter(col("target_id") === "fossil0001" && col("variable") === "daily_sif")
      .select("value").distinct().collect().map(_.getDouble(0)).toSet
    assert(fossilVals.subsetOf(Set(1.5, 2.5, 3.5)))
    assert(fossilVals.contains(2.5)) // the coalesced 'none' sounding's value
  }

  test("OCO-2 multi-granule batches sessionize per file (no target key, indexes repeat)") {
    // two files, identical index ranges, Target-mode runs near different
    // catalog targets: a global window would interleave them into one
    // fragmented stream; per-granule windows give one region per file,
    // each nearest-centroid-associated to its own target
    val g = ((0 until 6).map(i =>
      sounding(i, 40.9 + 0.05 * i, 10.9 + 0.05 * i, mode = 2, target = "")) ++
      (0 until 6).map(i =>
        sounding(i, -0.9 + 0.05 * i, -4.9 + 0.05 * i, mode = 2, target = "")))
    val df = SyntheticGranule.toDF(spark, g.take(6)).withColumn("granule_path", lit("A.nc4"))
      .unionByName(SyntheticGranule.toDF(spark, g.drop(6)).withColumn("granule_path", lit("B.nc4")))
    val s = Oco2Pipeline.sessionizePerGranule(df, Pipeline.Config(), "granule_path")
    val regions = s.groupBy(col("region_id"))
      .agg(countDistinct(col("granule_path")).as("n_files"), count(lit(1)).as("n"))
      .collect()
    assert(regions.length === 2)
    assert(regions.forall(r => r.getAs[Long]("n_files") === 1L && r.getAs[Long]("n") === 6L))
    val out = Oco2Pipeline.process(df, catalog)
    assert(out.select("target_id").distinct().collect().map(_.getString(0)).sorted ===
      Array("fossil0001", "volcano0002"))
  }

  test("SIF multi-granule batches sessionize per file — repeated sounding indexes must not interleave") {
    // two files with IDENTICAL sounding_index ranges and their own
    // /Sequences tables: a global window would interleave A,B,A,B by index
    // (fragmenting runs and coalescing 'none' across files); per-granule
    // windows keep each file an independent ordered stream
    val sequences = Seq(
      ("A.nc4", 0, "fossil0001"),
      ("B.nc4", 0, "volcano0002")
    ).toDF("granule_path", "seq_index", "seq_target")
    def rows(path: String, lat0: Double, lon0: Double) = (0 until 3).map { i =>
      val lat = lat0 + 0.05 * i; val lon = lon0 + 0.05 * i
      (i.toLong, lat, lon, 1071878400.0 + i,
        Seq(lat - 0.3, lat - 0.3, lat + 0.3, lat + 0.3),
        Seq(lon - 0.3, lon + 0.3, lon + 0.3, lon - 0.3),
        0, 1.5 + i, 3, 0, path)
    }
    val soundings = (rows("A.nc4", 41.0, 11.0) ++ rows("B.nc4", -0.5, -4.5))
      .toDF("sounding_index", "latitude", "longitude", "delta_time",
        "vertex_latitude", "vertex_longitude", "quality_flag", "daily_sif",
        "operation_mode", "sequences_index", "granule_path")
    val cfg = Pipeline.Config(samMode = 3, targetMode = 2)
    val s = SifPipeline.sessionizePerGranule(
      SifPipeline.resolveTargets(soundings, sequences), cfg, "granule_path")
    val regions = s.groupBy(col("region_id"))
      .agg(
        countDistinct(col("granule_path")).as("n_files"),
        min(col("target_id")).as("t"),
        count(lit(1)).as("n"))
      .collect()
    assert(regions.length === 2) // one region per file, not 6 fragments
    assert(regions.forall(r => r.getAs[Long]("n_files") === 1L && r.getAs[Long]("n") === 3L))
    // per-granule sequence resolution: file A's seq 0 != file B's seq 0
    assert(regions.map(_.getAs[String]("t")).sorted === Array("fossil0001", "volcano0002"))
    // end-to-end: both files' products come out of the full pipeline
    val out = SifPipeline.process(soundings, sequences, catalog, cfg)
    assert(out.select("target_id").distinct().collect().map(_.getString(0)).sorted ===
      Array("fossil0001", "volcano0002"))
  }

  test("global product: first-writer-wins annotation on overlapping regions") {
    // two SAM regions over the same area (separated by a non-SAM gap so they
    // sessionize apart), different targets: lower region_id must win
    val g = SyntheticGranule.toDF(
      spark,
      (0 until 4).map(i => sounding(i, 41.0, 11.0 + 0.01 * i, mode = 4, target = "fossil0001", xco2 = 400.0)) ++
        Seq(sounding(4, 0.0, 0.0, mode = 0, target = "x"), sounding(5, 0.0, 0.0, mode = 0, target = "x"), sounding(6, 0.0, 0.0, mode = 0, target = "x")) ++
        (7 until 11).map(i => sounding(i, 41.0, 11.0 + 0.01 * (i - 7), mode = 4, target = "volcano0020", xco2 = 500.0)))
    val out = GlobalPipeline.process(g, GlobalPipeline.DefaultGrid)
    val vals = out.filter(col("variable") === "xco2").select("value").distinct()
      .collect().map(_.getDouble(0)).toSet
    // every overlapping pixel resolves to the first region's value
    assert(vals === Set(400.0))
    val ann = out.select("target_num", "target_type").distinct().collect()
      .map(r => (r.getInt(0), r.getByte(1)))
    assert(ann === Array((1, 1.toByte))) // fossil0001 -> num 1, type fossil=1 (TargetInfo.py TARGET_TYPES)
    // global indices are within the global mesh
    val mx = out.agg(max("lon_idx"), max("lat_idx")).collect()(0)
    assert(mx.getInt(0) < 360 && mx.getInt(1) < 180)
  }

  test("mission merge unions long forms under a mission column") {
    val a = Seq(("t1", "xco2", 1.0)).toDF("target_id", "variable", "value")
    val b = Seq(("t2", "sif", 2.0)).toDF("target_id", "variable", "value")
    val m = GlobalPipeline.mergeMissions(Map("oco3" -> a, "oco3_sif" -> b))
    assert(m.count() === 2)
    assert(m.select("mission").distinct().count() === 2)
  }

  test("empty-day synthesis produces a dense all-fill mesh") {
    val d = GlobalPipeline.emptyDay(
      spark, graft.operators.Grid.GridSpec(0, 1, 3, 0, 1, 3), "2023-06-15", Seq("xco2"))
    assert(d.count() === 9)
    assert(d.filter(isnan(col("value"))).count() === 9)
  }

  test("coveredPixels guard: an oversized region fails loudly at the explode, not as a task OOM") {
    val g = graft.operators.Grid.GridSpec(-180.0, 180.0, 3600, -90.0, 90.0, 1800)
    // two regions: a sane 2°×2°-ish box and a band-sized degenerate one
    val extents = Seq(
      (0L, 10.0, 12.0, 40.0, 42.0),      // ~20×20 cells at 0.1°
      (1L, -170.0, 150.0, -40.0, -28.0)) // ~3200×120 cells = 384k
      .toDF("region_id", "fminx", "fmaxx", "fminy", "fmaxy")
    // default ceiling (32M) is 2+ orders above even the degenerate band
    assert(GlobalPipeline.coveredPixels(extents, g).count() > 384000L)
    // with the ceiling below the band's area, the explode raises a
    // message naming the region and its size; the sane region alone passes
    spark.conf.set(GlobalPipeline.MaxRegionPixelsConfKey, "100000")
    try {
      val e = intercept[Exception] {
        GlobalPipeline.coveredPixels(extents, g).count()
      }
      assert(e.getMessage.contains("region 1") && e.getMessage.contains("maxRegionPixels"),
        s"unexpected message: ${e.getMessage}")
      assert(GlobalPipeline.coveredPixels(extents.filter(col("region_id") === 0L), g)
        .count() === 400L) // 20×20 (ceil/floor inner-cell rounding)
    } finally spark.conf.unset(GlobalPipeline.MaxRegionPixelsConfKey)
  }

  test("regionTiles: oversized regions split into disjoint latitude strips covering the extent") {
    val g = graft.operators.Grid.GridSpec(-180.0, 180.0, 3600, -90.0, 90.0, 1800)
    val extents = Seq(
      (0L, 10.0, 12.0, 40.0, 42.0),      // ~20×20 cells — one tile
      (1L, -170.0, 150.0, -40.0, -28.0)) // ~3200×120 cells = 384k — splits
      .toDF("region_id", "fminx", "fmaxx", "fminy", "fmaxy")
    spark.conf.set(GlobalPipeline.MaxRegionPixelsConfKey, "100000")
    spark.conf.set(GlobalPipeline.TilePixelsConfKey, "37000") // non-round: exercises ceil remainders
    try {
      val tiles = GlobalPipeline.regionTiles(extents, g).collect()
      val small = tiles.filter(_.getAs[Long]("region_id") == 0L)
      val big   = tiles.filter(_.getAs[Long]("region_id") == 1L)
      assert(small.length === 1)
      assert(big.length > 1)
      // surrogate keys are unique across all tiles
      assert(tiles.map(_.getAs[Long]("rkey")).distinct.length === tiles.length)
      // the big region's strips are disjoint, ordered, and exactly cover
      // [min ylo, max yhi] with every strip ≤ the tile target's row count
      val strips = big.map(r => (r.getAs[Int]("_tylo"), r.getAs[Int]("_tyhi"))).sorted
      assert(strips.forall { case (lo, hi) => lo <= hi })
      assert(strips.sliding(2).forall {
        case Array((_, hi1), (lo2, _)) => lo2 == hi1 + 1
        case _                         => true
      })
      val width = big.head.getAs[Int]("_xhi") - big.head.getAs[Int]("_xlo") + 1
      assert(strips.forall { case (lo, hi) => (hi - lo + 1).toLong * width <= 37000L + width })
    } finally {
      spark.conf.unset(GlobalPipeline.MaxRegionPixelsConfKey)
      spark.conf.unset(GlobalPipeline.TilePixelsConfKey)
    }
  }

  test("regionTiles: pathological tilePixels below the region width clamps to one strip per row") {
    val g = graft.operators.Grid.GridSpec(-180.0, 180.0, 3600, -90.0, 90.0, 1800)
    val extents = Seq((1L, -170.0, 150.0, -40.0, -28.0)) // ~3200×120 cells
      .toDF("region_id", "fminx", "fmaxx", "fminy", "fmaxy")
    spark.conf.set(GlobalPipeline.MaxRegionPixelsConfKey, "100000")
    spark.conf.set(GlobalPipeline.TilePixelsConfKey, "1") // << region width
    try {
      val tiles = GlobalPipeline.regionTiles(extents, g).collect()
      val rows  = tiles.map(r => r.getAs[Int]("_tyhi") - r.getAs[Int]("_tylo") + 1)
      // unclamped, ceil(384k / 1) would explode 384k tile rows; the cap
      // bounds tiles at the strip count (latitude rows) — one row each
      assert(tiles.length <= 121, s"${tiles.length} tiles for a 120-row extent")
      assert(rows.forall(_ >= 1))
      assert(rows.sum === tiles.map(r =>
        r.getAs[Int]("_tyhi")).max - tiles.map(r => r.getAs[Int]("_tylo")).min + 1)
    } finally {
      spark.conf.unset(GlobalPipeline.MaxRegionPixelsConfKey)
      spark.conf.unset(GlobalPipeline.TilePixelsConfKey)
    }
  }

  test("maskPixelsGlobal equals the pixels×footprints mask exactly (incl. on-grid-line bboxes)") {
    val g   = graft.operators.Grid.GridSpec(-180.0, 180.0, 3600, -90.0, 90.0, 1800)
    val cfg = graft.domain.Pipeline.Config(maskScale = 1.2)
    // footprints whose scaled bboxes land EXACTLY on grid lines (0.1°
    // cells, half-width 0.5° ⇒ 0.6° scaled) — the boundary case where a
    // prefilter rewrite could drift by one cell
    val granule = SyntheticGranule.toDF(
      spark,
      (0 until 8).map(i => sounding(i, 40.0 + 0.1 * i, 10.0 + 0.1 * i, mode = 4,
        target = "fossil0001", half = 0.5)) ++
        Seq(sounding(8, 0.0, 0.0, mode = 0, target = "x")) ++
        (9 until 14).map(i => sounding(i, -0.35 + 0.07 * (i - 9), -4.35 + 0.07 * (i - 9),
          mode = 4, target = "volcano0002", half = 0.33)))
    val sessions = graft.domain.Pipeline.qualityFilter(GlobalPipeline.sessionize(granule, cfg), cfg)
    val extents  = GlobalPipeline.regionExtent(sessions)
    val tiles    = GlobalPipeline.regionTiles(
      extents.select("region_id", "fminx", "fmaxx", "fminy", "fmaxy"), g)
    val keymap   = tiles.select(col("rkey"), col("region_id"))
    val pixels   = GlobalPipeline.coveredPixelsByTile(tiles, g).withColumnRenamed("rkey", "region_id")
    val sessionsK = sessions.join(broadcast(keymap), Seq("region_id"))
      .drop("region_id").withColumnRenamed("rkey", "region_id")
    def keySet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
      df.select(col("region_id").cast("long"), col("lon_idx").cast("int"), col("lat_idx").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val oldMask = keySet(graft.domain.Pipeline.maskPixels(pixels, sessionsK, cfg))
    // footprint-driven candidates ∩ the region's pixel set (in process()
    // that intersection is the inner join with the interpolated pixels)
    val newMask = keySet(
      GlobalPipeline.maskPixelsGlobal(sessionsK, g, cfg)
        .join(pixels.select("region_id", "lon_idx", "lat_idx"),
          Seq("region_id", "lon_idx", "lat_idx"), "left_semi"))
    assert(oldMask.nonEmpty)
    assert(newMask === oldMask)
  }

  test("oversized-region split: tiled output is pixel-identical to the unsplit run; fail mode still raises") {
    val g = graft.operators.Grid.GridSpec(-180.0, 180.0, 3600, -90.0, 90.0, 1800)
    // one ~2°×2.2° region (≈ 20×22 cells at 0.1°), enough soundings for a
    // real Delaunay triangulation, plus a second small region for ordering
    val granule = SyntheticGranule.toDF(
      spark,
      (0 until 12).map(i =>
        sounding(i, 40.2 + 0.15 * i, 10.2 + 0.13 * ((i * 5) % 12), mode = 4,
          target = "fossil0001", xco2 = 400.0 + i)) ++
        Seq(sounding(12, 0.0, 0.0, mode = 0, target = "x")) ++
        (13 until 18).map(i =>
          sounding(i, -0.4 + 0.1 * (i - 13), -4.4 + 0.1 * (i - 13), mode = 4,
            target = "volcano0002", xco2 = 500.0)))
    def run(): Seq[String] =
      GlobalPipeline.process(granule, g, graft.domain.Pipeline.Config(method = "linear"))
        .collect().map(_.toString).sorted.toSeq
    val base = run() // default confs: every region is a single tile
    assert(base.nonEmpty)
    // force the first region to split into many strips
    spark.conf.set(GlobalPipeline.MaxRegionPixelsConfKey, "100")
    spark.conf.set(GlobalPipeline.TilePixelsConfKey, "37")
    try {
      assert(run() === base) // pixel-identical: same triangulation per tile
      // fail mode keeps the r15 loud-guard semantics through process()
      spark.conf.set(GlobalPipeline.OversizeRegionsConfKey, "fail")
      val e = intercept[Exception] { run() }
      assert(e.getMessage.contains("maxRegionPixels"), s"unexpected: ${e.getMessage}")
      // and a malformed mode value names the conf key
      spark.conf.set(GlobalPipeline.OversizeRegionsConfKey, "tile")
      val bad = intercept[IllegalArgumentException] { run() }
      assert(bad.getMessage.contains(GlobalPipeline.OversizeRegionsConfKey))
    } finally {
      spark.conf.unset(GlobalPipeline.MaxRegionPixelsConfKey)
      spark.conf.unset(GlobalPipeline.TilePixelsConfKey)
      spark.conf.unset(GlobalPipeline.OversizeRegionsConfKey)
    }
  }
}
