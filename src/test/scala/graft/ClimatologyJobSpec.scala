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
    // global stores carry reference-prefixed variables (OCO3_global_*)
    graft.tools.ClimatologyJob.main(
      Array(store, out, "month", "--consolidated", "--variable", "OCO3_global_xco2"))

    // monthly store: two spans (2023-01, 2024-01); Jan 2024 pixels average
    // their two days to 420
    val monthlyDays = ZarrStore.existingDays(spark, out)
    assert(monthlyDays.map(java.time.LocalDate.ofEpochDay(_).toString) ===
      Seq("2023-01-01", "2024-01-01"))
    val monthly = ZarrStore.read(spark, out, "OCO3_global_xco2_month_mean")
      .select("time_idx", "value").distinct()
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(monthly === Set((0, 400.0), (1, 420.0)))

    // consolidated store: one nominal month (2000-01-01); every pixel is
    // mean(400, 420) = 410 — mean-of-days would read 413.33
    val consDays = ZarrStore.existingDays(spark, s"$out-consolidated")
    assert(consDays.map(java.time.LocalDate.ofEpochDay(_).toString) === Seq("2000-01-01"))
    val cons = ZarrStore.read(spark, s"$out-consolidated", "OCO3_global_xco2_monthly_climatology")
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(cons === Array(410.0))

    // --from/--to: the reference's time-slice subset (main.py:220). Date
    // bounds resolve to a time-index range on the driver, so the 2024-only
    // climatology reads only 2024 chunks and averages only 410/430
    val sliced = graft.tools.ClimatologyJob.readWithTime(
      spark, store, "OCO3_global_xco2", from = Some(java.time.LocalDate.parse("2024-01-01")))
    assert(sliced.select(date_format(col("time"), "yyyy-MM-dd")).distinct()
      .collect().map(_.getString(0)).sorted === Array("2024-01-10", "2024-01-20"))
    val out24 = dir.resolve("climo-2024").toString
    graft.tools.ClimatologyJob.main(
      Array(store, out24, "month", "--variable", "OCO3_global_xco2", "--from", "2024-01-01"))
    assert(ZarrStore.existingDays(spark, out24)
      .map(java.time.LocalDate.ofEpochDay(_).toString) === Seq("2024-01-01"))
    val m24 = ZarrStore.read(spark, out24, "OCO3_global_xco2_month_mean")
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(m24 === Array(420.0))
  }

  test("seasonal-ref spans match the reference tool's 20th-of-month boundaries, incl. the partial first span") {
    import spark.implicits._
    import graft.operators.Climatology
    // coverage starts 2023-01-10: the reference's first span is the
    // coverage-clipped partial [2023-01-10 .. 2023-03-20], then
    // [Mar 21 .. Jun 20], [Jun 21 .. Sep 20], [Sep 21 .. Dec 20],
    // [Dec 21 .. coverage end] (`tools/climatology/main.py:194-210`:
    // month-end dates filtered to month%3==0 and re-pinned to day 20)
    val want = Seq(
      "2023-01-10" -> "2023-01-10", // coverage start labels the partial span
      "2023-03-15" -> "2023-01-10",
      "2023-03-20" -> "2023-01-10", // the 20th still belongs to the first span
      "2023-03-21" -> "2023-03-21", // the 21st opens the next season
      "2023-03-25" -> "2023-03-21",
      "2023-06-15" -> "2023-03-21",
      "2023-06-20" -> "2023-03-21", // season runs THROUGH Jun 20...
      "2023-06-21" -> "2023-06-21", // ...and flips on the 21st
      "2023-06-25" -> "2023-06-21",
      "2023-09-20" -> "2023-06-21",
      "2023-09-21" -> "2023-09-21",
      "2023-12-20" -> "2023-09-21",
      "2023-12-21" -> "2023-12-21", // Dec 21 wraps into the next year's span
      "2024-01-05" -> "2023-12-21")
    val df = want.map(_._1).map(d => (d, 1.0)).toDF("day", "v")
      .select(col("day").cast("timestamp").as("time"), col("v"))
    val got = Climatology
      .temporalMean(df, "time", "v", "seasonal-ref", keyCols = Nil)
      .select(col("span_start"))
      .collect().map(_.getString(0)).sorted
    assert(got === want.map(_._2).distinct.sorted)
    // per-day membership: group by (day, span) and check every pair
    val cov = df.agg(min(col("time")).as("_cov"))
    val pairs = df.crossJoin(broadcast(cov))
      .select(
        date_format(col("time"), "yyyy-MM-dd").as("day"),
        date_format(
          Climatology.spanStartSeasonalRef(col("time"), col("_cov")), "yyyy-MM-dd").as("span"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
    assert(pairs === want.sorted)
    // the clean DJF "season" mode is untouched (default behavior kept):
    // Mar 15 truncates to Mar 1, Dec 21 to Dec 1
    val djf = df.select(
      date_format(col("time"), "yyyy-MM-dd").as("day"),
      date_format(Climatology.spanStart(col("time"), "season"), "yyyy-MM-dd").as("span"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(djf("2023-03-15") === "2023-03-01")
    assert(djf("2023-12-21") === "2023-12-01")
    assert(djf("2024-01-05") === "2023-12-01")
  }

  test("ClimatologyJob CLI runs seasonal-ref over a Zarr store with reference span boundaries") {
    val dir = Files.createTempDirectory("climo-ref")
    import spark.implicits._
    // store days straddling the Mar-20 boundary: coverage starts Mar 10, so
    // spans are [Mar 10 .. Mar 20] (partial first) and [Mar 21 .. ...]
    val rows = Seq(
      ("2023-03-10", 400.0), ("2023-03-20", 420.0), // first (clipped) span: mean 410
      ("2023-03-21", 430.0), ("2023-03-25", 450.0)) // second span: mean 440
    val long = rows.map { case (d, v) => (d, "xco2", 3, 4, v) }
      .toDF("time", "variable", "lat_idx", "lon_idx", "value")
      .withColumn("time", col("time").cast("timestamp"))
    val store = dir.resolve("store").toString
    val grid = ZarrStore.GridSpec(180, 360, -89.5, 1.0, -179.5, 1.0)
    ZarrStore.write(long, store, grid)
    val out = dir.resolve("out").toString
    graft.tools.ClimatologyJob.main(Array(store, out, "seasonal-ref"))
    val spanDays = ZarrStore.existingDays(spark, out)
      .map(java.time.LocalDate.ofEpochDay(_).toString)
    assert(spanDays === Seq("2023-03-10", "2023-03-21")) // coverage-clipped + 21st boundary
    val means = ZarrStore.read(spark, out, "xco2_seasonal-ref_mean")
      .select("time_idx", "value").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(means === Set((0, 410.0), (1, 440.0)))
  }

  test("incremental day-grain state: fold is bit-identical to full recompute, re-ingest converges") {
    import spark.implicits._
    import graft.operators.Climatology
    // two months, 14 days each, 3 rows/day across two keys
    val ev = (for (m <- 1 to 2; d <- 1 to 14; i <- 0 until 3) yield (
      java.sql.Timestamp.valueOf(f"2023-$m%02d-$d%02d 0$i%01d:30:00"),
      if (i == 0) "a" else "b",
      m * 100.0 + d + i * 0.25
    )).toDF("ts", "event_type", "value")
    val state = Files.createTempDirectory("incclimo").toString
    val firstWeek = ev.filter(dayofmonth(col("ts")) <= 7)
    val rest      = ev.filter(dayofmonth(col("ts")) > 7)
    Climatology.updateDailyState(firstWeek, "ts", "value", Seq("event_type"), state)
    Climatology.updateDailyState(rest, "ts", "value", Seq("event_type"), state)
    // idempotent re-ingest: replaying a day-batch overwrites its own
    // partitions and changes nothing
    Climatology.updateDailyState(rest, "ts", "value", Seq("event_type"), state)
    for (span <- Seq("month", "year")) {
      val inc  = Climatology.meansFromState(spark, state, span, Seq("event_type"))
        .collect().toSet
      val full = Climatology.temporalMean(ev, "ts", "value", span, Seq("event_type"))
        .collect().toSet
      assert(inc === full, s"span=$span") // Row equality on doubles: BIT-identical
    }
  }

  test("incremental state property: ANY day-batch split folds bit-identical to recompute") {
    import spark.implicits._
    import graft.operators.Climatology
    val rng = new scala.util.Random(13)
    val ev = (for (m <- 1 to 3; d <- 1 to 10; i <- 0 until 2) yield (
      java.sql.Timestamp.valueOf(f"2023-$m%02d-$d%02d 0$i%01d:15:00"),
      if ((d + i) % 2 == 0) "a" else "b",
      m * 10.0 + d + i * 0.5
    )).toDF("ts", "event_type", "value")
    val allDays = ev.select(col("ts").cast("date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val full = Climatology.temporalMean(ev, "ts", "value", "month", Seq("event_type"))
      .collect().toSet
    for (trial <- 1 to 3) {
      // random partition of the 30 days into 1..5 whole-day batches,
      // random order, one batch randomly replayed (at-least-once)
      val nBatches = 1 + rng.nextInt(5)
      val assign   = allDays.groupBy(_ => rng.nextInt(nBatches)).values.toSeq
      val batches  = rng.shuffle(assign ++ Seq(assign(rng.nextInt(assign.size))))
      val state    = Files.createTempDirectory(s"prop-state-$trial").toString
      batches.foreach { days =>
        Climatology.updateDailyState(
          ev.filter(col("ts").cast("date").cast("string").isin(days: _*)),
          "ts", "value", Seq("event_type"), state)
      }
      val inc = Climatology.meansFromState(spark, state, "month", Seq("event_type"))
        .collect().toSet
      assert(inc === full, s"trial $trial: batches=${batches.map(_.size).mkString(",")}")
    }
  }

  test("day-rewrite reprocessing: store-backed refresh brings state bit-identical to recompute") {
    import spark.implicits._
    import graft.operators.Climatology
    import graft.sinks.ProductStore
    val mk = (day: String, v: Double) => (0 until 3).map(i =>
      (java.sql.Timestamp.valueOf(f"$day 0$i%01d:00:00"), "a", v + i)).toDF("time", "event_type", "value")
    val dir   = Files.createTempDirectory("dayrewrite")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state").toString

    // initial ingest: two days, state built per day-batch
    ProductStore.appendIdempotent(mk("2023-06-15", 100.0), store)
    ProductStore.appendIdempotent(mk("2023-06-16", 200.0), store)
    val read = () => ProductStore.read(spark, store).withColumnRenamed("time", "ts")
    Climatology.refreshDaysFromStore(
      read(), "day", Seq("2023-06-15", "2023-06-16"), "ts", "value", Seq("event_type"), state)

    // reprocessing: day 2 re-delivered CORRECTED (S8 verify/repair flow) —
    // the store partition is replaced, then the state refreshes only that day
    ProductStore.appendIdempotent(mk("2023-06-16", 500.0), store)
    Climatology.refreshDaysFromStore(
      read(), "day", Seq("2023-06-16"), "ts", "value", Seq("event_type"), state)

    val inc  = Climatology.meansFromState(spark, state, "month", Seq("event_type")).collect().toSet
    val full = Climatology.temporalMean(
      mk("2023-06-15", 100.0).unionByName(mk("2023-06-16", 500.0))
        .withColumnRenamed("time", "ts"),
      "ts", "value", "month", Seq("event_type")).collect().toSet
    assert(inc === full) // stale day-2 state fully replaced, day-1 untouched
  }

  test("ClimatologyJob --state: nightly incremental CLI equals full recompute") {
    import spark.implicits._
    import graft.operators.Climatology
    import graft.sinks.ProductStore
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("clistate")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state").toString

    // night 1: one day in the store, first incremental run seeds the state
    ProductStore.appendIdempotent(mkLong("2023-06-15", 400.0), store)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out1").toString, "month", "--state", state))
    // night 2: a new day arrives — only IT should refresh
    ProductStore.appendIdempotent(mkLong("2023-07-01", 410.0), store)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out2").toString, "month", "--state", state))

    val got = spark.read.parquet(dir.resolve("out2").toString).collect().toSet
    val full = Climatology.temporalMean(
      mkLong("2023-06-15", 400.0).unionByName(mkLong("2023-07-01", 410.0)),
      "time", "value", "month", Seq("target_id", "variable")).collect().toSet
    assert(got === full) // bit-identical to the full-store recompute
    // the state holds exactly the two day partitions
    val stateDays = new java.io.File(state).listFiles().map(_.getName).filter(_.startsWith("day=")).sorted
    assert(stateDays === Array("day=2023-06-15", "day=2023-07-01"))
  }

  test("ClimatologyJob --state: a _REFRESH_FAILED marker is surfaced loudly and cleared by a healthy run") {
    import graft.sinks.ProductStore
    import spark.implicits._
    // the streaming loop's post-commit refresh failure leaves a durable
    // marker in the state dir; before r19 it was durable but INVISIBLE —
    // nothing operator-facing read it. The incremental CLI must warn and,
    // after a healthy refresh, clear it (mirroring the streaming loop).
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("climarker")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state")
    ProductStore.appendIdempotent(mkLong("2023-06-15", 400.0), store)
    Files.createDirectories(state)
    val marker = state.resolve("_REFRESH_FAILED")
    Files.write(marker, "2026-01-01T00:00:00Z simulated streaming refresh failure\n".getBytes("UTF-8"))
    def run(out: String): String = {
      val bout = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bout, true, "UTF-8")) {
        graft.tools.ClimatologyJob.main(
          Array(store, dir.resolve(out).toString, "month", "--state", state.toString))
      }
      new String(bout.toByteArray, "UTF-8")
    }
    val out1 = run("out1")
    assert(out1.contains("\"refresh_failed_marker\":true"), s"marker not surfaced: $out1")
    assert(!Files.exists(marker), "healthy incremental run did not clear the marker")
    // and the run still produced correct means (the failed days were
    // absent from the state, so new-day detection refreshed them)
    val got = spark.read.parquet(dir.resolve("out1").toString).collect().toSet
    val full = graft.operators.Climatology.temporalMean(
      mkLong("2023-06-15", 400.0), "time", "value", "month", Seq("target_id", "variable"))
      .collect().toSet
    assert(got === full)
    val out2 = run("out2")
    assert(out2.contains("\"refresh_failed_marker\":false"), s"stale flag: $out2")
  }

  test("ClimatologyJob --state: marker-named failed days are re-aggregated even when already in the state") {
    import graft.sinks.ProductStore
    import spark.implicits._
    // ADVICE r19: a day whose FIRST refresh succeeded and a later
    // same-day refresh failed is in both storeDays and stateDays, so
    // new-day detection excludes it — r19 cleared the marker anyway and
    // the stale values silently survived. The marker now names its failed
    // days and the incremental run auto-adds them to the refresh set.
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("climheal")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state")
    // day enters store AND state healthily
    ProductStore.appendIdempotent(mkLong("2023-06-15", 400.0), store)
    graft.tools.ClimatologyJob.main(
      Array(store, dir.resolve("out0").toString, "month", "--state", state.toString))
    // the day is REWRITTEN in the store (reprocessing), and the follow-up
    // streaming refresh fails — simulated by the day-carrying marker
    ProductStore.appendIdempotent(mkLong("2023-06-15", 500.0), store)
    val marker = state.resolve("_REFRESH_FAILED")
    Files.write(marker,
      "2026-01-01T00:00:00Z simulated refresh failure\nfailed_days=2023-06-15\n"
        .getBytes("UTF-8"))
    // the incremental run must re-aggregate the marker day FROM THE STORE
    // (no --refresh-days needed) and only then clear the alarm
    graft.tools.ClimatologyJob.main(
      Array(store, dir.resolve("out1").toString, "month", "--state", state.toString))
    assert(!Files.exists(marker), "marker must clear after its days were healed")
    val got = spark.read.parquet(dir.resolve("out1").toString).collect().toSet
    val full = graft.operators.Climatology.temporalMean(
      mkLong("2023-06-15", 500.0), "time", "value", "month", Seq("target_id", "variable"))
      .collect().toSet
    assert(got === full, "marker-named day still stale after the incremental run")
  }

  test("state compaction: fold bit-identical before/after, idempotent, hot wins over base on refresh") {
    import spark.implicits._
    import graft.operators.Climatology
    // VERDICT r19 #3: the state dir grows one parquet file per day with no
    // compaction (~365 objects/yr). compactState settles old hot days into
    // a month-partitioned _base segment (~one file per month) without
    // changing a single folded bit.
    val ev = (for (m <- 1 to 3; d <- 1 to 14; i <- 0 until 3) yield (
      java.sql.Timestamp.valueOf(f"2023-$m%02d-$d%02d 0$i%01d:30:00"),
      if (i == 0) "a" else "b",
      m * 100.0 + d + i * 0.25
    )).toDF("ts", "event_type", "value")
    val state = Files.createTempDirectory("compactstate").toString
    Climatology.updateDailyState(ev, "ts", "value", Seq("event_type"), state)
    def hotDirs() = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith("day=")).sorted
    def baseMonths() = {
      val b = new java.io.File(state, "_base")
      if (!b.exists()) Array.empty[String]
      else b.listFiles().map(_.getName).filter(_.startsWith("month=")).sorted
    }
    def stateParquetFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(state)).count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    }
    assert(hotDirs().length === 42)
    val before = Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet
    val filesBefore = stateParquetFiles()

    // compact all but the newest 7 days
    val (compacted, hotLeft) = Climatology.compactState(spark, state, keepDays = 7)
    assert(compacted === 35 && hotLeft === 7)
    assert(hotDirs().length === 7)
    assert(baseMonths() === Array("month=2023-01", "month=2023-02", "month=2023-03"))
    val filesAfter = stateParquetFiles()
    assert(filesAfter < filesBefore / 3,
      s"small-file pressure must drop: $filesBefore -> $filesAfter")
    val after = Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet
    assert(after === before, "fold must be bit-identical across compaction")

    // idempotent: nothing left to settle, fold unchanged
    assert(Climatology.compactState(spark, state, keepDays = 7) === ((0, 7)))
    assert(Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet === before)

    // refresh of a COMPACTED day (the reprocessing flow): the hot rewrite
    // wins over the base's stale rows without touching the base
    val corrected = ev.filter(col("ts").cast("date") =!= lit("2023-01-03").cast("date"))
      .unionByName(Seq(
        (java.sql.Timestamp.valueOf("2023-01-03 09:00:00"), "a", 9999.0))
        .toDF("ts", "event_type", "value"))
    Climatology.updateDailyState(
      corrected.filter(col("ts").cast("date") === lit("2023-01-03").cast("date")),
      "ts", "value", Seq("event_type"), state)
    val incCorrected = Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet
    val fullCorrected = Climatology.temporalMean(
      corrected, "ts", "value", "month", Seq("event_type")).collect().toSet
    assert(incCorrected === fullCorrected,
      "hot rewrite of a compacted day must win over the stale base rows")

    // re-compaction merges the fresh hot day and DROPS the base's stale
    // rows for it (keepDays=0 settles everything)
    assert(Climatology.compactState(spark, state, keepDays = 0)._2 === 0)
    assert(hotDirs().isEmpty)
    assert(Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet === fullCorrected)

    // stale-day eviction from the base (store day deleted outright)
    val janDays = (1 to 14).map(d => f"2023-01-$d%02d")
    Climatology.dropDaysFromBase(spark, state, janDays)
    assert(baseMonths() === Array("month=2023-02", "month=2023-03"),
      "a month whose every day dropped must lose its partition dir")
    val withoutJan = Climatology.temporalMean(
      corrected.filter(month(col("ts")) =!= 1), "ts", "value", "month", Seq("event_type"))
      .collect().toSet
    assert(Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet === withoutJan)
    // partial-month eviction rewrites, not deletes
    Climatology.dropDaysFromBase(spark, state, Seq("2023-02-01"))
    assert(baseMonths() === Array("month=2023-02", "month=2023-03"))
    val withoutFeb1 = Climatology.temporalMean(
      corrected.filter(month(col("ts")) =!= 1)
        .filter(col("ts").cast("date") =!= lit("2023-02-01").cast("date")),
      "ts", "value", "month", Seq("event_type")).collect().toSet
    assert(Climatology.meansFromState(spark, state, "month", Seq("event_type"))
      .collect().toSet === withoutFeb1)
  }

  test("ClimatologyJob --compact-state CLI: nightly run compacts, means stay bit-identical, stale days evict from base") {
    import spark.implicits._
    import graft.operators.Climatology
    import graft.sinks.ProductStore
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("clicompact")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state").toString
    val days  = (1 to 12).map(d => f"2023-06-$d%02d")
    days.foreach(d => ProductStore.appendIdempotent(mkLong(d, 400.0 + d.takeRight(2).toInt), store))
    def run(out: String, extra: String*): Unit =
      graft.tools.ClimatologyJob.main(
        Array(store, dir.resolve(out).toString, "month", "--state", state) ++ extra)
    // plain incremental seeds the state; compacting run settles 12-3=9 days
    run("out1")
    run("out2", "--compact-state", "--compact-keep", "3")
    val hot = new java.io.File(state).listFiles().map(_.getName).filter(_.startsWith("day="))
    assert(hot.length === 3, s"hot tier after compaction: ${hot.toSeq}")
    assert(new java.io.File(state, "_base/month=2023-06").exists())
    val full = Climatology.temporalMean(
      days.map(d => mkLong(d, 400.0 + d.takeRight(2).toInt)).reduce(_.unionByName(_)),
      "time", "value", "month", Seq("target_id", "variable")).collect().toSet
    assert(spark.read.parquet(dir.resolve("out2").toString).collect().toSet === full)
    // a compacted day deleted from the store evicts from the BASE on the
    // next incremental run (hot-tier staleness alone would not cover it)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(store, "day=2023-06-01"), true)
    run("out3")
    val fullMinus = Climatology.temporalMean(
      days.drop(1).map(d => mkLong(d, 400.0 + d.takeRight(2).toInt)).reduce(_.unionByName(_)),
      "time", "value", "month", Seq("target_id", "variable")).collect().toSet
    assert(spark.read.parquet(dir.resolve("out3").toString).collect().toSet === fullMinus,
      "a store-deleted compacted day must leave the base-backed fold")
  }

  test("ClimatologyJob --state: deleting a store day drops its state partition; empty store refuses the drop") {
    import spark.implicits._
    import graft.operators.Climatology
    import graft.sinks.ProductStore
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("staledrop")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state").toString

    ProductStore.appendIdempotent(mkLong("2023-06-15", 400.0), store)
    ProductStore.appendIdempotent(mkLong("2023-07-01", 410.0), store)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out1").toString, "month", "--state", state))
    def stateDays() = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(stateDays() === Array("day=2023-06-15", "day=2023-07-01"))

    // a store day is deleted (retention / erroneous-ingest rollback): the
    // next incremental run must drop its state partition, and span means
    // must equal a full recompute over the shrunk store
    val conf = spark.sessionState.newHadoopConf()
    val fs   = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(store, "day=2023-07-01"), true)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out2").toString, "month", "--state", state))
    assert(stateDays() === Array("day=2023-06-15"), "deleted store day must leave the state")
    val got  = spark.read.parquet(dir.resolve("out2").toString).collect().toSet
    val full = Climatology.temporalMean(
      mkLong("2023-06-15", 400.0), "time", "value", "month", Seq("target_id", "variable"))
      .collect().toSet
    assert(got === full) // bit-identical to recompute over the shrunk store

    // guard: a store with ZERO days (empty-but-valid parquet, or a mistyped
    // path) must NOT wipe the whole state — it refuses loudly instead
    val emptyStore = dir.resolve("empty-store").toString
    mkLong("2023-06-15", 400.0).withColumn("day", col("time").cast("date"))
      .limit(0).write.parquet(emptyStore)
    val ex = intercept[IllegalStateException] {
      graft.tools.ClimatologyJob.main(
        Array(emptyStore, dir.resolve("out3").toString, "month", "--state", state))
    }
    assert(ex.getMessage.contains("refusing"))
    assert(stateDays() === Array("day=2023-06-15"), "state must survive the refused run")
  }

  test("ClimatologyJob --refresh-days CLI: an in-place day rewrite refreshes only the named day") {
    import spark.implicits._
    import graft.operators.Climatology
    import graft.sinks.ProductStore
    val mkLong = (day: String, v: Double) => (0 until 4).map(i =>
      ("fossil0001", java.sql.Timestamp.valueOf(f"$day 10:0$i%01d:00"),
        i, i, 40.0 + i, 10.0 + i, "xco2", v + i))
      .toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
    val dir   = Files.createTempDirectory("refreshcli")
    val store = dir.resolve("store").toString
    val state = dir.resolve("state").toString
    ProductStore.appendIdempotent(mkLong("2023-06-15", 400.0), store)
    ProductStore.appendIdempotent(mkLong("2023-06-16", 200.0), store)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out1").toString, "month", "--state", state))
    // S8 reprocessing: day 2's store partition rewritten IN PLACE (both
    // sides still list the day, so only --refresh-days knows it's stale)
    ProductStore.appendIdempotent(mkLong("2023-06-16", 500.0), store)
    // without the flag the stale state rides along (the documented hazard)
    graft.tools.ClimatologyJob.main(Array(store, dir.resolve("out2").toString, "month", "--state", state))
    val stale = spark.read.parquet(dir.resolve("out2").toString).collect().toSet
    // with the flag the day re-aggregates from the store: bit-equal to recompute
    graft.tools.ClimatologyJob.main(Array(
      store, dir.resolve("out3").toString, "month", "--state", state,
      "--refresh-days", "2023-06-16"))
    val got  = spark.read.parquet(dir.resolve("out3").toString).collect().toSet
    val full = Climatology.temporalMean(
      ProductStore.read(spark, store), "time", "value", "month", Seq("target_id", "variable"))
      .collect().toSet
    assert(got === full)
    assert(stale !== full, "without --refresh-days the rewrite must be invisible (the flag's reason to exist)")
    // a --refresh-days day ABSENT from the store (operator typo) must not
    // count as refreshed: the pruned scan writes nothing, so silently
    // reporting it refreshed would mask the typo. It warns and the means
    // still match the recompute.
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
    try
      graft.tools.ClimatologyJob.main(Array(
        store, dir.resolve("out4").toString, "month", "--state", state,
        "--refresh-days", "2023-06-16,2099-01-01"))
    finally System.setErr(oldErr)
    assert(new String(errBuf.toByteArray, "UTF-8").contains("2099-01-01"),
      "absent refresh day must be warned about")
    assert(spark.read.parquet(dir.resolve("out4").toString).collect().toSet === full)
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
