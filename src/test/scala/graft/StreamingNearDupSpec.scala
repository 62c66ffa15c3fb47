package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.streaming.StreamingNearDup

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming near-dup flags within-watermark bucket collisions across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingNearDup.candidates(
      ms.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "text", "ts",
      watermarkMs = 10 * 60 * 1000L, minEstJaccard = 0.5)
    val q = out.writeStream.outputMode("append").format("memory").queryName("snd").start()
    try {
      ms.addData((1L, ts("2024-01-01 00:00:00"), base))
      q.processAllAvailable()
      // an exact copy one minute later, in a separate micro-batch
      ms.addData((2L, ts("2024-01-01 00:01:00"), base))
      q.processAllAvailable()
      val pairs = spark.table("snd")
        .select("doc_a", "doc_b", "est_jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // identical text → every minhash component equal → estimate exactly 1
      assert(pairs === Array((1L, 2L, 1.0)))

      // advance the watermark far past doc 1/2 (unrelated doc, +2 h), then
      // a third copy: the bucket state has expired, no stale pair emerges
      ms.addData((50L, ts("2024-01-01 02:00:00"), (1 to 20).map(i => s"z$i").mkString(" ")))
      q.processAllAvailable()
      ms.addData((3L, ts("2024-01-01 02:01:00"), base))
      q.processAllAvailable()
      val after = spark.table("snd")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(after === Array((1L, 2L))) // nothing involving doc 3
    } finally q.stop()
  }

  test("streamed estimate equals the batch signature estimate for a near-dup pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = (1 to 20).map(i => if (i == 10) "patched" else s"w$i").mkString(" ") // one mid-word differs
    // batch oracle: same banding helper on a static frame, estimate =
    // equal-component fraction of the two signatures
    val static = Seq((1L, ts("2024-01-01 00:00:00"), a), (2L, ts("2024-01-01 00:01:00"), b))
      .toDF("doc_id", "ts", "text")
    val sigs = StreamingNearDup
      .banded(static, "doc_id", "text", "ts", shingleLen = 3, numHashes = 8, rowsPerBand = 2)
      .collect().groupBy(_.doc_id).map { case (id, rows) => id -> rows.head.sig }
    val expectedEst =
      sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 8
    val sharedBands = StreamingNearDup
      .banded(static, "doc_id", "text", "ts", 3, 8, 2)
      .collect().groupBy(_.band_key).values.count(_.map(_.doc_id).distinct.length == 2)
    assert(sharedBands > 0, "test texts must collide in at least one band")

    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingNearDup.candidates(
      ms.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "text", "ts", minEstJaccard = 0.0)
    val q = out.writeStream.outputMode("append").format("memory").queryName("snd2").start()
    try {
      ms.addData((1L, ts("2024-01-01 00:00:00"), a))
      ms.addData((2L, ts("2024-01-01 00:01:00"), b))
      q.processAllAvailable()
      val got = spark.table("snd2")
        .select("doc_a", "doc_b", "est_jaccard", "band_key")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      // one row per shared band, all carrying the same estimate
      assert(got.length === sharedBands)
      assert(got.forall(t => t._1 == 1L && t._2 == 2L && t._3 == expectedEst))
    } finally q.stop()
  }

  test("per-bucket state cap bounds retained entries; arrivals still compare against held state (r10 verdict)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, ts("2024-01-01 00:00:00"), base),
      (2L, ts("2024-01-01 00:01:00"), base),
      (3L, ts("2024-01-01 00:02:00"), base))

    def run(cap: Int, name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[(Long, Timestamp, String)]
      val out = StreamingNearDup.candidates(
        ms.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        minEstJaccard = 0.5, maxBucket = cap)
      val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        ms.addData(docs: _*)
        q.processAllAvailable()
        spark.table(name).select("doc_a", "doc_b").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }

    // uncapped-equivalent: every pair among the three identical docs
    assert(run(1000, "snd_cap_off") === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap 1: doc 1 is the only retained entry, so 2 and 3 each pair with 1
    // (flags keep flowing at cap) but the (2,3) pair — which needs doc 2 in
    // state past the cap — is gone, and state is bounded at one entry
    assert(run(1, "snd_cap_on") === Set((1L, 2L), (1L, 3L)))

    // the gate's flag stage at cap 1: later copies still flag as hits
    val ms2 = MemoryStream[(Long, Timestamp, String)]
    val flagged = StreamingNearDup.flagBands(
      ms2.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", maxBucket = 1)
    val q2 = flagged.writeStream.outputMode("append").format("memory").queryName("snd_cap_flag").start()
    try {
      ms2.addData(docs: _*)
      q2.processAllAvailable()
      val hits = graft.streaming.CorpusIngest.mergeBandFlags(spark.table("snd_cap_flag"))
        .select("doc_id", "near_dup_hit")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(hits === Map(1L -> false, 2L -> true, 3L -> true))
    } finally q2.stop()
    // the streaming gate defaults the cap ON, mirroring the batch job layer
    assert(graft.streaming.CorpusIngest.NearDup("ts").maxBucket === StreamingNearDup.DefaultMaxBucket)
  }

  test("short documents (fewer words than a shingle) never enter buckets") {
    val static = Seq((1L, ts("2024-01-01 00:00:00"), "only two")).toDF("doc_id", "ts", "text")
    assert(StreamingNearDup.banded(static, "doc_id", "text", "ts", 3, 8, 2).count() === 0)
  }

  test("bucket state runs on the RocksDB state store (the disk-backed production backend)") {
    // the default HDFS-backed provider keeps every bucket's state on the
    // executor heap — at corpus-scale streaming the RocksDB provider is
    // the configuration that survives, so the stateful operators must
    // work (and flag across batches) under it
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = (1 to 20).map(i => s"w$i").mkString(" ")
      val ms = MemoryStream[(Long, Timestamp, String)]
      val out = StreamingNearDup.flagBands(
        ms.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        watermarkMs = 10 * 60 * 1000L, minEstJaccard = 0.5)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("snd_rocks").start()
      try {
        ms.addData((1L, ts("2024-01-01 00:00:00"), base))
        q.processAllAvailable()
        ms.addData((2L, ts("2024-01-01 00:01:00"), base)) // cross-batch dup
        q.processAllAvailable()
        val flags = spark.table("snd_rocks")
          .select($"doc_id", $"near_dup_hit").distinct()
          .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
        assert(flags === Set((1L, false), (2L, true)))
        // the provider actually in force is RocksDB, not a silent fallback
        val op = q.lastProgress.stateOperators
        assert(op.nonEmpty && op(0).customMetrics.keySet.toString.contains("rocksdb"),
          s"no rocksdb metrics in ${op.map(_.customMetrics).mkString}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("LSH bucket state survives a query restart: a near-dup of a pre-restart doc still flags") {
    // the production failure mode this pins: a multi-day ingest query dies
    // and restarts from its checkpoint — the flatMapGroupsWithState bucket
    // state MUST recover from the state store, or every near-dup whose
    // original arrived before the crash silently passes the gate.
    // MemoryStream cannot recover, so this uses the parquet file source +
    // a durable checkpoint, with foreachBatch as the restart-safe sink.
    val in   = java.nio.file.Files.createTempDirectory("snd-restart-in")
    val ckpt = java.nio.file.Files.createTempDirectory("snd-restart-ckpt").toString
    val base    = (1 to 20).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 20).map(i => if (i == 10) "patched" else s"w$i").mkString(" ")
    val fresh   = (1 to 20).map(i => s"other$i").mkString(" ")

    def writeBatch(name: String, rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text").coalesce(1)
        .write.parquet(in.resolve(name).toString)
    // the file source watches one dir; nested dirs via glob keep each
    // batch's files atomic-ish for the test
    val schema = Seq.empty[(Long, Timestamp, String)].toDF("doc_id", "ts", "text").schema

    val flags = new scala.collection.mutable.ArrayBuffer[(Long, Boolean)]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(in.toString + "/*")
      val out = StreamingNearDup.flagBands(
        stream, "doc_id", "text", "ts",
        watermarkMs = 10 * 60 * 1000L, minEstJaccard = 0.5)
      val q = out.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("doc_id", "near_dup_hit").collect()
          flags.synchronized { flags ++= rows.map(r => (r.getLong(0), r.getBoolean(1))) }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    writeBatch("b1", Seq((1L, ts("2024-01-01 00:00:00"), base)))
    runOnce() // doc 1 enters the bucket state, then the query dies
    writeBatch("b2", Seq(
      (2L, ts("2024-01-01 00:01:00"), nearDup),
      (3L, ts("2024-01-01 00:01:00"), fresh)))
    runOnce() // restart from the checkpoint — state must be back

    val merged = flags.groupBy(_._1).view.mapValues(_.exists(_._2)).toMap
    assert(merged === Map(1L -> false, 2L -> true, 3L -> false),
      s"state did not survive the restart: $merged")
  }
}
