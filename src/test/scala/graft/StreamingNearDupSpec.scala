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

  test("short documents (fewer words than a shingle) never enter buckets") {
    val static = Seq((1L, ts("2024-01-01 00:00:00"), "only two")).toDF("doc_id", "ts", "text")
    assert(StreamingNearDup.banded(static, "doc_id", "text", "ts", 3, 8, 2).count() === 0)
  }
}
