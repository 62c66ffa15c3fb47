package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The batch incremental-dedup operator run unchanged over a streaming
  * ingest: bloom prefilter + stream-static join + union are all
  * streaming-native, so one implementation serves both paths. */
class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalByHash over a micro-batch stream matches the batch flags") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq("alpha beta gamma", "delta epsilon zeta")
      .toDF("text")
      .select(Dedup.normalizedTextHash($"text").as("h"))

    val ms  = MemoryStream[(Long, String)]
    val out = Dedup.incrementalByHash(
      ms.toDF().toDF("doc_id", "text"), corpus, "h",
      Dedup.normalizedTextHash(col("text")), expectedCorpusItems = 100L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("inc_dedup").start()
    try {
      ms.addData((1L, "alpha beta gamma"), (2L, "brand new text"))
      q.processAllAvailable()
      ms.addData((3L, "DELTA  epsilon Zeta")) // dup after normalization, later batch
      q.processAllAvailable()
      val got = spark.table("inc_dedup")
        .select($"doc_id", $"is_dup").orderBy($"doc_id")
        .as[(Long, Boolean)].collect()
      assert(got === Seq((1L, true), (2L, false), (3L, true)))
    } finally q.stop()
  }
}
