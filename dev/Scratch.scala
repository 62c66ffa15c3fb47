package graft

import org.apache.spark.sql.functions._

/** Dev scratch timing harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs  = graft.Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n  = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    // driver-side kernel microbenchmark
    val texts = docs.select("text").collect().map(r =>
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
    def timeK(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s single-thread")
    }
    timeK("minhash kernel x5000") { texts.foreach(t => graft.functions.TextKernelFns.minhash(t, 3, 8)) }
    timeK("simhash kernel x5000") { texts.foreach(t => graft.functions.TextKernelFns.simhash(t, 32)) }
    timeK("winnow kernel x5000") { texts.foreach(t => graft.functions.TextKernelFns.winnow(t, 5, 4)) }

    import graft.operators.MinHashLSH
    MinHashLSH.signaturesWideKernel(docs, "doc_id", "text").explain("formatted")
    val docsSpread = docs.repartition(32)
    time("kernel signatures plain") {
      MinHashLSH.signaturesWideKernel(docs, "doc_id", "text").count()
    }
    time("kernel signatures spread") {
      MinHashLSH.signaturesWideKernel(docsSpread, "doc_id", "text").count()
    }
    val sig2   = MinHashLSH.signaturesWideKernel(docs, "doc_id", "text")
    val bands2 = MinHashLSH.bandKeys(sig2, "doc_id")
    time("bands") { bands2.count() }
    time("candidates") { MinHashLSH.candidatePairs(bands2, "doc_id").count() }
    locally {
      val cand = MinHashLSH.candidatePairs(bands2, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cand.count()
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val dfCand = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      time("verify only (cand cached)") {
        MinHashLSH.verifyJaccard(cand,
          MinHashLSH.shingles(dfCand, "doc_id", "text", 3), "doc_id", 0.5).count()
      }
      cand.unpersist()
    }
    time("nearDuplicates plain") {
      MinHashLSH.nearDuplicates(docs, "doc_id", "text", minJaccard = 0.5).count()
    }
    time("nearDuplicates spread") {
      MinHashLSH.nearDuplicates(docsSpread, "doc_id", "text", minJaccard = 0.5).count()
    }
    time("winnow spread") {
      graft.operators.TextAnalysis.winnowFingerprints(docsSpread, "doc_id", "text", 5, 4).count()
    }
    time("winnow plain") {
      graft.operators.TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 5, 4).count()
    }
    spark.stop()
  }
}
