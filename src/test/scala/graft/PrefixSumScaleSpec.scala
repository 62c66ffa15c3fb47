package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class PrefixSumScaleSpec extends SparkSpec {
  import spark.implicits._

  test("shuffleRank is row-preserving and dense at multi-partition scale") {
    val n  = 60000L
    val df = spark.range(n).select(col("id").as("doc_id"))
    val out = Sampling.shuffleRank(df, "doc_id", seed = 7L).cache()
    try {
      assert(out.count() === n)
      val stats = out.agg(
        countDistinct(col("shuffle_rank")).as("d"),
        min(col("shuffle_rank")).as("lo"),
        max(col("shuffle_rank")).as("hi"))
        .as[(Long, Long, Long)].head()
      assert(stats === ((n, 0L, n - 1L)))
    } finally { out.unpersist(); () }
  }

  test("packOffsets: exclusive offsets tile the token stream at scale") {
    val n = 50000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      // 1..5 words per doc, deterministic
      concat_ws(" ", sequence(lit(1), (pmod(col("id"), lit(5)) + 1).cast("int"))).as("text"))
    val out = graft.operators.Packing.packOffsets(docs, "doc_id", "text", seqLen = 64).cache()
    try {
      assert(out.count() === n)
      val (nOff, total, maxEnd) = out.agg(
        countDistinct(col("offset")),
        sum(col("n_tokens")),
        max(col("offset") + col("n_tokens")))
        .as[(Long, Long, Long)].head()
      assert(nOff === n)       // offsets all distinct (exclusive prefix)
      assert(maxEnd === total) // the last doc ends exactly at the stream total
    } finally { out.unpersist(); () }
  }

  test("packSequences: windows tile the corpus, docs span boundaries, short tail kept") {
    val d = Seq(
      (1L, "a b c"),       // 3 tokens
      (2L, "d e f g h"),   // spans seq 0 -> 1
      (3L, "i j"),         // ends seq 2 exactly... (3+5+2=10, seqLen 4 -> tail)
      (4L, "k"))           // 11 tokens total -> seqs of 4,4,3
      .toDF("doc_id", "text")
    val got = graft.operators.Packing.packSequences(d, "doc_id", "text", seqLen = 4)
      .orderBy($"seq_idx")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Seq(
      (0L, 4L, 2L, "a b c d"),
      (1L, 4L, 1L, "e f g h"),
      (2L, 3L, 2L, "i j k")))
  }

  test("packSequences: empty-text docs contribute their single empty token in order") {
    // split('') = [''] — one zero-length token, same contract as the oracle
    val d = Seq((1L, "x y"), (2L, ""), (3L, "z")).toDF("doc_id", "text")
    val got = graft.operators.Packing.packSequences(d, "doc_id", "text", seqLen = 10)
      .as[(Long, Long, Long, String)].collect()
    assert(got === Seq((0L, 4L, 3L, "x y  z")))
  }
}
