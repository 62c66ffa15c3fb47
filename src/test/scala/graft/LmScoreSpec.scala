package graft

import org.apache.spark.sql.functions._
import graft.operators.LmScore

/** [[graft.operators.LmScore]] — reference-LM familiarity stats and DSIR
  * importance weights: hand-computed integer surfaces, the quantized-vs-
  * true log consistency bound, ordering semantics, and partitioning
  * determinism. The oracle gate (q76/q77) covers the corpus-scale runs.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val ln2 = math.log(2.0)

  test("referenceLmStats: hand-computed bigram model on a 4-doc corpus") {
    // train (id <= 2): "a b a b", "b a"  →  counts: "a b"->2, "b a"->2,
    // contexts: a->2, b->2, vocab V = 2
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "b a"),
      (3L, "a b c"), // scored: "a b" seen (c=2), "b c" oov
      (4L, "z")      // scored: single token — zero stats, null score
    ).toDF("doc_id", "text")

    val got = LmScore
      .referenceLmStats(docs, "doc_id", "text", trainPred = $"doc_id" <= 2)
      .orderBy($"doc_id")
      .collect()

    assert(got.length === 2)
    val r3 = got(0)
    assert(r3.getLong(0) === 3L)
    assert(r3.getLong(1) === 2L) // n_bigrams
    assert(r3.getLong(2) === 1L) // n_oov ("b c")
    assert(r3.getLong(3) === 2L) // sum_c
    assert(r3.getLong(4) === 4L) // sum_ctx (ctx(a)=2 + ctx(b)=2)
    // surprisal_q: bitlen(2+2)-bitlen(2+1) + bitlen(2+2)-bitlen(0+1)
    //            = (3-2) + (3-1) = 3
    assert(r3.getLong(5) === 3L)
    // true score: (ln(3/4) + ln(1/4)) / 2
    val want = (math.log(3.0 / 4.0) + math.log(1.0 / 4.0)) / 2.0
    assert(math.abs(r3.getDouble(6) - want) < 1e-12)

    val r4 = got(1)
    assert(r4.getLong(0) === 4L)
    assert((1 to 5).map(r4.getLong) === Seq(0L, 0L, 0L, 0L, 0L))
    assert(r4.isNullAt(6)) // avg_logprob null for <2-word docs
  }

  test("referenceLmStats: surprisal_q tracks the true log within 1 bit per bigram") {
    // bitlen(x) = floor(log2 x)+1, so each bigram's quantized surprisal is
    // within ±1 of log2(1/p) — the bound that makes weight_q a usable
    // score, not just a hash-portable token
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = LmScore
      .referenceLmStats(docs, "doc_id", "text",
        trainPred = graft.operators.Sampling.hashBucket(col("doc_id"), 2) === 0)
      .filter($"n_bigrams" > 0)
      .select($"n_bigrams", $"surprisal_q", $"avg_logprob")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n         = r.getLong(0)
      val q         = r.getLong(1).toDouble
      val trueBits  = -r.getDouble(2) * n / ln2 // Σ log2(1/p)
      assert(math.abs(q - trueBits) <= n.toDouble,
        s"quantized surprisal $q vs true $trueBits over $n bigrams")
    }
  }

  test("dsirWeights: target-like raw docs outrank unrelated ones, quantized and true agree in sign") {
    val target = (1L to 6L).map(i => (i, s"alpha beta gamma delta alpha beta", "t"))
    val rawLike   = (10L, "alpha beta gamma delta", "r") // target vocabulary
    val rawUnlike = (11L, "omega psi chi phi", "r")      // disjoint vocabulary
    val docs = (target :+ rawLike :+ rawUnlike).toDF("doc_id", "text", "grp")

    val got = LmScore
      .dsirWeights(docs, "doc_id", "text", targetPred = $"grp" === "t",
        nBuckets = 64, keepAbove = 0L)
      .orderBy($"doc_id")
      .collect()

    assert(got.map(_.getLong(0)).toSeq === Seq(10L, 11L))
    val (likeQ, unlikeQ) = (got(0).getLong(2), got(1).getLong(2))
    val (likeW, unlikeW) = (got(0).getDouble(4), got(1).getDouble(4))
    assert(likeQ > unlikeQ, s"quantized: $likeQ <= $unlikeQ")
    assert(likeW > unlikeW, s"true: $likeW <= $unlikeW")
    assert(got(0).getBoolean(3) && !got(1).getBoolean(3)) // keepAbove=0 splits them
    // quantized weight tracks the true log2 weight within ~2 bits/feature
    // (each of the four bitlens in a term quantizes within 1 bit)
    got.foreach { r =>
      val n = r.getLong(1).toDouble
      assert(math.abs(r.getLong(2).toDouble - r.getDouble(4) / ln2) <= 4 * n)
    }
  }

  test("lossless compact model + kernel reproduce the relational scores bit for bit") {
    val docs  = Tables.documents(spark, "/root/testdata/sf0.001")
    val split = graft.operators.Sampling.hashBucket(col("doc_id"), 2) === 0
    val model = LmScore.bigramModel(docs.filter(split), "text")
    // maxGrams far above the corpus's distinct-gram count → lossless
    val compact = LmScore.compactModel(model, maxGrams = 1000000)
    val relational = LmScore.scoreAgainst(model, docs.filter(!split), "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"n_oov", $"sum_c", $"sum_ctx", $"surprisal_q")
    val kernel = docs.filter(!split)
      .select($"doc_id", graft.functions.LmScoreStats($"text", compact).as("s"))
      .select($"doc_id",
        $"s".getItem(0).as("n_bigrams"), $"s".getItem(1).as("n_oov"),
        $"s".getItem(2).as("sum_c"), $"s".getItem(3).as("sum_ctx"),
        $"s".getItem(4).as("surprisal_q"))
    assert(relational.count() > 0)
    assert(relational.exceptAll(kernel).isEmpty && kernel.exceptAll(relational).isEmpty)
  }

  test("pruned compact model: dropped grams score as unseen, kept grams keep full counts") {
    val train = Seq(
      (1L, "a b a b a b"), // "a b" ×3, "b a" ×2
      (2L, "c d")          // "c d" ×1
    ).toDF("doc_id", "text")
    val model   = LmScore.bigramModel(train, "text")
    val compact = LmScore.compactModel(model, maxGrams = 1) // keeps only "a b" (count 3)
    assert(compact.grams === Map("a b" -> 3L))
    assert(compact.ctx === Map("a" -> 3L)) // full C(a), only kept w1s
    assert(compact.vocab === 4L)
    // "a b" known (c=3, C(a)=3, V=4): bits = bitlen(7) - bitlen(4) = 0
    // "b a" pruned (c=0, C(b) absent -> 0): bits = bitlen(4) - bitlen(1) = 2
    val got = Seq((9L, "a b a")).toDF("doc_id", "text")
      .select(graft.functions.LmScoreStats($"text", compact).as("s"))
      .select($"s".getItem(0), $"s".getItem(1), $"s".getItem(2), $"s".getItem(3), $"s".getItem(4))
      .collect()(0)
    assert((0 to 4).map(got.getLong) === Seq(2L, 1L, 3L, 3L, 2L))
  }

  test("compact DSIR model + kernel reproduce the relational quantized weights bit for bit") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pred = col("source").isin("src0", "src1", "src2", "src3")
    val model = LmScore.compactDsirModel(docs, "doc_id", "text", pred, nBuckets = 512)
    val relational = LmScore.dsirWeights(docs, "doc_id", "text", pred, nBuckets = 512)
      .select($"doc_id", $"n_feats", $"weight_q")
    val kernel = docs.filter(!pred)
      .select($"doc_id", graft.functions.DsirWeight($"text", model).as("s"))
      .select($"doc_id", $"s".getItem(0).as("n_feats"), $"s".getItem(1).as("weight_q"))
    assert(relational.count() > 0)
    assert(relational.exceptAll(kernel).isEmpty && kernel.exceptAll(relational).isEmpty)
  }

  test("ccnetBuckets: ordered tertiles, minimal-prefix cut law, full coverage") {
    val docs  = Tables.documents(spark, "/root/testdata/sf0.001")
    val split = graft.operators.Sampling.hashBucket(col("doc_id"), 2) === 0
    val got = graft.operators.LmScore.ccnetBuckets(docs, "doc_id", "text", split)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = got.length
    assert(n > 100)
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // buckets are score-ordered: head ≤ middle ≤ tail
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // minimal-prefix law: head holds ≥ n/3 docs, but removing its top
    // score group drops it below n/3 (ties never split a score group)
    val headN = byBucket("head").length
    val topGroup = byBucket("head").count(_ == byBucket("head").max)
    assert(3 * headN >= n && 3 * (headN - topGroup) < n)
  }

  test("dsirWeights and referenceLmStats are invariant under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pred = col("source").isin("src0", "src1", "src2", "src3")

    val a = LmScore.dsirWeights(docs, "doc_id", "text", pred, nBuckets = 512)
      .select($"doc_id", $"n_feats", $"weight_q", $"keep")
    val b = LmScore.dsirWeights(docs.repartition(7), "doc_id", "text", pred, nBuckets = 512)
      .select($"doc_id", $"n_feats", $"weight_q", $"keep")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    val split = graft.operators.Sampling.hashBucket(col("doc_id"), 2) === 0
    val c = LmScore.referenceLmStats(docs, "doc_id", "text", split).drop("avg_logprob")
    val d = LmScore.referenceLmStats(docs.repartition(5), "doc_id", "text", split)
      .drop("avg_logprob")
    assert(c.exceptAll(d).isEmpty && d.exceptAll(c).isEmpty)
  }

  test("dsirWeights: model joins broadcast (bounded bucket tables never shuffle the corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = LmScore
      .dsirWeights(docs, "doc_id", "text", col("source") === "src0", nBuckets = 256)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected broadcast model+totals joins, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus-side shuffle join crept into the score path")
  }
}
