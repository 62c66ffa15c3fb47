package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a document corpus (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units") — the tokenizer-training stage of a training-data
  * pipeline.
  *
  * Scale contract: the CORPUS-sized work is exactly one hash aggregate —
  * the word-frequency table (map-side combined, only (word, count) rows
  * shuffle). The merge loop then runs on the driver over that BOUNDED
  * dictionary (|distinct words| entries — vocabulary-sized, the same
  * driver-side contract as KMeans' k×dim centroid collect), which is how
  * production BPE trainers work too: merges are learned from word counts,
  * never by re-scanning the corpus per merge. 100 TB of text with a 10⁶
  * word vocabulary trains in one corpus pass + a driver loop.
  *
  * Determinism: merge selection is (weight desc, pair lexicographic asc) —
  * a total order, so the learned merge table is identical on any
  * partitioning and any engine. No end-of-word marker is appended (the
  * single-space corpus has no intra-word spaces to disambiguate);
  * documented so the segmentation contract is explicit.
  */
object BpeTrain {

  /** Per-task cap on the segmentStats word→piece-count memo. 64k distinct
    * words ≈ a few MB of strings — vocabulary-sized, not data-sized. */
  val SegmentMemoCap = 1 << 16

  /** One learned merge: rank order, the two joined symbols, and the
    * weighted pair count that won the rank. */
  final case class Merge(rank: Int, left: String, right: String, weight: Long)

  /** Learn up to `numMerges` merges from the corpus' word-frequency
    * table. Stops early when no adjacent pair remains. */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val wordCounts: Array[(String, Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // symbol sequences, mutable per word
    val words = wordCounts.map { case (w, n) => (w.toCharArray.map(_.toString), n) }
    val merges = Seq.newBuilder[Merge]
    var syms = words.map(_._1)
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val n = words(wi)._2
        var i = 0
        while (i + 1 < s.length) {
          counts.merge((s(i), s(i + 1)), n, (a, b) => a + b)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && Ordering[(String, String)].lt(p, best._1))) best = (p, n)
        }
        val ((a, b), n) = best
        merges += Merge(rank, a, b, n)
        // merge all non-overlapping occurrences left-to-right in every word
        syms = syms.map { s =>
          if (s.length < 2) s
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
              else { out += s(i); i += 1 }
            }
            out.toArray
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (rank, left, right, weight) —
    * the `queries()` surface (iterative training is not SQL-expressible,
    * so the driver records the rows-only check; the merge semantics are
    * pinned by the hand-computed Sennrich-example spec). */
  def trainMergesDF(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, textCol, numMerges).toDF().orderBy(col("rank"))
  }

  /** Segment one word with a learned merge table (rank-greedy: repeatedly
    * apply the lowest-rank merge present — the standard BPE encoder). */
  def segmentWord(word: String, rankOf: Map[(String, String), Int]): Array[String] = {
    var s: Array[String] = word.toCharArray.map(_.toString)
    var continue = s.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < s.length) {
        rankOf.get((s(i), s(i + 1))).foreach(r => if (r < bestRank) bestRank = r)
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && rankOf.get((s(j), s(j + 1))).contains(bestRank)) {
            out += s(j) + s(j + 1); j += 2
          } else { out += s(j); j += 1 }
        }
        s = out.toArray
        continue = s.length >= 2
      }
    }
    s
  }

  /** Per-document piece counts under a learned merge table: the trained
    * counterpart of `TextAnalysis.bpeTokenStats`'s regex approximation.
    * The merge table broadcasts (vocabulary-sized); segmentation is a pure
    * per-row pass, zero shuffle. A per-task memo caches each distinct
    * word's piece count, so segmentation cost is vocabulary-sized per
    * task (the word-level memoization production encoders use) while the
    * corpus itself never shuffles for a join-back. The memo is
    * LRU-bounded ([[SegmentMemoCap]] entries): web text's word
    * distribution is Zipfian, so the hot head stays cached while a
    * pathological high-cardinality partition degrades to recomputation
    * instead of growing the map without bound. */
  def segmentStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge],
      memoCap: Int = SegmentMemoCap): DataFrame = {
    require(memoCap >= 1, "memoCap must be positive")
    val spark = df.sparkSession
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(rankOf)
    val nPieces = udf(new (String => Long) with Serializable {
      @transient private lazy val memo =
        new java.util.LinkedHashMap[String, Long](1024, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[String, Long]): Boolean =
            size() > memoCap
        }
      def apply(text: String): Long =
        if (text == null) 0L
        else {
          var total = 0L
          text.split(" ", -1).foreach { w =>
            if (w.nonEmpty) {
              var n = memo.getOrDefault(w, -1L)
              if (n < 0L) { n = segmentWord(w, bc.value).length.toLong; memo.put(w, n) }
              total += n
            }
          }
          total
        }
    })
    df.select(col(idCol), nPieces(col(textCol)).as("n_pieces"))
  }

  /** Train-then-encode in one call: learn `numMerges` merges from the
    * corpus' own word-frequency table, then segment every document with
    * them — the end-to-end "how many tokens does MY tokenizer see in MY
    * corpus" budget counter (one corpus aggregate + one stateless pass).
    */
  def trainAndSegmentStats(df: DataFrame, idCol: String, textCol: String, numMerges: Int): DataFrame =
    segmentStats(df, idCol, textCol, trainMerges(df, textCol, numMerges))
}
