package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate join — the signature-free member of
  * the dedup family (vs [[MinHashLSH]]'s approximate minhash candidates and
  * [[TextAnalysis.simHashNearDup]]'s hamming buckets).
  *
  * Candidate pairs come from an inverted shingle index (postings): two
  * documents are candidates iff they share at least one shingle whose
  * document frequency is ≤ `maxDocFreq`. Every candidate is then verified
  * with the single-pass [[graft.functions.JaccardShingles]] kernel over the
  * pair's full texts, so reported Jaccard is EXACT — no probabilistic
  * recall loss from band geometry at any threshold.
  *
  * Scale design (the postings / prefix-filter family, cf. PPJoin): distinct
  * (doc, shingle) rows shuffle once to build postings; buckets larger than
  * `maxDocFreq` are dropped from candidate generation because a shingle
  * shared by thousands of documents is stopword-like boilerplate — it
  * contributes candidate pairs quadratically while adding at most 1 to any
  * pair's intersection. Verification still scans the FULL shingle sets (the
  * kernel recomputes them from the texts), so the cap's only effect is
  * dropping pairs whose entire overlap is capped boilerplate — the
  * documented contract, mirrored exactly by the SQL oracle. Candidates are
  * tiny by the near-dup premise and broadcast through two hash joins
  * exactly as in [[MinHashLSH.nearDuplicates]].
  */
object SetSimilarity {

  /** Near-duplicate (doc_a, doc_b, n_common, jaccard) pairs with exact
    * n-gram Jaccard ≥ `minJaccard`, candidates from df-capped postings. */
  def ngramJaccardNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minJaccard: Double = 0.5,
      maxDocFreq: Int = 100): DataFrame = {
    require(maxDocFreq >= 2, "maxDocFreq < 2 can never produce a candidate pair")
    val sh = MinHashLSH.shingles(df, idCol, textCol, shingleLen)
    val buckets = sh
      .groupBy(col("shingle"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")).between(2, maxDocFreq))
    val cand = buckets
      .select(explode(MinHashLSH.inBucketPairs(col("ids"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    MinHashLSH.verifyJaccardKernel(df, idCol, textCol, cand, shingleLen, minJaccard)
  }
}
