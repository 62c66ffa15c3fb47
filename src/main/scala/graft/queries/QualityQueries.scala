package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{LmScore, Sampling}

/** Reference-LM / importance-weighting quality gates over `documents`
  * ([[graft.operators.LmScore]]). Gated surfaces are integer-exact
  * (bit-length log₂ quantization) per the oracle-portability law; the
  * true double scores are spec-gated and dropped here.
  */
object QualityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** CCNet-style reference-LM familiarity: bigram model trained on the
    * even md5 half of the corpus, scoring the odd half. */
  private val q76: Q = (s, dir) =>
    LmScore
      .referenceLmStats(
        Tables.documents(s, dir),
        "doc_id",
        "text",
        trainPred = Sampling.hashBucket(col("doc_id"), 2) === 0)
      .drop("avg_logprob")
      .orderBy(col("doc_id"))

  private val q76Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i,
      |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 2 AS b
      |  FROM documents),
      |tr AS (SELECT * FROM toks WHERE b = 0),
      |sc AS (SELECT * FROM toks WHERE b = 1),
      |tbg AS (
      |  SELECT a.w AS w1, a.w || ' ' || b.w AS g
      |  FROM tr a JOIN tr b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |bc AS (SELECT g, count(*) AS c FROM tbg GROUP BY 1),
      |cx AS (SELECT w1, count(*) AS cx FROM tbg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM tr),
      |sbg AS (
      |  SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS g
      |  FROM sc a JOIN sc b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |j AS (
      |  SELECT s.doc_id, coalesce(bc.c, 0) AS c0, coalesce(cx.cx, 0) AS cx0, v.v
      |  FROM sbg s LEFT JOIN bc USING (g) LEFT JOIN cx ON s.w1 = cx.w1 CROSS JOIN v),
      |a AS (
      |  SELECT doc_id,
      |    count(*) AS n_bigrams,
      |    sum(CASE WHEN c0 = 0 THEN 1 ELSE 0 END) AS n_oov,
      |    sum(c0) AS sum_c,
      |    sum(cx0) AS sum_ctx,
      |    sum(length(bin(cx0 + v)) - length(bin(c0 + 1))) AS surprisal_q
      |  FROM j GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
      |  CAST(coalesce(sum_c, 0) AS BIGINT) AS sum_c,
      |  CAST(coalesce(sum_ctx, 0) AS BIGINT) AS sum_ctx,
      |  CAST(coalesce(surprisal_q, 0) AS BIGINT) AS surprisal_q
      |FROM (SELECT DISTINCT doc_id FROM sc) d LEFT JOIN a USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** DSIR importance weights: target = src0..src3, hashed unigram+bigram
    * features in 4096 buckets, keep at quantized weight ≥ 12 (≈ the
    * corpus median — a real selection, not a pass-through). */
  private val q77: Q = (s, dir) =>
    LmScore
      .dsirWeights(
        Tables.documents(s, dir),
        "doc_id",
        "text",
        targetPred = col("source").isin("src0", "src1", "src2", "src3"),
        nBuckets = 4096,
        keepAbove = 12L)
      .drop("log_weight")
      .orderBy(col("doc_id"))

  private val q77Sql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |bg AS (
      |  SELECT a.doc_id, a.source, a.w || ' ' || b.w AS feat
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |feats AS (
      |  SELECT doc_id, source, w AS feat FROM toks
      |  UNION ALL SELECT doc_id, source, feat FROM bg),
      |fb AS (
      |  SELECT doc_id, source IN ('src0','src1','src2','src3') AS t,
      |         ('0x' || substr(md5(feat), 1, 15))::BIGINT % 4096 AS bkt
      |  FROM feats),
      |tc AS (SELECT bkt, count(*) AS ct FROM fb WHERE t GROUP BY 1),
      |rc AS (SELECT bkt, count(*) AS cr FROM fb WHERE NOT t GROUP BY 1),
      |tt AS (SELECT CAST(sum(ct) AS BIGINT) AS tot_t FROM tc),
      |rt AS (SELECT CAST(sum(cr) AS BIGINT) AS tot_r FROM rc),
      |d AS (SELECT doc_id, bkt, count(*) AS n FROM fb WHERE NOT t GROUP BY 1, 2),
      |w AS (
      |  SELECT d.doc_id,
      |    CAST(sum(d.n) AS BIGINT) AS n_feats,
      |    CAST(sum(d.n * (length(bin(coalesce(tc.ct, 0) + 1)) - length(bin(coalesce(rc.cr, 0) + 1))))
      |      + sum(d.n) * any_value(length(bin(rt.tot_r + 4096)) - length(bin(tt.tot_t + 4096))) AS BIGINT) AS weight_q
      |  FROM d LEFT JOIN tc USING (bkt) LEFT JOIN rc USING (bkt)
      |    CROSS JOIN tt CROSS JOIN rt
      |  GROUP BY d.doc_id)
      |SELECT doc_id, n_feats, weight_q, weight_q >= 12 AS keep
      |FROM w ORDER BY doc_id""".stripMargin

  /** CCNet head/middle/tail tertiles over the q76 model's quantized
    * milli-bits-per-bigram score (discrete cut law: smallest score with
    * 3·cum ≥ i·n). */
  private val q81: Q = (s, dir) =>
    graft.operators.LmScore
      .ccnetBuckets(
        Tables.documents(s, dir),
        "doc_id",
        "text",
        trainPred = Sampling.hashBucket(col("doc_id"), 2) === 0)
      .orderBy(col("doc_id"))

  private val q81Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i,
      |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 2 AS b
      |  FROM documents),
      |tr AS (SELECT * FROM toks WHERE b = 0),
      |sc AS (SELECT * FROM toks WHERE b = 1),
      |tbg AS (
      |  SELECT a.w AS w1, a.w || ' ' || b.w AS g
      |  FROM tr a JOIN tr b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |bc AS (SELECT g, count(*) AS c FROM tbg GROUP BY 1),
      |cx AS (SELECT w1, count(*) AS cx FROM tbg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM tr),
      |sbg AS (
      |  SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS g
      |  FROM sc a JOIN sc b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |j AS (
      |  SELECT s.doc_id, coalesce(bc.c, 0) AS c0, coalesce(cx.cx, 0) AS cx0, v.v
      |  FROM sbg s LEFT JOIN bc USING (g) LEFT JOIN cx ON s.w1 = cx.w1 CROSS JOIN v),
      |a AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    sum(length(bin(cx0 + v)) - length(bin(c0 + 1))) AS surprisal_q
      |  FROM j GROUP BY doc_id),
      |scored AS (
      |  SELECT doc_id,
      |    CAST((1000 * surprisal_q) // n_bigrams AS BIGINT) AS score_milli
      |  FROM a WHERE n_bigrams > 0),
      |hist AS (SELECT score_milli, count(*) AS c FROM scored GROUP BY 1),
      |cum AS (
      |  SELECT score_milli, SUM(c) OVER (ORDER BY score_milli) AS cum,
      |    (SELECT SUM(c) FROM hist) AS n
      |  FROM hist),
      |cuts AS (
      |  SELECT
      |    MIN(CASE WHEN cum * 3 >= n THEN score_milli END) AS cut1,
      |    MIN(CASE WHEN cum * 3 >= 2 * n THEN score_milli END) AS cut2
      |  FROM cum)
      |SELECT s.doc_id, s.score_milli,
      |  CASE WHEN s.score_milli <= cuts.cut1 THEN 'head'
      |       WHEN s.score_milli <= cuts.cut2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM scored s CROSS JOIN cuts
      |ORDER BY s.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q76_reference_lm" -> q76,
    "q77_dsir_weight"  -> q77,
    "q81_ccnet_buckets" -> q81
  )

  val oracles: Map[String, String] = Map(
    "q76_reference_lm" -> q76Sql,
    "q77_dsir_weight"  -> q77Sql,
    "q81_ccnet_buckets" -> q81Sql
  )
}
