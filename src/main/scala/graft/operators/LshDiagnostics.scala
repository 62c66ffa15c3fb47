package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Degenerate-corpus guard for the LSH dedup family.
  *
  * Any banded-LSH bucketing goes quadratic inside a bucket: a corpus with a
  * massive exact-duplicate cluster (or bands sized too narrow for the corpus
  * — see [[TextAnalysis.sizedSimHashBands]]) produces a bucket whose pair
  * explosion dominates the job. That failure is silent — the plan is the
  * same, it just runs for hours at 100 TB.
  *
  * This guard makes it loud WITHOUT adding a pass: an `observe` node
  * (CollectMetrics) on the bucket aggregate computes max/oversized-count as
  * the rows stream by, and a session-registered [[QueryExecutionListener]]
  * logs a warning (with the standard remediation: exact-dedup first, widen
  * the bands) when the threshold trips. Zero extra shuffles, zero extra
  * actions; the metrics ride the action the caller already runs.
  */
object LshDiagnostics {

  private val log     = org.slf4j.LoggerFactory.getLogger(getClass)
  private val nameSeq = new AtomicInteger(0)
  private val Prefix  = "graft_lsh_buckets"

  /** Last warning emitted, for tests and interactive diagnosis. */
  @volatile var lastWarning: Option[String] = None

  /** Sessions that already carry the listener (guarded by `registered`). */
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Attach bucket-size metrics to `buckets` (one row per LSH bucket,
    * `sizeCol` = occupant count). The returned frame is the same rows; the
    * listener fires after whatever action the caller runs. */
  def observeBucketStats(
      buckets: DataFrame,
      sizeCol: Column,
      threshold: Long,
      opName: String): DataFrame = {
    ensureListener(buckets.sparkSession)
    buckets.observe(
      s"${Prefix}_${opName}_${nameSeq.incrementAndGet()}",
      max(sizeCol.cast("long")).as("max_bucket"),
      sum(when(sizeCol.cast("long") > threshold, 1L).otherwise(0L)).as("n_oversized"),
      first(lit(threshold)).as("threshold"),
      first(lit(opName)).as("op"))
  }

  /** Max-tracking accumulator (LongAccumulator only sums). */
  private class MaxAcc extends org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long] {
    private var _max                 = Long.MinValue
    override def isZero: Boolean     = _max == Long.MinValue
    override def copy(): MaxAcc      = { val c = new MaxAcc; c._max = _max; c }
    override def reset(): Unit       = _max = Long.MinValue
    override def add(v: java.lang.Long): Unit = if (v != null && v > _max) _max = v
    override def merge(o: org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long]): Unit =
      o match { case m: MaxAcc => if (m._max > _max) _max = m._max }
    override def value: java.lang.Long = _max
  }

  private case class Guard(
      op: String,
      cap: Long,
      nHot: org.apache.spark.util.LongAccumulator,
      maxDf: MaxAcc)

  /** One guard per (session, opName), created on first use and REUSED by
    * every later plan for that operator: guard count is bounded by the
    * number of distinct operator names, not by how many plans a long-lived
    * session builds (the former unbounded-queue shape registered two fresh
    * accumulators per plan construction, executed or not). Weak session
    * keys let closed sessions drop their guards. Known, documented limit:
    * the sweep below still reads a session's guards on EVERY completed
    * query, so with concurrent queries in one session a warning can
    * attribute to the wrong query — diagnostics-only (emitted pairs stay
    * exact), and accepted over threading plan identity through `observe`,
    * which AQE deletes in exactly the degenerate case this guard polices. */
  private val guards =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, Guard]]()

  private def guardFor(spark: SparkSession, opName: String, cap: Long): Guard = {
    val perSession = guards.synchronized {
      var m = guards.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Guard]()
        guards.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(opName, { _ =>
      val nHot  = spark.sparkContext.longAccumulator(s"graft_postings_hot_$opName")
      val maxDf = new MaxAcc
      spark.sparkContext.register(maxDf, s"graft_postings_maxdf_$opName")
      Guard(opName, cap, nHot, maxDf)
    })
  }

  /** Hot-shingle guard for postings candidate generation (one input row per
    * shingle bucket, `sizeCol` = document frequency). The postings failure
    * mode is the INVERSE of LSH's: over-cap shingles are dropped from
    * candidate generation, so work stays bounded but pairs whose entire
    * overlap is capped boilerplate silently disappear.
    *
    * Returns an always-true predicate — apply it as its OWN `.filter(...)`
    * immediately upstream of the df-cap filter. It counts hot buckets into
    * accumulators as the bucket stream evaluates, and the session listener
    * warns after the caller's action. Accumulators (not an `observe` node)
    * because AQE's empty-relation propagation removes CollectMetrics
    * subtrees exactly in the all-dropped degenerate case this guard exists
    * for; accumulator values survive plan replacement. The predicate is
    * marked nondeterministic so Catalyst neither reorders it behind the cap
    * filter (it must see EVERY bucket) nor pushes it below the aggregate.
    * Task retries can over-count — harmless for a fires-when-nonzero
    * warning. Zero extra passes, zero extra shuffles. */
  def postingsCapGuard(
      spark: SparkSession,
      sizeCol: Column,
      maxDocFreq: Long,
      opName: String): Column = {
    ensureListener(spark)
    val g             = guardFor(spark, opName, maxDocFreq)
    val (nHot, maxDf) = (g.nHot, g.maxDf)
    val probe = udf { df: java.lang.Long =>
      if (df != null) {
        maxDf.add(df)
        if (df > maxDocFreq) nHot.add(1L)
      }
      true
    }
    probe.asNondeterministic()(sizeCol.cast("long"))
  }

  private def ensureListener(spark: SparkSession): Unit =
    registered.synchronized {
      if (registered.add(spark)) spark.listenerManager.register(Listener)
    }

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      // postings-cap guards: accumulator-backed, so they survive AQE plan
      // replacement; sweep-and-reset THIS session's guards after every
      // completed query (guards are per-session — see `guards`)
      val sessionGuards = guards.synchronized(Option(guards.get(qe.sparkSession)))
      sessionGuards.foreach(_.values.forEach { g =>
        val n = g.nHot.value
        if (n > 0) {
          val msg =
            s"${g.op}: $n shingle bucket(s) above maxDocFreq=${g.cap} (largest df: " +
              s"${g.maxDf.value}) were excluded from candidate generation. Work stays " +
              "bounded, but pairs whose ENTIRE overlap is such boilerplate are silently " +
              "missed (emitted pairs remain exact). If these are genuine duplicate " +
              "clusters, run exact dedup (Dedup.exactStats / keep-first) first or raise " +
              "maxDocFreq."
          lastWarning = Some(msg)
          log.warn(msg)
          g.nHot.reset()
          g.maxDf.reset()
        }
      })
      qe.observedMetrics.foreach {
        case (name, row) if name.startsWith(Prefix) =>
          def num(i: Int): Long =
            if (row.isNullAt(i)) 0L else row.get(i).asInstanceOf[Number].longValue()
          val maxBucket = num(0)
          val oversized = num(1)
          val threshold = num(2)
          val op        = row.getString(3)
          if (oversized > 0) {
            val msg =
              s"$op: $oversized LSH bucket(s) exceed $threshold docs (largest: $maxBucket). " +
                "Pair generation is quadratic inside a bucket — a degenerate corpus " +
                "(massive exact-duplicate clusters) or under-sized bands. Run exact " +
                "dedup (Dedup.exactStats / keep-first) BEFORE near-dup LSH, and size " +
                "bands to the corpus (band bits >= log2(n_docs); see " +
                "TextAnalysis.sizedSimHashBands)."
            lastWarning = Some(msg)
            log.warn(msg)
          }
        case _ => ()
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }
}
