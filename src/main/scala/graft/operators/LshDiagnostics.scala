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

  private def ensureListener(spark: SparkSession): Unit =
    registered.synchronized {
      if (registered.add(spark)) spark.listenerManager.register(Listener)
    }

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
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

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }
}
