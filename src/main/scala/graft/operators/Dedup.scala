package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `keepFirst` reproduces the reference's keep-first dedup-on-append
  * semantics (`sam_extract/writers/ZarrWriter.py:355-378`) with an explicit
  * order column — Spark has no implicit row order, so "first" must be
  * defined by data (SURVEY §7.4 hard part 2).
  *
  * `exactByHash` is content-addressed exact dedup for document pipelines:
  * group by a hash of the normalized content, keep the lowest id. The
  * hash-groupBy shuffles only (hash, id) pairs, not the documents themselves,
  * and the final semi-join prunes columns until the last moment — the shape
  * that scales to 100 TB of text.
  */
object Dedup {

  /** Keep the first row per key, "first" = smallest `orderCol`. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact content dedup: canonical row per distinct `contentHash`, choosing
    * the smallest `idCol`. Returns the full surviving rows. */
  def exactByHash(df: DataFrame, contentHash: Column, idCol: String): DataFrame = {
    val hashed = df.withColumn("_h", contentHash)
    val w      = Window.partitionBy(col("_h")).orderBy(col(idCol))
    hashed.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn", "_h")
  }

  /** Normalized text hash used for exact document dedup: lowercase, collapse
    * whitespace runs, md5. Matches DuckDB
    * `md5(regexp_replace(lower(text), '\s+', ' ', 'g'))`. */
  def normalizedTextHash(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  /** Duplicate-group stats: one row per distinct content hash with its
    * canonical (minimum) id and copy count. */
  def exactStats(df: DataFrame, contentHash: Column, idCol: String): DataFrame =
    df.groupBy(contentHash.as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Connected components over an undirected pair list (the near-dup
    * CLUSTERING step: pair-finding emits edges; dedup needs one canonical
    * doc per transitive cluster). Iterative min-label propagation:
    * comp(v) ← min(comp(v), min over neighbors) until fixpoint — each round
    * is one shuffle join + one aggregate over the PAIR GRAPH only (vertices
    * = docs appearing in ≥1 pair, a sliver of the corpus), with an eager
    * localCheckpoint per round so lineage stays flat. Converges in
    * O(cluster diameter) rounds — near-dup clusters are dense, so a handful
    * in practice; a graph that fails to converge within `maxIter` throws
    * rather than silently mis-clustering (raise maxIter, or switch to a
    * star-contraction algorithm if clusters are genuinely chain-shaped).
    *
    * Returns (id, comp) where comp is the smallest doc id in the cluster —
    * the canonical selection (keep comp, drop the rest) falls out directly. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    // materialize the DIRECTED pairs before mirroring: the undirected
    // self-union would otherwise run the full upstream pair-finding plan
    // twice (exchange reuse does not reliably collapse the two union
    // branches), and the loop must not re-run it per round either
    val p0 = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint()
    val edges = p0
      .unionByName(p0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges
      .select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
    var it   = 0
    var done = false
    while (!done && it < maxIter) {
      // convergence detection rides the checkpoint materialization as an
      // accumulator (one Spark job per round, not two); retries can
      // over-count, which only matters as zero/nonzero
      val changedAcc = spark.sparkContext.longAccumulator(s"graft_cc_changed_$it")
      val track = udf { shrunk: Boolean => { if (shrunk) changedAcc.add(1L); true } }
        .asNondeterministic()
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("_nc")), "dst")
        .groupBy(col("src"))
        .agg(min(col("_nc")).as("_nbr"))
        .withColumnRenamed("src", "id")
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("_nbr"), col("comp"))).as("_new"),
          col("comp").as("_old"))
        .filter(track(col("_new") < col("_old")))
        .select(col("id"), col("_new").as("comp"))
        .localCheckpoint()
      labels = next
      done = changedAcc.value == 0
      it += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — cluster diameter " +
          "exceeds the bound; raise maxIter")
    labels
  }

  /** Streaming exact dedup: content-addressed first-occurrence-wins over a
    * watermarked stream. A later arrival whose hash matches anything seen
    * within the watermark horizon is dropped; the engine evicts hash state
    * older than the watermark, which is the only bounded-state exact-dedup
    * contract possible on an infinite stream (an unbounded seen-set is the
    * batch operator, [[exactByHash]], run over the closed corpus). Pure
    * stateful-operator composition — no custom state, no extra shuffle
    * beyond the dedup's own hash exchange. */
  def streamingExactByHash(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      contentHash: Column): DataFrame =
    df.withColumn("_h", contentHash)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")
}
