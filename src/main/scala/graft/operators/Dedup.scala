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
    val rn = "__graft_dedup_rn"
    require(!df.columns.contains(rn), s"input already has a '$rn' column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Exact content dedup: canonical row per distinct `contentHash`, choosing
    * the smallest `idCol`. Returns the full surviving rows. */
  def exactByHash(df: DataFrame, contentHash: Column, idCol: String): DataFrame = {
    val (h, rn) = ("__graft_dedup_h", "__graft_dedup_rn")
    require(!df.columns.contains(h) && !df.columns.contains(rn),
      s"input already has a '$h' / '$rn' column")
    val hashed = df.withColumn(h, contentHash)
    val w      = Window.partitionBy(col(h)).orderBy(col(idCol))
    hashed.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn, h)
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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Connected components over an undirected pair list (the near-dup
    * CLUSTERING step: pair-finding emits edges; dedup needs one canonical
    * doc per transitive cluster). Iterative min-label propagation:
    * comp(v) ← min(comp(v), min over neighbors) until fixpoint — each round
    * is one shuffle join + one aggregate over the PAIR GRAPH only (vertices
    * = docs appearing in ≥1 pair, a sliver of the corpus), with an eager
    * localCheckpoint per round so lineage stays flat (each round's blocks
    * are freed once the next round materializes — nothing accumulates in
    * executor storage across rounds or invocations). Converges in
    * O(cluster diameter) rounds — near-dup clusters are dense, so a handful
    * in practice; a graph that fails to converge within `maxIter` rounds
    * (genuinely chain-shaped clusters) falls back to
    * [[connectedComponentsStar]], whose round count is logarithmic in the
    * diameter, rather than failing or silently mis-clustering.
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
    Checkpoints.free(p0) // edges materialized; the directed blocks are dead
    // round 1 fused into the init: comp₀(v) = min(v, min neighbor) is
    // exactly one propagation step from comp = id, computed as ONE
    // map-side-combined aggregate over the mirrored edges — this replaces
    // both the vertex-distinct aggregate AND the first join round (every
    // vertex appears as src in the mirrored edge list), so dense near-dup
    // clusters (diameter ≤ 2) converge after a single loop iteration.
    var labels = edges
      .groupBy(col("src"))
      .agg(min(col("dst")).as("_mn"))
      .select(col("src").as("id"), least(col("src"), col("_mn")).as("comp"))
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
      Checkpoints.free(labels) // no-op on round 0 (labels is edge-derived)
      labels = next
      done = changedAcc.value == 0
      it += 1
    }
    if (!done) {
      // O(diameter) propagation lost to a chain-shaped graph — rerun with
      // the O(log diameter) algorithm instead of giving up (the dense-
      // cluster common case never gets here, so propagation stays the
      // cheaper default: one join+aggregate per round vs star's four)
      log.warn(
        s"connectedComponents: label propagation did not converge in $maxIter rounds " +
          "(chain-shaped clusters); falling back to alternating star contraction")
      Checkpoints.free(labels)
      val out = connectedComponentsStar(edges, "src", "dst")
      Checkpoints.free(edges)
      return out
    }
    Checkpoints.free(edges) // labels is checkpointed — independent of edges
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the chain-diameter-proof variant: round count is
    * logarithmic in the component diameter on ANY topology, where
    * min-label propagation is linear. Each round rewrites the edge set —
    * large-star hangs every node's larger neighbors off its minimum
    * neighbor, small-star its smaller ones — preserving connectivity until
    * the edges form stars centered on each component's minimum id.
    * Per round: two (groupBy + join) phases plus one exact convergence
    * probe (a union of stars iff no edge's low endpoint has a smaller
    * neighbor — checked against the per-node minima the phase already
    * computed, never against a fallible checksum). Same output contract as
    * [[connectedComponents]]: (id, comp), comp = smallest id in the
    * cluster, one row per id appearing in `pairs`. */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 60): DataFrame = {
    val p0 = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint()
    var e = p0
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    def und(ed: DataFrame) = ed
      .select(col("u").as("x"), col("v").as("y"))
      .unionByName(ed.select(col("v").as("x"), col("u").as("y")))
    // m(x) = min(x, min neighbor of x)
    def mins(u: DataFrame) = u
      .groupBy(col("x"))
      .agg(min(col("y")).as("_mn"))
      .select(col("x"), least(col("x"), col("_mn")).as("m"))
    var it        = 0
    var converged = false
    while (!converged && it < maxIter) {
      val u1 = und(e)
      val m1 = mins(u1)
      converged = e
        .join(m1.select(col("x").as("u"), col("m").as("_mu")), "u")
        .filter(col("_mu") < col("u"))
        .isEmpty
      if (!converged) {
        // large-star: (m(x), y) for neighbors y > x, plus (m(x), x) so x
        // itself stays attached — every emitted edge is within-component,
        // and each original edge x–y survives via m(x)
        val ls = u1
          .join(m1, "x")
          .filter(col("y") > col("x"))
          .select(col("m").as("u"), col("y").as("v"))
          .unionByName(
            m1.filter(col("m") =!= col("x")).select(col("m").as("u"), col("x").as("v")))
          .distinct()
          .localCheckpoint()
        Checkpoints.free(e)
        // small-star: (m(x), y) for neighbors y < x (m(x) ≤ y by
        // minimality), plus the same self-attachment
        val u2 = und(ls)
        val m2 = mins(u2)
        val ss = u2
          .join(m2, "x")
          .filter(col("y") < col("x") && col("m") =!= col("y"))
          .select(col("m").as("u"), col("y").as("v"))
          .unionByName(
            m2.filter(col("m") =!= col("x")).select(col("m").as("u"), col("x").as("v")))
          .distinct()
          .localCheckpoint()
        Checkpoints.free(ls)
        e = ss
      }
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — at O(log diameter) " +
          "per round this graph is beyond any physical component; raise maxIter")
    // e is now a union of stars: every node's minimum neighbor IS its
    // component minimum; nodes only in degenerate self-pairs label themselves
    val stars = und(e)
      .groupBy(col("x"))
      .agg(min(col("y")).as("_mn"))
      .select(col("x").as("id"), least(col("x"), col("_mn")).as("comp"))
    val verts = p0.select(col("u").as("id")).unionByName(p0.select(col("v").as("id"))).distinct()
    val out = verts
      .join(stars, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .localCheckpoint()
    Checkpoints.free(e)
    Checkpoints.free(p0)
    out
  }

  /** Quality-aware canonical selection over near-dup clusters — the
    * RefinedWeb-style refinement of keep-first: cluster the pair graph
    * ([[connectedComponents]]), then keep each cluster's HIGHEST-scoring
    * member (ties → lowest id), instead of blindly keeping the lowest id.
    * Returns one row per cluster: `(cluster, n_members, keep_id,
    * best_score)`; callers semi-join `keep_id` to compact the corpus.
    *
    * Scale shape: clustering is the O(diameter) label propagation over
    * pair participants only; the argmax is ONE map-side-combined
    * aggregate over (comp, id, score) rows — the lexicographic
    * struct-max trick, no per-cluster window/sort, so a million-member
    * degenerate cluster still reduces distributed.
    *
    * Score contract: scores compare as IEEE doubles (integral scores
    * beyond 2^53 may collapse under the cast; use a pre-scaled double
    * if you need finer resolution up there). A NULL score ranks BELOW
    * every non-null score — a null-scored member can only win a cluster
    * whose members are all null-scored (ties then fall to lowest id). */
  def keepBestInCluster(
      pairs: DataFrame, // (aCol, bCol) near-dup pair graph
      aCol: String,
      bCol: String,
      scores: DataFrame, // (idCol, scoreCol) — must cover every pair member
      idCol: String,
      scoreCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    // struct-MIN over (-score, id): smallest negated score = highest score,
    // ties fall to the smallest id under the struct's natural ascending
    // order — no negation of the id, so string/any orderable ids work.
    // NULL scores coalesce to -Inf BEFORE the negation: a bare -NULL is
    // NULL, and struct-min sorts a NULL field FIRST, which would let one
    // null-scored member beat every real score in its cluster.
    val best = min(struct(
      (-coalesce(col(scoreCol).cast("double"), lit(Double.NegativeInfinity))).as("ns"),
      col("id").as("kid"),
      col(scoreCol).as("s")))
    comps
      .join(scores.select(col(idCol).as("id"), col(scoreCol)), Seq("id"))
      .groupBy(col("comp").as("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        best.getField("kid").as("keep_id"),
        best.getField("s").as("best_score"))
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
      contentHash: Column): DataFrame = {
    // an internal working column must not silently clobber caller data
    val h = "__graft_dedup_h"
    require(!df.columns.contains(h), s"input already has a '$h' column")
    df.withColumn(h, contentHash)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(h)
      .drop(h)
  }

  /** Incremental ingest dedup: flag each incoming row whose content hash
    * already exists in the corpus-hash index. Output is EXACT (the bloom
    * never decides membership, it only prunes the join).
    *
    * The 100 TB shape: a daily ingest batch joined directly against a
    * corpus-scale hash index shuffles the whole index every day. Instead a
    * Bloom filter of the index (mergeable aggregate — built map-side in one
    * pass, byte size fixed by `expectedCorpusItems`/`fpp`, NOT by data
    * volume) is broadcast to the ingest side; rows that MISS the bloom are
    * definitively new and never reach the join, so only true dups + an fpp
    * share of new rows join — and that maybe-hit sliver is typically
    * broadcast-able against the bucketed index at ingest scale. Sizing: ~1.2
    * bytes/item at fpp 0.01, so 10⁹ corpus hashes ≈ 1.2 GB of filter — at
    * larger index cardinalities raise `fpp` (the join stays exact, only the
    * prune weakens) or shard the index by hash prefix and run one
    * incremental pass per shard. The membership probe is a broadcast-closure
    * filter (not codegen) — one hash probe per row against in-memory bits,
    * never the hot cost next to the md5 itself.
    *
    * `corpusHashes` must be the single-column hash index (`hashCol`);
    * `contentHash` computes the same hash on `incoming` (use
    * [[normalizedTextHash]] on both sides). Returns all incoming rows with
    * an `is_dup` flag.
    *
    * `incoming` may be a STREAMING frame: every piece is streaming-native
    * (narrow filters, a stream-static left join, a union), so the same
    * operator is the ingest-queue dedup gate with no separate
    * implementation — the bloom and the index snapshot are fixed at query
    * start (restart the stream to pick up a grown corpus), and the bloom
    * prefilter is what keeps each micro-batch from paying a corpus-scale
    * join probe per trigger (pinned by StreamingIncrementalDedupSpec). */
  def incrementalByHash(
      incoming: DataFrame,
      corpusHashes: DataFrame,
      hashCol: String,
      contentHash: Column,
      expectedCorpusItems: Long,
      fpp: Double = 0.01): DataFrame =
    incrementalByHash(incoming, corpusHashes, hashCol, contentHash,
      corpusHashes.stat.bloomFilter(hashCol, expectedCorpusItems, fpp))

  /** [[incrementalByHash]] with a PREBUILT bloom (e.g. [[readBloomIndex]]):
    * the nightly-ingest shape where the filter is a standing artifact
    * maintained next to the corpus index instead of being rebuilt from a
    * full index scan per run. The flag stays exact regardless of the
    * bloom's age ONLY for hashes the bloom covers; a bloom STALER than
    * `corpusHashes` can miss recently-indexed hashes, so keep the
    * artifact in step with the index it prunes for (write both in the
    * same job; spec-pinned). */
  def incrementalByHash(
      incoming: DataFrame,
      corpusHashes: DataFrame,
      hashCol: String,
      contentHash: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val h = "__graft_dedup_h"
    require(!incoming.columns.contains(h), s"input already has a '$h' column")
    require(!incoming.columns.contains("is_dup"), "input already has an 'is_dup' column")
    val spark = incoming.sparkSession
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bloomB.value.mightContainString(s))
    val hashed = incoming.withColumn(h, contentHash)
    val maybe  = hashed.filter(mightContain(col(h)))
    val fresh  = hashed.filter(!mightContain(col(h))).withColumn("is_dup", lit(false))
    val index  = corpusHashes.select(col(hashCol).as(h)).distinct()
      .withColumn("__graft_hit", lit(true))
    val flagged = maybe
      .join(index, Seq(h), "left")
      .withColumn("is_dup", coalesce(col("__graft_hit"), lit(false)))
      .drop("__graft_hit")
    flagged.unionByName(fresh).drop(h)
  }

  /** Build and persist the corpus bloom index as a standing artifact
    * (Spark's `BloomFilter` wire format, any Hadoop-visible path). One
    * full index scan here buys every later ingest run its prefilter for
    * the cost of an open+read — at 10⁹ hashes the artifact is ~1.2 GB
    * (fpp 0.01), read once per run, broadcast once per cluster. */
  def writeBloomIndex(
      corpusHashes: DataFrame,
      hashCol: String,
      path: String,
      expectedItems: Long,
      fpp: Double = 0.01): Unit = {
    val bloom = corpusHashes.stat.bloomFilter(hashCol, expectedItems, fpp)
    val conf  = corpusHashes.sparkSession.sessionState.newHadoopConf()
    val p     = new org.apache.hadoop.fs.Path(path)
    val out   = p.getFileSystem(conf).create(p, true)
    try bloom.writeTo(out) finally out.close()
  }

  /** Read a [[writeBloomIndex]] artifact back for [[incrementalByHash]]. */
  def readBloomIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.util.sketch.BloomFilter = {
    val conf = spark.sessionState.newHadoopConf()
    val p    = new org.apache.hadoop.fs.Path(path)
    val in   = p.getFileSystem(conf).open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }
}
