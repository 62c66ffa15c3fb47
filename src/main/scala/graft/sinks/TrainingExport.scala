package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Trainer-facing JSONL export: the corpus as newline-delimited JSON,
  * sharded by TOKEN budget — the file layout data loaders consume
  * (one-JSON-object-per-line, ~equal-token shards so data-parallel
  * readers stream balanced work without an index).
  *
  * Scale shape: shard assignment is [[Packing.prefixSum]] of per-doc
  * token counts in id order (the distributed two-phase prefix sum — no
  * global window, no driver materialization), so the cut points are
  * deterministic on any partitioning and any engine. The write is one
  * shuffle on the shard key; `partitionBy` lays each shard out as its own
  * directory of line files. Rows within a shard are sorted by id inside
  * each task, so re-running the export produces byte-identical shard
  * contents.
  *
  * Token counting is the whitespace form (`size(split)`), matching the
  * packing family; swap in [[graft.operators.BpeTrain.segmentStats]]
  * upstream when budgets must be in trained-tokenizer tokens.
  */
object TrainingExport {

  /** Write `df` as JSONL under `outDir/shard=N/…`, each shard holding
    * ~`tokensPerShard` whitespace tokens (documents are never split: a
    * doc belongs to the shard its running token offset falls in).
    * Every column of `df` lands in the JSON object. Returns the shard
    * count. `compression` (e.g. `Some("gzip")` → `.txt.gz` line files)
    * uses the writer's codec option — loaders stream-decompress, and
    * byte-determinism holds per shard because gzip of identical bytes
    * is identical bytes. */
  def jsonl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      tokensPerShard: Long,
      compression: Option[String] = None): Long = {
    require(tokensPerShard >= 1L, "tokensPerShard must be positive")
    val cols = df.columns
    require(cols.contains(idCol) && cols.contains(textCol),
      s"jsonl export needs '$idCol' and '$textCol' (has: ${cols.mkString(", ")})")
    require(!cols.contains("shard") && !cols.contains("_toks"),
      "input already has a shard/_toks column; rename it before export")

    // null text counts as one token (the slot an empty string occupies) —
    // a null _toks would null the running offset and the doc's shard,
    // sending the row to the default partition instead of a shard
    val counted = df.withColumn("_toks",
      greatest(coalesce(size(split(col(textCol), " ")).cast("long"), lit(1L)), lit(1L)))
    val sharded = Packing
      .prefixSum(counted, idCol, "_toks", outCol = "_off")
      .withColumn("shard", (col("_off") / tokensPerShard).cast("long"))
      .drop("_toks", "_off")

    sharded
      .withColumn("_json", to_json(struct(cols.map(col).toIndexedSeq: _*)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .select(col("shard"), col("_json")) // projection keeps the sort order
      .write.mode("overwrite")
      .options(compression.map("compression" -> _).toMap)
      .partitionBy("shard")
      .text(outDir)

    // count shards from what was actually written — no second pass over the
    // prefix-sum lineage, and an empty input (no shard dirs) returns 0
    // instead of an NPE on a null max
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("shard=") =>
          st.getPath.getName.stripPrefix("shard=").toLong
      }
    if (ids.isEmpty) 0L else ids.max + 1L // max+1: a doc > tokensPerShard skips ids
  }
}
