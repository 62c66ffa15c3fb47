package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-output fingerprinting (SURVEY A12,
  * `tools/zarrChecksum/checksum.py:145-189`).
  *
  * The reference fingerprints an entire store by hashing every file, sorting
  * by key, and folding the hashes into a single digest — an order-sensitive
  * reduce used to compare runs. Here: md5 per row, deterministic sort by the
  * order column, md5 over the concatenation.
  *
  * Scale note: the rows shrink to 32-byte digests before the final
  * single-reducer fold; at 100 TB the fold runs hierarchically (md5 per
  * partition-sorted block, then fold the block digests) — the per-block
  * variant is `blockChecksums`.
  */
object Checksum {

  /** One-row DataFrame: (n_rows, checksum) over the whole input. */
  def merkle(df: DataFrame, orderCol: String, rowHash: Column): DataFrame = {
    df.select(col(orderCol).as("_k"), rowHash.as("_h"))
      .agg(
        count(lit(1)).as("n_rows"),
        md5(
          array_join(
            transform(array_sort(collect_list(struct(col("_k"), col("_h")))), x => x("_h")),
            "").cast("binary")).as("checksum"))
  }

  /** Per-block digests for hierarchical folding at scale. */
  def blockChecksums(df: DataFrame, blockCol: Column, orderCol: String, rowHash: Column): DataFrame =
    df.select(blockCol.as("block"), col(orderCol).as("_k"), rowHash.as("_h"))
      .groupBy(col("block"))
      .agg(
        count(lit(1)).as("n_rows"),
        md5(
          array_join(
            transform(array_sort(collect_list(struct(col("_k"), col("_h")))), x => x("_h")),
            "").cast("binary")).as("checksum"))
}
