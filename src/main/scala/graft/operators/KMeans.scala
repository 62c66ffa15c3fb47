package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NearestCentroid

/** Distributed Lloyd's k-means over an embedding column — the trained
  * coarse quantizer for IVF-style similarity search (SURVEY north-star;
  * the scale path next to Similarity's hash-bucketed variants).
  *
  * Shape per iteration: assignment is a pure map (the codegen
  * [[graft.functions.NearestCentroid]] scan — no join, the corpus never
  * shuffles), and the centroid update shuffles only (cluster, dim, partial
  * sum) triples after map-side combine — k×dim rows reach the driver, never
  * vectors. Initialization is deterministic (first k distinct vectors in
  * `orderCol` order), so training is reproducible across partitionings.
  */
object KMeans {

  /** Train k centroids; returns the codebook. `df` must carry `vecCol`
    * (array<double>) and an ordering column for deterministic init. */
  def fit(
      df: DataFrame,
      vecCol: String,
      orderCol: String,
      k: Int,
      iters: Int = 5): Array[Array[Double]] = {
    val vecs = df.select(col(orderCol).as("_ord"), col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
    var centroids: Array[Array[Double]] =
      vecs.orderBy(col("_ord")).limit(k).collect().map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "kmeans: no vectors to fit")
    var it = 0
    while (it < iters) {
      val assigned = vecs.withColumn("_c", NearestCentroid(col("_v"), centroids))
      // decimal-exact sums: double partial aggregation is summation-order
      // dependent (ulp drift across partitionings would make training
      // non-reproducible); decimal addition is exact, so the mean is
      // bit-identical under any partitioning (14 fractional digits ≫ any
      // quantizer's needs)
      val sums = assigned
        .select(col("_c"), posexplode(col("_v")).as(Seq("_d", "_x")))
        .groupBy(col("_c"), col("_d"))
        .agg(
          sum(col("_x").cast("decimal(24,14)")).cast("double").as("_s"),
          count(lit(1)).as("_n"))
        .collect()
      val dim  = centroids.head.length
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        val n = r.getLong(3)
        if (n > 0 && d < dim) next(c)(d) = r.getDouble(2) / n
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Attach the cluster index of `vecCol` as `bucketCol` — one generated
    * map over the corpus. */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]], bucketCol: String = "bucket"): DataFrame =
    df.withColumn(bucketCol, NearestCentroid(col(vecCol).cast("array<double>"), centroids))
}
