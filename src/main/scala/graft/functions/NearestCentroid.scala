package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Argmin-centroid assignment over a static codebook (SURVEY north-star
  * similarity search — the IVF coarse quantizer's hot loop).
  *
  * Assigning 10⁹ embeddings to k centroids is a pure map: the codebook is
  * broadcast-sized by construction (k ≤ a few thousand), so its flattened
  * coordinates ride into generated code as a reference object and each row
  * runs one tight k×dim squared-L2 scan — no join, no shuffle, no
  * per-element lambda interpretation (the same reasoning as DotProduct /
  * NearestIndex). Ties keep the first (lowest) centroid index; vectors
  * shorter than `dim` are padded with zeros by the min() bound; null
  * vectors yield null. */
case class NearestCentroid(vec: Expression, flat: Array[Double], k: Int, dim: Int)
    extends Expression {

  override def children: Seq[Expression] = Seq(vec)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else NearestCentroidKernel.assign(v.asInstanceOf[ArrayData], flat, k, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a       = vec.genCode(ctx)
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    val kernel  = NearestCentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${a.code}
      boolean ${ev.isNull} = ${a.isNull};
      int ${ev.value} = -1;
      if (!${ev.isNull}) {
        ${ev.value} = $kernel.assign(${a.value}, $flatRef, $k, $dim);
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vec = c(0))
}

object NearestCentroidKernel {
  /** Index of the centroid minimizing squared L2 distance; first wins ties. */
  def assign(v: ArrayData, flat: Array[Double], k: Int, dim: Int): Int = {
    val n     = math.min(v.numElements(), dim)
    var best  = 0
    var bestD = Double.PositiveInfinity
    var c     = 0
    while (c < k) {
      val off = c * dim
      var d   = 0.0
      var i   = 0
      while (i < n) {
        val diff = v.getDouble(i) - flat(off + i)
        d += diff * diff
        i += 1
      }
      // missing tail dims count as zero-vs-centroid distance
      while (i < dim) { d += flat(off + i) * flat(off + i); i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

object NearestCentroid {
  /** Column API: cluster index of `vec` against the codebook. */
  def apply(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "empty codebook")
    val dim  = centroids.head.length
    val flat = new Array[Double](centroids.length * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      require(c.length == dim, "ragged codebook")
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    GraftSqlBridge.column(new NearestCentroid(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      flat, centroids.length, dim))
  }
}
