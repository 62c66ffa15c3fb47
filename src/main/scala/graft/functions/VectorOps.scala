package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two double-array columns.
  *
  * `zip_with` + `aggregate` higher-order functions evaluate their lambdas
  * interpretively per element; for 64-dim embeddings scored millions of
  * times (SURVEY north-star similarity search) that interpreter overhead
  * dominates. This expression is a tight generated loop over `ArrayData`
  * (and a matching interpreted `eval`), accumulating left-to-right in
  * double — bit-identical to the higher-order form and to the DuckDB
  * oracle's `list_reduce(list_transform(...))` fold.
  */
case class DotProduct(left: Expression, right: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    DotProductKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a      = left.genCode(ctx)
    val b      = right.genCode(ctx)
    val kernel = DotProductKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      boolean ${ev.isNull} = ${a.isNull} || ${b.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = $kernel.dot(${a.value}, ${b.value});
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(left = c(0), right = c(1))
}

object DotProductKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object DotProduct {
  /** Column API over array<double> inputs. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(new DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))
}
