package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{CompactDsirModel, CompactLmModel}

/** Single-pass per-row reference-LM scoring against a bounded
  * [[CompactLmModel]] — the streaming/per-row face of
  * [[graft.operators.LmScore.scoreAgainst]]. One byte scan over the text
  * builds consecutive word bigrams as string slices and accumulates the
  * five integer stats (`n_bigrams`, `n_oov`, `sum_c`, `sum_ctx`,
  * `surprisal_q`) with the exact relational semantics: pruned/unseen
  * grams count c = 0, contexts outside the kept set count C = 0, and the
  * quantizer is the same bit-length log₂ (`64 − nlz(x)` ≡
  * `length(bin(x))`). With a lossless compact model the array is
  * bit-identical to the relational columns (LmScoreSpec). The model rides
  * into generated code as a reference object, so the expression stays
  * inside whole-stage codegen. */
object LmKernelFns {

  private def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** → [n_bigrams, n_oov, sum_c, sum_ctx, surprisal_q]; zeros for null or
    * <2-word text. */
  def stats(text: UTF8String, model: CompactLmModel): ArrayData = {
    val out = new Array[Long](5)
    if (text == null) return toArray(out)
    val s = text.toString
    var n = 0L; var oov = 0L; var sumC = 0L; var sumCtx = 0L; var sq = 0L
    var start = 0
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (prevStart >= 0) {
          val g   = s.substring(prevStart, i) // "w1 w2" — the byte-slice gram
          val w1  = s.substring(prevStart, prevEnd)
          val c   = model.grams.getOrElse(g, 0L)
          val cx  = model.ctx.getOrElse(w1, 0L)
          n += 1
          if (c == 0L) oov += 1
          sumC += c
          sumCtx += cx
          sq += bitLen(cx + model.vocab) - bitLen(c + 1L)
        }
        prevStart = start
        prevEnd = i
        start = i + 1
      }
      i += 1
    }
    out(0) = n; out(1) = oov; out(2) = sumC; out(3) = sumCtx; out(4) = sq
    toArray(out)
  }

  private def toArray(a: Array[Long]): ArrayData = new GenericArrayData(a)

  /** Single-pass DSIR weight against a [[CompactDsirModel]] →
    * [n_feats, weight_q]. Features are the token and consecutive-pair
    * byte slices of the text (identical bytes to the relational
    * `WordGrams` features), hashed with [[FastMD5]] to the same 60-bit
    * md5-prefix bucket as `Sampling.hashBucket`; the quantized weight
    * accumulates per occurrence, which equals the relational per-bucket
    * grouping exactly (integer addition commutes). */
  def dsirWeight(text: UTF8String, model: CompactDsirModel): ArrayData = {
    val out = new Array[Long](2)
    if (text == null) return toArray(out)
    val bytes = text.getBytes
    val md5   = new FastMD5
    val dig   = new Array[Byte](16)
    val globalTerm = bitLen(model.rawTotal + model.nBuckets) -
      bitLen(model.targetTotal + model.nBuckets)
    var n = 0L
    var wq = 0L
    def add(off: Int, len: Int): Unit = {
      md5.digest(Array.emptyByteArray, bytes, off, len, dig)
      // first 15 hex chars of the digest as a 60-bit value — bytes 0..6
      // whole, high nibble of byte 7 (== parseLong(hex.take(15), 16))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      v = (v << 4) | ((dig(7) >> 4) & 0xfL)
      val b = (v % model.nBuckets).toInt
      n += 1
      wq += bitLen(model.targetCounts(b) + 1L) - bitLen(model.rawCounts(b) + 1L) + globalTerm
    }
    // token bounds scan (split-on-0x20 semantics, empty tokens included)
    var start = 0
    var prevStart = -1
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        add(start, i - start)                          // unigram
        if (prevStart >= 0) add(prevStart, i - prevStart) // bigram slice "w1 w2"
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    out(0) = n; out(1) = wq
    toArray(out)
  }
}

/** `lmScoreStats(text, model)` → array<long>
  * [n_bigrams, n_oov, sum_c, sum_ctx, surprisal_q].
  *
  * The model rides a Spark BROADCAST, not the expression tree: an
  * embedded 10⁵-entry map would re-serialize with every stage's task
  * binary (micro-batch streaming pays it per trigger — measured ~4×
  * ingest-gate slowdown); the broadcast handle is bytes-small and the
  * model ships once per executor. */
case class LmScoreStats(
    child: Expression,
    model: org.apache.spark.broadcast.Broadcast[CompactLmModel]) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    LmKernelFns.stats(child.eval(input).asInstanceOf[UTF8String], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c        = child.genCode(ctx)
    val bcClass  = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bcRef    = ctx.addReferenceObj("lmModelBc", model, bcClass)
    val mClass   = classOf[CompactLmModel].getName
    // resolve the broadcast once per partition, not per row
    val local    = ctx.addMutableState(mClass, "lmModel",
      v => s"$v = ($mClass) $bcRef.value();")
    val kernel   = LmKernelFns.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.stats(${c.isNull} ? null : ${c.value}, $local);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object LmScoreStats {
  def apply(text: Column, model: CompactLmModel): Column = {
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(model)
    GraftSqlBridge.column(new LmScoreStats(
      GraftSqlBridge.expression(text.cast("string")), bc))
  }
}

/** `dsirWeight(text, model)` → array<long> [n_feats, weight_q]. Model via
  * broadcast — see [[LmScoreStats]]. */
case class DsirWeight(
    child: Expression,
    model: org.apache.spark.broadcast.Broadcast[CompactDsirModel]) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    LmKernelFns.dsirWeight(child.eval(input).asInstanceOf[UTF8String], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c        = child.genCode(ctx)
    val bcClass  = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bcRef    = ctx.addReferenceObj("dsirModelBc", model, bcClass)
    val mClass   = classOf[CompactDsirModel].getName
    val local    = ctx.addMutableState(mClass, "dsirModel",
      v => s"$v = ($mClass) $bcRef.value();")
    val kernel   = LmKernelFns.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.dsirWeight(${c.isNull} ? null : ${c.value}, $local);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object DsirWeight {
  def apply(text: Column, model: CompactDsirModel): Column = {
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(model)
    GraftSqlBridge.column(new DsirWeight(
      GraftSqlBridge.expression(text.cast("string")), bc))
  }
}
