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

/** Single-pass per-document text kernels.
  *
  * Winnowing and SimHash are embarrassingly per-document, but their
  * relational forms (posexplode every k-gram / token, shuffle into a
  * per-doc window or a 32-sum aggregate) pay two full shuffles of the
  * EXPLODED stream — ~50× the document count. These expressions compute
  * the whole per-document result in one generated-code pass over the
  * UTF-8 bytes, so the only rows that ever move are final fingerprints.
  * Results are bit-identical to the relational forms (same md5-prefix
  * hashes, same packing arithmetic) and to the DuckDB oracle.
  */
object TextKernelFns {

  /** Character (code point) start offsets of a UTF-8 byte array. A char
    * start is any byte not matching 10xxxxxx. */
  private def charStarts(b: Array[Byte]): Array[Int] = {
    val starts = new Array[Int](b.length)
    var n = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xc0) != 0x80) { starts(n) = i; n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(starts, n)
  }

  private def hash32(md: java.security.MessageDigest, b: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    // first 8 hex chars of the digest = first 4 bytes, unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def hash60(md: java.security.MessageDigest, b: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003, robust
    * winnowing): hash every k-gram of the character stream (md5 first-8-hex
    * prefix), slide a window of `w` hashes, keep each complete window's
    * minimum with rightmost-on-ties, dedupe. Returns the distinct selected
    * fingerprints as packed longs `hash * 2^31 + (2^31-1 - pos)`, sorted by
    * position — identical packing to the SQL oracle. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes  = text.getBytes
    val starts = charStarts(bytes)
    val n      = starts.length
    val g      = n - k + 1          // number of k-grams
    if (g < w) return new GenericArrayData(Array.emptyLongArray)
    val md     = java.security.MessageDigest.getInstance("MD5")
    val packed = new Array[Long](g)
    var i = 0
    while (i < g) {
      val off = starts(i)
      val end = if (i + k < n) starts(i + k) else bytes.length
      packed(i) = hash32(md, bytes, off, end - off) * 2147483648L + (2147483647L - i)
      i += 1
    }
    // sliding min over w consecutive hashes; selections dedupe via a set
    val sel = new java.util.HashSet[Long]()
    var t = w - 1
    while (t < g) {
      var m = packed(t)
      var j = t - w + 1
      while (j < t) { if (packed(j) < m) m = packed(j); j += 1 }
      sel.add(m)
      t += 1
    }
    val out = new Array[Long](sel.size)
    val it  = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    // sort by position ascending = packed descending within a hash, but the
    // caller re-sorts; sort ascending for a deterministic array layout
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** SimHash signature over single-space token split (mirrors
    * `string_split(text, ' ')` including empty tokens): per-token 60-bit
    * md5-prefix hash, per-bit majority vote (ties set the bit). Returns
    * `[n_tokens, simhash]`. */
  def simhash(text: UTF8String, bits: Int): ArrayData = {
    val bytes = text.getBytes
    val md    = java.security.MessageDigest.getInstance("MD5")
    val ones  = new Array[Long](bits)
    var nTok  = 0L
    var start = 0
    var i     = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val h = hash60(md, bytes, start, i - start)
        var b = 0
        while (b < bits) { ones(b) += (h >>> b) & 1L; b += 1 }
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b   = 0
    while (b < bits) {
      if (ones(b) * 2 >= nTok) sig |= 1L << b
      b += 1
    }
    new GenericArrayData(Array(nTok, sig))
  }
}

/** `winnow(text, k, w)` as a codegen scalar expression → array<long> of
  * packed fingerprints. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null else TextKernelFns.winnow(t.asInstanceOf[UTF8String], k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c      = child.genCode(ctx)
    val kernel = TextKernelFns.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $kernel.winnow(${c.value}, $k, $w);
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** `simhash(text, bits)` as a codegen scalar expression →
  * array<long> [n_tokens, signature]. */
case class SimHashSig(child: Expression, bits: Int) extends Expression {
  require(bits >= 1 && bits <= 60)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null else TextKernelFns.simhash(t.asInstanceOf[UTF8String], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c      = child.genCode(ctx)
    val kernel = TextKernelFns.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $kernel.simhash(${c.value}, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object WinnowFingerprint {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(new WinnowFingerprint(
      GraftSqlBridge.expression(text.cast("string")), k, w))
}

object SimHashSig {
  def apply(text: Column, bits: Int): Column =
    GraftSqlBridge.column(new SimHashSig(
      GraftSqlBridge.expression(text.cast("string")), bits))
}
