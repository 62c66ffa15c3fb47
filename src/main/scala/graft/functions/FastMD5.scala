package graft.functions

/** Zero-allocation one-shot MD5 (RFC 1321) for the text kernels.
  *
  * The kernels hash tens of millions of TINY inputs (5-char grams, word
  * shingles) per query; `java.security.MessageDigest` spends more time in
  * allocation, provider indirection, and buffer copies than in the actual
  * rounds at those sizes. This implementation digests a logical
  * concatenation of two byte ranges (seed prefix + content) into a
  * caller-provided 16-byte buffer with no per-call allocation. One instance
  * per kernel invocation — NOT thread-safe, by design.
  *
  * Verified bit-identical to MessageDigest("MD5") over random inputs in
  * FastMD5Spec (including multi-block and empty inputs).
  */
final class FastMD5 {
  private[this] var buf = new Array[Byte](320)
  private[this] val m   = new Array[Int](16)

  /** digest(prefix ++ content) → out(0..15). `prefix` may be empty. */
  def digest(
      prefix: Array[Byte],
      content: Array[Byte],
      off: Int,
      len: Int,
      out: Array[Byte]): Unit = {
    val msgLen = prefix.length + len
    // padded length: msg + 1 (0x80) + zeros + 8 (bit length), multiple of 64
    val padded = ((msgLen + 8) / 64 + 1) * 64
    if (buf.length < padded) buf = new Array[Byte](Integer.highestOneBit(padded) * 2)
    System.arraycopy(prefix, 0, buf, 0, prefix.length)
    System.arraycopy(content, off, buf, prefix.length, len)
    buf(msgLen) = 0x80.toByte
    java.util.Arrays.fill(buf, msgLen + 1, padded - 8, 0.toByte)
    val bitLen = msgLen.toLong * 8
    var i = 0
    while (i < 8) { buf(padded - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte; i += 1 }

    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476

    var block = 0
    while (block < padded) {
      var j = 0
      while (j < 16) {
        val p = block + j * 4
        m(j) = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
          ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
        j += 1
      }
      val a0 = a; val b0 = b; val c0 = c; val d0 = d

      @inline def rot(x: Int, s: Int): Int = (x << s) | (x >>> (32 - s))

      var r = 0
      while (r < 64) {
        var f = 0
        var g = 0
        if (r < 16)      { f = (b & c) | (~b & d);  g = r }
        else if (r < 32) { f = (d & b) | (~d & c);  g = (5 * r + 1) & 15 }
        else if (r < 48) { f = b ^ c ^ d;           g = (3 * r + 5) & 15 }
        else             { f = c ^ (b | ~d);        g = (7 * r) & 15 }
        val tmp = d
        d = c
        c = b
        b = b + rot(a + f + FastMD5.K(r) + m(g), FastMD5.S(r))
        a = tmp
        r += 1
      }
      a += a0; b += b0; c += c0; d += d0
      block += 64
    }

    var w = 0
    while (w < 4) {
      val v = w match { case 0 => a; case 1 => b; case 2 => c; case 3 => d }
      out(w * 4)     = (v & 0xff).toByte
      out(w * 4 + 1) = ((v >>> 8) & 0xff).toByte
      out(w * 4 + 2) = ((v >>> 16) & 0xff).toByte
      out(w * 4 + 3) = ((v >>> 24) & 0xff).toByte
      w += 1
    }
  }
}

object FastMD5 {
  val EmptyPrefix = Array.emptyByteArray

  // K(i) = floor(2^32 * |sin(i+1)|), S = per-round left-rotate amounts
  private[functions] val K: Array[Int] = Array.tabulate(64) { i =>
    ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xffffffffL).toInt
  }
  private[functions] val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
}
