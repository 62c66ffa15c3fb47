package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FastMD5

/** FastMD5 must be bit-identical to java.security MessageDigest("MD5") —
  * the portability contract of every md5-prefix hash in the text kernels.
  * (Seeded random trials; scalatest+scalacheck bridge not in the offline
  * cache.) */
class FastMD5Spec extends AnyFunSuite {

  private def jdk(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)

  test("matches MessageDigest on fixed vectors (empty, abc, 55/56/64/65-byte boundaries)") {
    val fast = new FastMD5
    val out  = new Array[Byte](16)
    val vectors = Seq(
      Array.emptyByteArray,
      "abc".getBytes("UTF-8"),
      Array.fill(55)('a'.toByte), // last length fitting one padded block
      Array.fill(56)('a'.toByte), // first length forcing a second block
      Array.fill(64)('a'.toByte),
      Array.fill(65)('a'.toByte),
      Array.fill(1000)('x'.toByte))
    vectors.foreach { v =>
      fast.digest(FastMD5.EmptyPrefix, v, 0, v.length, out)
      assert(out.toSeq == jdk(v).toSeq, s"len=${v.length}")
    }
  }

  test("matches MessageDigest on random (prefix, content-slice) pairs") {
    val rnd  = new scala.util.Random(42)
    val fast = new FastMD5
    val out  = new Array[Byte](16)
    (1 to 500).foreach { _ =>
      val prefix = Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte)
      val body   = Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
      val off    = if (body.isEmpty) 0 else rnd.nextInt(body.length)
      val len    = rnd.nextInt(body.length - off + 1)
      fast.digest(prefix, body, off, len, out)
      val expected = jdk(prefix ++ body.slice(off, off + len))
      assert(out.toSeq == expected.toSeq, s"prefix=${prefix.length} off=$off len=$len")
    }
  }

  test("instance buffer reuse does not corrupt successive digests") {
    val fast = new FastMD5
    val out  = new Array[Byte](16)
    val big  = Array.fill(500)('q'.toByte)
    fast.digest(FastMD5.EmptyPrefix, big, 0, big.length, out) // grows buffer
    val small = "hi".getBytes("UTF-8")
    fast.digest(FastMD5.EmptyPrefix, small, 0, small.length, out)
    assert(out.toSeq == jdk(small).toSeq)
  }
}
