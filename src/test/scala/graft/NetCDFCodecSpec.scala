package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.netcdf.NetCDF3
import graft.sources.netcdf.NetCDF3._

/** Property tests for the classic NetCDF codec: header round-trip across
  * all three format versions (CDF-1/2/5), arbitrary dim/var/attribute
  * layouts, and byte-exact data placement (reading a variable's range at
  * its recorded `begin` recovers the written values). */
class NetCDFCodecSpec extends AnyFunSuite {

  // Seeded random trials (scalatest+scalacheck bridge not in the offline
  // cache — same pattern as SessionizePropertySpec)
  private val rng = new scala.util.Random(20260812)
  private def randName(): String = "v" + (1 to (1 + rng.nextInt(11))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
  private val versions = Seq(1, 2, 5)

  private def roundTrip(dims: Seq[Dim], vars: Seq[VarData], gatts: Seq[Att], version: Int): (Header, Array[Byte]) = {
    val os = new ByteArrayOutputStream()
    NetCDF3.write(os, dims, vars, gatts, version)
    val bytes = os.toByteArray
    (NetCDF3.readHeader(new ByteArrayInputStream(bytes)), bytes)
  }

  test("header round-trips across CDF-1/2/5 for arbitrary numeric layouts") {
    for (trial <- 0 until 60) {
      val version = versions(trial % 3)
      val nRows   = 1 + rng.nextInt(40)
      val nInner  = 1 + rng.nextInt(6)
      val vn1     = randName() + "1"
      val vn2     = randName() + "2"
      val samples = Seq.fill(8)(rng.nextDouble() * 2e6 - 1e6)
      locally {
        val dims = Seq(Dim("row", nRows.toLong), Dim("inner", nInner.toLong))
        val d1   = Array.tabulate(nRows)(i => samples(i % samples.length))
        val d2   = Array.tabulate(nRows * nInner)(i => (i * 3 + 1).toFloat)
        val vars = Seq(
          VarData(vn1, NC_DOUBLE, Seq("row"), d1,
            atts = Seq(Att("_FillValue", NC_DOUBLE, Array(-999.0)))),
          VarData(vn2, NC_FLOAT, Seq("row", "inner"), d2))
        val gatts = Seq(Att("title", NC_CHAR, "prop"), Att("n", NC_INT, Array(nRows)))
        val (h, bytes) = roundTrip(dims, vars, gatts, version)
        assert(h.version === version)
        assert(h.dims === dims)
        assert(h.vars.map(_.name) === Seq(vn1, vn2))
        assert(h.gatts.map(_.name) === Seq("title", "n"))
        assert(fillValue(h.variable(vn1).get) === Some(-999.0))
        assert(h.shape(h.variable(vn2).get) === Seq(nRows.toLong, nInner.toLong))
        // data placement: decode v1's doubles straight from its begin offset
        val v1  = h.variable(vn1).get
        // slice() rebases: absolute gets on a wrap(array, off, len) buffer
        // index from the ARRAY start, not the offset
        val bb  = java.nio.ByteBuffer.wrap(bytes, v1.begin.toInt, nRows * 8).slice()
        val got = Array.tabulate(nRows)(i => bb.getDouble(i * 8))
        assert(got.toSeq === d1.toSeq)
        // 4-byte alignment of every variable's data block
        h.vars.foreach(v => assert(v.begin % 4 === 0L))
      }
    }
  }

  test("all scalar types and char matrices round-trip with exact bytes") {
    for (trial <- 0 until 30) {
      val version = versions(trial % 3)
      val n       = 1 + rng.nextInt(10)
      val dims = Seq(Dim("r", n.toLong), Dim("len", 8L))
      val vars = Seq(
        VarData("b", NC_BYTE, Seq("r"), Array.tabulate(n)(i => (i - 3).toByte)),
        VarData("s", NC_SHORT, Seq("r"), Array.tabulate(n)(i => (i * 7 - 100).toShort)),
        VarData("i", NC_INT, Seq("r"), Array.tabulate(n)(i => i * 1001 - 5)),
        VarData("f", NC_FLOAT, Seq("r"), Array.tabulate(n)(i => i * 0.5f)),
        VarData("d", NC_DOUBLE, Seq("r"), Array.tabulate(n)(i => i * 0.25)),
        VarData("c", NC_CHAR, Seq("r", "len"), Array.tabulate(n)(i => s"s$i"))) ++
        (if (version == 5)
          Seq(VarData("l", NC_INT64, Seq("r"), Array.tabulate(n)(i => i * 10000000000L)))
        else Nil)
      val (h, bytes) = roundTrip(dims, vars, Nil, version)
      assert(h.vars.map(_.name) === vars.map(_.name))
      vars.foreach { v =>
        val hv = h.variable(v.name).get
        assert(hv.ncType === v.ncType)
        assert(hv.vsize % 4 === 0)
      }
      // spot-check the int64 lane on v5
      if (version == 5) {
        val l  = h.variable("l").get
        val bb = java.nio.ByteBuffer.wrap(bytes, l.begin.toInt, n * 8).slice()
        assert((0 until n).forall(i => bb.getLong(i * 8) == i * 10000000000L))
      }
    }
  }

  test("NC_INT64 outside CDF-5 is rejected") {
    val os = new ByteArrayOutputStream()
    intercept[IllegalArgumentException] {
      NetCDF3.write(os, Seq(Dim("r", 1)), Seq(VarData("l", NC_INT64, Seq("r"), Array(1L))), Nil, 2)
    }
  }
}
