package graft.sources.netcdf

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

/** Minimal pure-JVM HDF5 codec — the netCDF-4 transport layer (SURVEY S1,
  * reference `readers/GranuleReader.py:87-155`: real L2 Lite granules are
  * netCDF-4 files, i.e. HDF5 containers).
  *
  * Reader scope (the subset libhdf5 writes for netCDF-4 files, from the
  * public HDF5 File Format Specification v1.10):
  *   - superblock v0/v1/v2/v3 (8-byte offsets/lengths)
  *   - object headers v1 and v2 (incl. continuation blocks)
  *   - groups via symbol tables (B-tree v1 + local heap + SNOD) and via
  *     compact Link messages; dense (fractal-heap) groups are rejected
  *     with a clear error — libnetcdf does not produce them by default
  *   - datatypes: fixed-point, IEEE float, fixed-size strings, and
  *     variable-length strings in attributes (global-heap GCOL reads —
  *     libnetcdf stores NC_STRING attrs this way; compound/reference
  *     attrs are skipped)
  *   - data layout v3: compact, contiguous, and chunked with the B-tree v1
  *     chunk index; filters: deflate, shuffle, fletcher32
  *   - attributes v1/v2/v3 with the above datatypes
  *
  * Writer scope (fixture encoder, mirroring what the reader consumes, so
  * HDF5 handling is verifiable in-repo exactly like the classic codec):
  * superblock v0, v1 object headers, symbol-table groups, contiguous and
  * chunked+deflate datasets, numeric/string attributes.
  *
  * Projection pushdown stays REAL I/O pruning: contiguous variables are
  * positioned ranged reads; chunked variables read only the chunks whose
  * row range overlaps the requested slice — unread variables' chunks are
  * never touched.
  */
object Hdf5 {

  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte, '\r'.toByte, '\n'.toByte, 0x1a.toByte, '\n'.toByte)

  def isHdf5(firstBytes: Array[Byte]): Boolean =
    firstBytes.length >= 8 && Signature.indices.forall(i => firstBytes(i) == Signature(i))

  val Undef: Long = -1L // 0xFFFFFFFFFFFFFFFF

  /** Positioned-read abstraction over a file (Hadoop stream or byte array).
    * Reads past EOF return zero-padded tails: metadata probes (e.g. local
    * heap names) over-read by design and stop at the first NUL. */
  trait Input {
    def readAt(off: Long, len: Int): Array[Byte]
  }
  final class BytesInput(b: Array[Byte]) extends Input {
    def readAt(off: Long, len: Int): Array[Byte] = {
      val out  = new Array[Byte](len)
      val take = math.min(len.toLong, math.max(0L, b.length - off)).toInt
      if (take > 0) System.arraycopy(b, off.toInt, out, 0, take)
      out
    }
  }

  /** Little-endian cursor over a byte array (HDF5 metadata is LE). */
  private final class Cur(val buf: Array[Byte], var p: Int = 0) {
    def u8(): Int   = { val v = buf(p) & 0xff; p += 1; v }
    def u16(): Int  = { val v = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8); p += 2; v }
    def u32(): Long = { var v = 0L; var i = 3; while (i >= 0) { v = (v << 8) | (buf(p + i) & 0xffL); i -= 1 }; p += 4; v }
    def u64(): Long = { var v = 0L; var i = 7; while (i >= 0) { v = (v << 8) | (buf(p + i) & 0xffL); i -= 1 }; p += 8; v }
    def uN(n: Int): Long = { var v = 0L; var i = n - 1; while (i >= 0) { v = (v << 8) | (buf(p + i) & 0xffL); i -= 1 }; p += n; v }
    def bytes(n: Int): Array[Byte] = { val b = java.util.Arrays.copyOfRange(buf, p, p + n); p += n; b }
    def skip(n: Int): Unit = p += n
  }

  // ------------------------------------------------------------- data model

  sealed trait H5Type { def size: Int }
  final case class IntT(size: Int, signed: Boolean, littleEndian: Boolean) extends H5Type
  final case class FloatT(size: Int, littleEndian: Boolean) extends H5Type
  final case class StrT(size: Int) extends H5Type
  /** Variable-length string (class 9, type=string): in-file element is a
    * 16-byte global-heap reference (u32 byte length, u64 collection
    * address, u32 object index). libnetcdf writes `NC_STRING` attributes —
    * including real products' CF `units` — this way. */
  final case class VlenStrT(size: Int) extends H5Type
  final case class UnknownT(cls: Int, size: Int) extends H5Type

  final case class Filter(id: Int, clientData: Seq[Int])

  sealed trait Layout
  final case class Compact(data: Array[Byte]) extends Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** chunkDims excludes the trailing element-size dimension. */
  final case class Chunked(btreeAddr: Long, chunkDims: Array[Int]) extends Layout

  final case class Attr(name: String, value: Any)

  /** Writer-side marker: encode this attribute as a variable-length
    * (`NC_STRING`-style) string through the global heap, the way libnetcdf
    * stores string attributes on real netCDF-4 products. The reader hands
    * VL attrs back as plain String / Array[String]. */
  final case class Vlen(values: Seq[String])
  object Vlen { def apply(s: String): Vlen = new Vlen(Seq(s)) }

  final case class Dataset(
      path: String,
      dtype: H5Type,
      shape: Array[Long],
      layout: Layout,
      filters: Seq[Filter],
      atts: Seq[Attr],
      fillBytes: Option[Array[Byte]]) {
    def att(n: String): Option[Any] = atts.find(_.name == n).map(_.value)
    def isDimScale: Boolean = att("CLASS").exists {
      case s: String => s == "DIMENSION_SCALE"
      case _         => false
    }
    /** netCDF-4 pure dims carry a NAME attr marking them as non-variables. */
    def isPureDim: Boolean = isDimScale && att("NAME").exists {
      case s: String => s.startsWith("This is a netCDF dimension")
      case _         => false
    }
    /** Declared fill as Double: the `_FillValue` attribute (the reference's
      * convention) first, else the fill-value header message. */
    def fillValue: Option[Double] = {
      def toD(v: Any): Option[Double] = v match {
        case a: Array[Double] => a.headOption
        case a: Array[Float]  => a.headOption.map(_.toDouble)
        case a: Array[Long]   => a.headOption.map(_.toDouble)
        case a: Array[Int]    => a.headOption.map(_.toDouble)
        case a: Array[Short]  => a.headOption.map(_.toDouble)
        case a: Array[Byte]   => a.headOption.map(_.toDouble)
        case _                => None
      }
      att("_FillValue").flatMap(toD).orElse(
        fillBytes.filter(_.length == dtype.size).map(fb => decodeScalar(dtype, fb)))
    }
  }

  private def decodeScalar(t: H5Type, b: Array[Byte]): Double = {
    val bb = java.nio.ByteBuffer.wrap(b)
    t match {
      case FloatT(8, le) => bb.order(ord(le)).getDouble(0)
      case FloatT(4, le) => bb.order(ord(le)).getFloat(0).toDouble
      case IntT(8, _, le) => bb.order(ord(le)).getLong(0).toDouble
      case IntT(4, _, le) => bb.order(ord(le)).getInt(0).toDouble
      case IntT(2, _, le) => bb.order(ord(le)).getShort(0).toDouble
      case IntT(1, _, _)  => b(0).toDouble
      case _              => Double.NaN
    }
  }
  private def ord(le: Boolean) =
    if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN

  // ---------------------------------------------------------------- reading

  /** Parsed file: every dataset reachable from the root group, path-named
    * ("Sounding/operation_mode"). */
  final class H5File(in: Input, val datasets: Seq[Dataset]) {
    def dataset(path: String): Option[Dataset] = datasets.find(_.path == path)

    /** Raw bytes of rows [r0, r1) of the dataset (leading-dimension slice,
      * full extent of the other dims), in the file's element byte order.
      * Chunked layouts read ONLY overlapping chunks. */
    def readRows(ds: Dataset, r0: Long, r1: Long): Array[Byte] = Hdf5.readRows(in, ds, r0, r1)
  }

  def open(in: Input): H5File = new Parser(in).parse()

  private final class Parser(in: Input) {

    def parse(): H5File = {
      val head = in.readAt(0L, 8)
      require(isHdf5(head), "not an HDF5 file (bad signature)")
      val sb  = new Cur(in.readAt(8L, 4))
      val ver = sb.u8()
      val rootAddr = ver match {
        case 0 | 1 =>
          // [vers fs, vers root STE, reserved, vers shared, size offsets,
          //  size lengths, reserved, leaf k(2), internal k(2), flags(4),
          //  (v1: istore k(2) + reserved(2)), base, free, eof, driver, root STE]
          val fixed = new Cur(in.readAt(9L, 16))
          fixed.skip(4)
          val so = fixed.u8(); val sl = fixed.u8()
          require(so == 8 && sl == 8, s"unsupported offset/length sizes $so/$sl")
          val steOff = 8L + 1 + 4 + 2 + 1 + 2 + 2 + 4 + (if (ver == 1) 4 else 0) + 4 * 8
          val ste = new Cur(in.readAt(steOff, 40))
          ste.skip(8) // link name offset
          ste.u64()   // object header address
        case 2 | 3 =>
          val c = new Cur(in.readAt(9L, 3 + 4 * 8))
          val so = c.u8(); val sl = c.u8()
          require(so == 8 && sl == 8, s"unsupported offset/length sizes $so/$sl")
          c.skip(1)   // consistency flags
          c.u64()     // base address
          c.u64()     // superblock extension
          c.u64()     // EOF
          c.u64()     // root object header address
        case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
      }
      val out     = mutable.ArrayBuffer.empty[Dataset]
      val visited = mutable.Set.empty[Long]
      walk(rootAddr, "", out, visited)
      new H5File(in, out.toSeq)
    }

    /** One parsed header message. */
    private final case class Msg(typ: Int, body: Array[Byte])

    /** Read all messages of an object header (v1 or v2, with continuations). */
    private def readMessages(addr: Long): Seq[Msg] = {
      val first = in.readAt(addr, 4)
      if (first(0) == 'O' && first(1) == 'H' && first(2) == 'D' && first(3) == 'R') readV2(addr)
      else readV1(addr)
    }

    private def readV1(addr: Long): Seq[Msg] = {
      val pre = new Cur(in.readAt(addr, 16))
      val ver = pre.u8()
      require(ver == 1, s"unsupported v1 object header version $ver at $addr")
      pre.skip(1)
      val nMsgs = pre.u16()
      pre.u32() // ref count
      val hdrSize = pre.u32().toInt
      val msgs   = mutable.ArrayBuffer.empty[Msg]
      // blocks of raw message data: (offset, length)
      var blocks = List((addr + 16, hdrSize))
      while (msgs.length < nMsgs && blocks.nonEmpty) {
        val (boff, blen) = blocks.head
        blocks = blocks.tail
        val c = new Cur(in.readAt(boff, blen))
        while (msgs.length < nMsgs && c.p + 8 <= blen) {
          val typ  = c.u16()
          val size = c.u16()
          c.skip(4) // flags + reserved
          val body = c.bytes(size)
          if (typ == 0x0010) { // continuation
            val cc = new Cur(body)
            blocks = blocks :+ ((cc.u64(), cc.u64().toInt))
          } else msgs += Msg(typ, body)
        }
      }
      msgs.toSeq
    }

    private def readV2(addr: Long): Seq[Msg] = {
      val pre = new Cur(in.readAt(addr, 16))
      pre.skip(4) // OHDR
      val ver = pre.u8()
      require(ver == 2, s"unsupported v2 object header version $ver")
      val flags = pre.u8()
      var hdrLen = 6
      if ((flags & 0x20) != 0) { pre.skip(16); hdrLen += 16 } // times
      if ((flags & 0x10) != 0) { pre.skip(4); hdrLen += 4 }   // compact/dense attr counts
      val sizeBytes = 1 << (flags & 0x03)
      val chunk0 = new Cur(in.readAt(addr + hdrLen, sizeBytes)).uN(sizeBytes).toInt
      hdrLen += sizeBytes
      val trackOrder = (flags & 0x04) != 0
      val msgs   = mutable.ArrayBuffer.empty[Msg]
      var blocks = List((addr + hdrLen, chunk0, false)) // (off, len, signed block)
      while (blocks.nonEmpty) {
        var (boff, blen, signed) = blocks.head
        blocks = blocks.tail
        if (signed) { boff += 4; blen -= 4 } // skip OCHK
        val c = new Cur(in.readAt(boff, blen))
        // trailing gap (<hdr size) + 4-byte checksum terminate the block
        while (c.p + 4 + (if (trackOrder) 2 else 0) + 4 <= blen) {
          val typ  = c.u8()
          val size = c.u16()
          c.skip(1) // flags
          if (trackOrder) c.skip(2)
          if (c.p + size + 4 <= blen + 4) {
            val body = c.bytes(size)
            if (typ == 0x0010) {
              val cc = new Cur(body)
              blocks = blocks :+ ((cc.u64(), cc.u64().toInt, true))
            } else if (typ != 0) msgs += Msg(typ, body)
          } else c.p = blen
        }
      }
      msgs.toSeq
    }

    private def walk(addr: Long, prefix: String, out: mutable.ArrayBuffer[Dataset], visited: mutable.Set[Long]): Unit = {
      if (!visited.add(addr)) return
      val msgs = readMessages(addr)
      val hasData = msgs.exists(_.typ == 0x0008)
      if (hasData) out += parseDataset(msgs, prefix.stripSuffix("/"))
      else {
        // group: symbol table message and/or link messages
        msgs.filter(_.typ == 0x0011).foreach { m =>
          val c = new Cur(m.body)
          val btree = c.u64(); val heap = c.u64()
          walkGroupBtree(btree, heap, prefix, out, visited)
        }
        msgs.filter(_.typ == 0x0002).foreach { m => // link info: reject dense groups
          val c = new Cur(m.body)
          c.skip(1)
          val f = c.u8()
          if ((f & 0x01) != 0) c.skip(8)
          val fheap = c.u64()
          require(fheap == Undef, "dense (fractal-heap) groups are not supported")
        }
        msgs.filter(_.typ == 0x0006).foreach { m =>
          parseLink(m.body).foreach { case (name, childAddr) =>
            walk(childAddr, s"$prefix$name/", out, visited)
          }
        }
      }
    }

    /** Hard link message → (name, object header address). */
    private def parseLink(body: Array[Byte]): Option[(String, Long)] = {
      val c = new Cur(body)
      val ver = c.u8()
      if (ver != 1) return None
      val flags = c.u8()
      val ltype = if ((flags & 0x08) != 0) c.u8() else 0
      if ((flags & 0x04) != 0) c.skip(8)
      if ((flags & 0x10) != 0) c.skip(1)
      val nameLen = c.uN(1 << (flags & 0x03)).toInt
      val name    = new String(c.bytes(nameLen), "UTF-8")
      if (ltype == 0) Some((name, c.u64())) else None
    }

    private def walkGroupBtree(btreeAddr: Long, heapAddr: Long, prefix: String, out: mutable.ArrayBuffer[Dataset], visited: mutable.Set[Long]): Unit = {
      // local heap: data segment address at fixed position
      val h = new Cur(in.readAt(heapAddr, 32))
      require(h.bytes(4).sameElements("HEAP".getBytes), "bad local heap signature")
      h.skip(4)  // version + reserved
      h.u64()    // data segment size
      h.u64()    // free list head
      val heapData = h.u64()
      def name(off: Long): String = {
        val b   = in.readAt(heapData + off, 256)
        var end = 0
        while (end < b.length && b(end) != 0) end += 1
        if (end < b.length) new String(b, 0, end, "UTF-8")
        else {
          // name longer than the probe: read again with a bigger window
          val big = in.readAt(heapData + off, 4096)
          var e2  = 0
          while (e2 < big.length && big(e2) != 0) e2 += 1
          new String(big, 0, e2, "UTF-8")
        }
      }
      def visitNode(nodeAddr: Long): Unit = {
        val sig = in.readAt(nodeAddr, 4)
        if (sig.sameElements("SNOD".getBytes)) {
          val head = new Cur(in.readAt(nodeAddr, 8))
          head.skip(6)
          val n   = head.u16()
          val ent = new Cur(in.readAt(nodeAddr + 8, n * 40))
          (0 until n).foreach { _ =>
            val nameOff = ent.u64()
            val hdr     = ent.u64()
            ent.skip(24)
            walk(hdr, s"$prefix${name(nameOff)}/", out, visited)
          }
        } else if (sig.sameElements("TREE".getBytes)) {
          val head = new Cur(in.readAt(nodeAddr, 24))
          head.skip(4)
          val typ   = head.u8()
          head.u8() // level
          val used  = head.u16()
          require(typ == 0, s"unexpected btree node type $typ in group btree")
          head.skip(16) // siblings
          // keys (heap offsets, 8 bytes) alternate with children (8 bytes)
          val body = new Cur(in.readAt(nodeAddr + 24, (2 * used + 1) * 8))
          body.skip(8)
          (0 until used).foreach { _ =>
            val child = body.u64()
            body.skip(8)
            visitNode(child)
          }
        } else throw new IllegalArgumentException(s"unexpected node signature at $nodeAddr")
      }
      visitNode(btreeAddr)
    }

    private def parseDataset(msgs: Seq[Msg], path: String): Dataset = {
      var shape: Array[Long]  = Array.empty
      var dtype: H5Type       = UnknownT(-1, 0)
      var layout: Layout      = Contiguous(Undef, 0)
      var filters: Seq[Filter] = Nil
      var fill: Option[Array[Byte]] = None
      val atts = mutable.ArrayBuffer.empty[Attr]

      msgs.foreach { m =>
        m.typ match {
          case 0x0001 => shape = parseDataspace(m.body)
          case 0x0003 => dtype = parseDatatype(new Cur(m.body))
          case 0x0004 => // old fill value
            val c = new Cur(m.body)
            val sz = c.u32().toInt
            if (sz > 0) fill = Some(c.bytes(sz))
          case 0x0005 =>
            val c = new Cur(m.body)
            val v = c.u8()
            if (v == 1 || v == 2) {
              c.skip(2)
              val defined = c.u8()
              if (v == 1 || defined == 1) {
                val sz = c.u32().toInt
                if (sz > 0 && defined == 1) fill = Some(c.bytes(sz))
              }
            } else if (v == 3) {
              val flags = c.u8()
              if ((flags & 0x20) != 0) {
                val sz = c.u32().toInt
                if (sz > 0) fill = Some(c.bytes(sz))
              }
            }
          case 0x0008 => layout = parseLayout(m.body)
          case 0x000B => filters = parseFilters(m.body)
          case 0x000C => parseAttr(m.body).foreach(atts += _)
          case _      => ()
        }
      }
      Dataset(path, dtype, shape, layout, filters, atts.toSeq, fill)
    }

    private def parseDataspace(body: Array[Byte]): Array[Long] = {
      val c = new Cur(body)
      val ver  = c.u8()
      val rank = c.u8()
      val flags = c.u8()
      if (ver == 1) c.skip(5) else c.skip(1) // v2: type byte
      val dims = Array.fill(rank)(c.u64())
      // max dims ignored ((flags & 1) selects their presence)
      val _ = flags
      dims
    }

    private def parseDatatype(c: Cur): H5Type = {
      val cv    = c.u8()
      val cls   = cv & 0x0f
      val bits0 = c.u8(); c.skip(2)
      val size  = c.u32().toInt
      cls match {
        case 0 => IntT(size, signed = (bits0 & 0x08) != 0, littleEndian = (bits0 & 0x01) == 0)
        case 1 => FloatT(size, littleEndian = (bits0 & 0x01) == 0)
        case 3 => StrT(size)
        case 9 if (bits0 & 0x0f) == 1 => VlenStrT(size) // VL type=string
        case other => UnknownT(other, size)
      }
    }

    private def parseLayout(body: Array[Byte]): Layout = {
      val c = new Cur(body)
      val ver = c.u8()
      require(ver == 3, s"unsupported data layout version $ver (libver-latest chunk indexes are out of scope)")
      c.u8() match {
        case 0 =>
          val sz = c.u16()
          Compact(c.bytes(sz))
        case 1 =>
          Contiguous(c.u64(), c.u64())
        case 2 =>
          val dims = c.u8() // rank + 1
          val btree = c.u64()
          val cdims = Array.fill(dims)(c.u32().toInt)
          Chunked(btree, cdims.dropRight(1)) // trailing entry is element size
        case other => throw new IllegalArgumentException(s"unsupported layout class $other")
      }
    }

    private def parseFilters(body: Array[Byte]): Seq[Filter] = {
      val c = new Cur(body)
      val ver = c.u8()
      val n   = c.u8()
      if (ver == 1) c.skip(6)
      (0 until n).map { _ =>
        val id = c.u16()
        val nameLen = if (ver == 1 || id >= 256) c.u16() else 0
        c.skip(2) // flags
        val nCd = c.u16()
        if (nameLen > 0) c.skip(if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen)
        val cd = (0 until nCd).map(_ => c.u32().toInt)
        if (ver == 1 && nCd % 2 == 1) c.skip(4)
        Filter(id, cd)
      }
    }

    /** Global heap collections, parsed lazily and cached per file: VL
      * attribute data lives in GCOL blocks elsewhere in the file. Map is
      * object index → object bytes. */
    private val gheapCache = mutable.Map.empty[Long, Map[Int, Array[Byte]]]
    private def gheapObjects(addr: Long): Map[Int, Array[Byte]] =
      gheapCache.getOrElseUpdate(addr, {
        val head = new Cur(in.readAt(addr, 16))
        require(head.bytes(4).sameElements("GCOL".getBytes), s"bad global heap signature at $addr")
        head.skip(4) // version + reserved
        val collSize = head.u64()
        require(collSize >= 16 && collSize <= Int.MaxValue, s"implausible global heap size $collSize")
        val body = new Cur(in.readAt(addr + 16, (collSize - 16).toInt))
        val objs = mutable.Map.empty[Int, Array[Byte]]
        var done = false
        while (!done && body.p + 16 <= body.buf.length) {
          val idx = body.u16()
          body.skip(6) // reference count + reserved
          val size = body.u64().toInt
          if (idx == 0) done = true // object 0 = free space; nothing follows
          else {
            objs(idx) = body.bytes(size)
            body.skip((8 - size % 8) % 8)
          }
        }
        objs.toMap
      })

    private def parseAttr(body: Array[Byte]): Option[Attr] = {
      val c = new Cur(body)
      val ver = c.u8()
      if (ver < 1 || ver > 3) return None
      c.skip(1) // reserved (v1) / flags (v2/3)
      val nameSize  = c.u16()
      val dtSize    = c.u16()
      val dsSize    = c.u16()
      if (ver == 3) c.skip(1) // name charset
      def padded(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
      val nameBytes = c.bytes(padded(nameSize))
      var end = 0
      while (end < nameSize && nameBytes(end) != 0) end += 1
      val name = new String(nameBytes, 0, end, "UTF-8")
      val dt   = parseDatatype(new Cur(c.bytes(padded(dtSize))))
      val dims = parseDataspace(c.bytes(padded(dsSize)))
      val n    = dims.product.toInt.max(1)
      val valueLen = n * dt.size
      if (c.p + valueLen > body.length) return None
      val raw = c.bytes(valueLen)
      val bb  = java.nio.ByteBuffer.wrap(raw)
      val value: Any = dt match {
        case StrT(sz) =>
          if (dims.isEmpty || dims.product == 1) {
            var e = 0
            while (e < sz && raw(e) != 0) e += 1
            new String(raw, 0, e, "UTF-8")
          } else Array.tabulate(n) { i =>
            var e = 0
            while (e < sz && raw(i * sz + e) != 0) e += 1
            new String(raw, i * sz, e, "UTF-8")
          }
        case FloatT(8, le) => Array.tabulate(n)(i => bb.order(ord(le)).getDouble(i * 8))
        case FloatT(4, le) => Array.tabulate(n)(i => bb.order(ord(le)).getFloat(i * 4))
        case IntT(8, _, le) => Array.tabulate(n)(i => bb.order(ord(le)).getLong(i * 8))
        case IntT(4, _, le) => Array.tabulate(n)(i => bb.order(ord(le)).getInt(i * 4))
        case IntT(2, _, le) => Array.tabulate(n)(i => bb.order(ord(le)).getShort(i * 2))
        case IntT(1, _, _)  => raw
        case VlenStrT(sz) =>
          def str(i: Int): String = {
            val r   = new Cur(raw, i * sz)
            val len = r.u32().toInt
            val coll = r.u64()
            val idx  = r.u32().toInt
            if (len == 0 || idx == 0) ""
            else {
              val data = gheapObjects(coll).getOrElse(
                idx,
                throw new IllegalArgumentException(
                  s"attribute '$name': missing global heap object $idx in collection at $coll"))
              new String(data, 0, math.min(len, data.length), "UTF-8")
            }
          }
          if (dims.isEmpty || dims.product == 1) str(0) else Array.tabulate(n)(str)
        case _ => return None // compound / reference attrs: skipped
      }
      Some(Attr(name, value))
    }
  }

  // ------------------------------------------------------------ slice reads

  private def readRows(in: Input, ds: Dataset, r0: Long, r1: Long): Array[Byte] = {
    val elem    = ds.dtype.size
    val perRow  = if (ds.shape.length <= 1) 1L else ds.shape.drop(1).product
    val outLenL = (r1 - r0) * perRow * elem
    require(
      outLenL <= Int.MaxValue - 8,
      s"hdf5: row range [$r0,$r1) of ${ds.path} is $outLenL bytes — over the JVM " +
        "array limit; read through narrower splits (maxbytespersplit/maxrowspersplit)")
    val outLen = outLenL.toInt
    val out     = new Array[Byte](outLen)
    // unallocated data reads as fill (or zero)
    ds.fillBytes.filter(_.length == elem).foreach { fb =>
      var i = 0
      while (i < outLen) { out(i) = fb(i % elem); i += 1 }
    }
    ds.layout match {
      case Compact(data) =>
        System.arraycopy(data, (r0 * perRow * elem).toInt, out, 0, outLen)
      case Contiguous(addr, _) =>
        if (addr != Undef) {
          val read = in.readAt(addr + r0 * perRow * elem, outLen)
          System.arraycopy(read, 0, out, 0, outLen)
        }
      case Chunked(btree, cdims) =>
        if (btree != Undef)
          readChunks(in, ds, btree, cdims, r0, r1, out)
    }
    out
  }

  /** Walk the v1 chunk B-tree; copy every chunk overlapping rows [r0,r1). */
  private def readChunks(in: Input, ds: Dataset, nodeAddr: Long, cdims: Array[Int], r0: Long, r1: Long, out: Array[Byte]): Unit = {
    val rank = ds.shape.length
    val head = new Cur(in.readAt(nodeAddr, 24))
    require(head.bytes(4).sameElements("TREE".getBytes), "bad chunk btree signature")
    val typ = head.u8()
    require(typ == 1, s"unexpected btree type $typ in chunk index")
    val level = head.u8()
    val used  = head.u16()
    head.skip(16)
    val keySize  = 8 + (rank + 1) * 8
    val body     = new Cur(in.readAt(nodeAddr + 24, (used + 1) * keySize + used * 8))
    (0 until used).foreach { _ =>
      val chunkBytes = body.u32().toInt
      body.u32() // filter mask
      val offsets = Array.fill(rank + 1)(body.u64())
      val child   = body.u64()
      if (level > 0) readChunks(in, ds, child, cdims, r0, r1, out)
      else {
        val c0 = offsets(0)
        if (c0 < r1 && c0 + cdims(0) > r0)
          copyChunk(in, ds, cdims, offsets, child, chunkBytes, r0, r1, out)
      }
    }
  }

  private def copyChunk(in: Input, ds: Dataset, cdims: Array[Int], offsets: Array[Long], addr: Long, storedLen: Int, r0: Long, r1: Long, out: Array[Byte]): Unit = {
    val elem  = ds.dtype.size
    val rank  = ds.shape.length
    var chunk = in.readAt(addr, storedLen)
    // undo filters in reverse application order
    ds.filters.reverse.foreach { f =>
      f.id match {
        case 3 => // fletcher32: stored with trailing 4-byte checksum
          chunk = java.util.Arrays.copyOf(chunk, chunk.length - 4)
        case 1 => // deflate
          val inf = new Inflater()
          inf.setInput(chunk)
          val full = cdims.map(_.toLong).product * elem
          val buf  = new Array[Byte](full.toInt)
          var filled = 0
          while (!inf.finished() && filled < buf.length) {
            val k = inf.inflate(buf, filled, buf.length - filled)
            if (k == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate chunk")
            filled += k
          }
          inf.end()
          chunk = buf
        case 2 => // shuffle: byte-plane transpose, invert it
          val n = chunk.length / elem
          val un = new Array[Byte](chunk.length)
          var j = 0
          while (j < elem) {
            var i = 0
            while (i < n) { un(i * elem + j) = chunk(j * n + i); i += 1 }
            j += 1
          }
          chunk = un
        case other => throw new IllegalArgumentException(s"unsupported HDF5 filter $other")
      }
    }
    // copy the overlapping region; iterate all non-final dims, copy runs of
    // the last dimension (chunks may be partial on any dim at the edges)
    val dims = ds.shape
    if (rank == 1) {
      val from = math.max(offsets(0), r0)
      val to   = math.min(offsets(0) + cdims(0), math.min(dims(0), r1))
      if (to > from)
        System.arraycopy(
          chunk, ((from - offsets(0)) * elem).toInt,
          out, ((from - r0) * elem).toInt, ((to - from) * elem).toInt)
    } else {
      val lastDim   = rank - 1
      val lastFrom  = offsets(lastDim)
      val lastTo    = math.min(offsets(lastDim) + cdims(lastDim), dims(lastDim))
      val runLen    = ((lastTo - lastFrom) * elem).toInt
      if (runLen > 0) {
        // iterate rows (dim 0) then middle dims
        val rowFrom = math.max(offsets(0), r0)
        val rowTo   = math.min(offsets(0) + cdims(0), math.min(dims(0), r1))
        val midDims = (1 until lastDim).toArray
        val midIdx  = midDims.map(d => offsets(d))
        def midDone: Boolean = midDims.indices.exists(k => midIdx(k) >= math.min(offsets(midDims(k)) + cdims(midDims(k)), dims(midDims(k))))
        var row = rowFrom
        while (row < rowTo) {
          if (midDims.isEmpty) {
            copyRun(chunk, out, ds, cdims, offsets, row, Array.empty, lastFrom, runLen, r0, elem)
          } else {
            midDims.indices.foreach(k => midIdx(k) = offsets(midDims(k)))
            while (!midDone) {
              copyRun(chunk, out, ds, cdims, offsets, row, midIdx.clone(), lastFrom, runLen, r0, elem)
              // increment middle index odometer
              var k = midDims.length - 1
              var carry = true
              while (carry && k >= 0) {
                midIdx(k) += 1
                val lim = math.min(offsets(midDims(k)) + cdims(midDims(k)), dims(midDims(k)))
                if (midIdx(k) < lim) carry = false
                else if (k > 0) { midIdx(k) = offsets(midDims(k)); k -= 1 }
                else carry = false // odometer exhausted; midDone now true
              }
            }
          }
          row += 1
        }
      }
    }
  }

  private def copyRun(chunk: Array[Byte], out: Array[Byte], ds: Dataset, cdims: Array[Int], offsets: Array[Long], row: Long, midIdx: Array[Long], lastFrom: Long, runLen: Int, r0: Long, elem: Int): Unit = {
    val dims = ds.shape
    val rank = dims.length
    // source element offset inside the chunk (row-major over chunk dims)
    var src = row - offsets(0)
    var d = 1
    while (d < rank - 1) { src = src * cdims(d) + (midIdx(d - 1) - offsets(d)); d += 1 }
    src = src * cdims(rank - 1) + 0
    // destination element offset inside the out slice (row-major over shape,
    // rows rebased to r0)
    var dst = row - r0
    d = 1
    while (d < rank - 1) { dst = dst * dims(d) + midIdx(d - 1); d += 1 }
    dst = dst * dims(rank - 1) + lastFrom
    System.arraycopy(chunk, (src * elem).toInt, out, (dst * elem).toInt, runLen)
  }

  // ---------------------------------------------------------------- writing

  /** Growable little-endian buffer with absolute patching. */
  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def w8(v: Int): Unit  = { ensure(1); arr(len) = v.toByte; len += 1 }
    def w16(v: Int): Unit = { ensure(2); arr(len) = v.toByte; arr(len + 1) = (v >> 8).toByte; len += 2 }
    def w32(v: Long): Unit = { ensure(4); var i = 0; while (i < 4) { arr(len + i) = (v >> (8 * i)).toByte; i += 1 }; len += 4 }
    def w64(v: Long): Unit = { ensure(8); var i = 0; while (i < 8) { arr(len + i) = (v >> (8 * i)).toByte; i += 1 }; len += 8 }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def pad(align: Int): Unit = while (len % align != 0) w8(0)
    def patch64(off: Int, v: Long): Unit = { var i = 0; while (i < 8) { arr(off + i) = (v >> (8 * i)).toByte; i += 1 } }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** A dataset to write. `data` is the flattened row-major primitive array
    * (Array[Double|Float|Long|Int|Short|Byte]) or Array[String] for
    * fixed-size strings (strSize must be set). */
  final case class WVar(
      name: String,
      dims: Seq[Long],
      data: AnyRef,
      atts: Seq[Attr] = Nil,
      strSize: Int = 0,
      chunkRows: Int = 0,
      deflateLevel: Int = 0)

  /** A chunked float64 dataset supplied as PRE-ENCODED chunk payloads
    * (already deflated when `deflateLevel` > 0): `chunks` = (per-dim
    * element offsets, stored bytes). Chunks absent from the list stay
    * unallocated and read back as `fill` — the same sparse-store rule as
    * ZarrStore's absent-empty-chunk convention. This is the seam that lets
    * a distributed exporter deflate chunks on the executors that own them
    * and funnel only compressed bytes into the single file-writer task. */
  final case class WChunkedVar(
      name: String,
      dims: Seq[Long],
      cdims: Seq[Int],
      chunks: Seq[(Seq[Long], Array[Byte])],
      atts: Seq[Attr] = Nil,
      deflateLevel: Int = 0,
      fill: Double = Double.NaN)

  /** A group to write: name → vars. Root vars pass with group name "". */
  final case class WGroup(name: String, vars: Seq[WVar], chunked: Seq[WChunkedVar] = Nil)

  private def dtypeOf(v: WVar): H5Type = v.data match {
    case _: Array[Double] => FloatT(8, littleEndian = true)
    case _: Array[Float]  => FloatT(4, littleEndian = true)
    case _: Array[Long]   => IntT(8, signed = true, littleEndian = true)
    case _: Array[Int]    => IntT(4, signed = true, littleEndian = true)
    case _: Array[Short]  => IntT(2, signed = true, littleEndian = true)
    case _: Array[Byte]   => IntT(1, signed = true, littleEndian = true)
    case _: Array[String] => StrT(v.strSize)
    case other => throw new IllegalArgumentException(s"unsupported write type $other")
  }

  private def rawBytes(v: WVar): Array[Byte] =
    v.data match {
      case a: Array[Double] =>
        val b = java.nio.ByteBuffer.allocate(a.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(b.putDouble); b.array()
      case a: Array[Float] =>
        val b = java.nio.ByteBuffer.allocate(a.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(b.putFloat); b.array()
      case a: Array[Long] =>
        val b = java.nio.ByteBuffer.allocate(a.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(b.putLong); b.array()
      case a: Array[Int] =>
        val b = java.nio.ByteBuffer.allocate(a.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(b.putInt); b.array()
      case a: Array[Short] =>
        val b = java.nio.ByteBuffer.allocate(a.length * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(b.putShort); b.array()
      case a: Array[Byte] => a
      case a: Array[String] =>
        val out = new Array[Byte](a.length * v.strSize)
        a.zipWithIndex.foreach { case (s, i) =>
          val b = s.getBytes("UTF-8").take(v.strSize)
          System.arraycopy(b, 0, out, i * v.strSize, b.length)
        }
        out
    }

  private def dtypeBody(t: H5Type): Array[Byte] = {
    val b = new Buf
    t match {
      case IntT(size, signed, le) =>
        b.w8(0x10); b.w8((if (signed) 0x08 else 0) | (if (le) 0 else 1)); b.w8(0); b.w8(0)
        b.w32(size.toLong)
        b.w16(0); b.w16(size * 8)
      case FloatT(size, le) =>
        b.w8(0x11); b.w8(0x20 | (if (le) 0 else 1)); b.w8(if (size == 8) 63 else 31); b.w8(0)
        b.w32(size.toLong)
        b.w16(0); b.w16(size * 8)
        if (size == 8) { b.w8(52); b.w8(11); b.w8(0); b.w8(52); b.w32(1023L) }
        else { b.w8(23); b.w8(8); b.w8(0); b.w8(23); b.w32(127L) }
      case StrT(size) =>
        b.w8(0x13); b.w8(0); b.w8(0); b.w8(0)
        b.w32(size.toLong)
      case VlenStrT(_) =>
        // class 9 v1, type=string; element = 16-byte global heap reference;
        // base type: 1-byte unsigned char (the usual libhdf5 choice)
        b.w8(0x19); b.w8(0x01); b.w8(0); b.w8(0)
        b.w32(16L)
        b.bytes(dtypeBody(IntT(1, signed = false, littleEndian = true)))
      case UnknownT(_, _) => throw new IllegalArgumentException("cannot write unknown dtype")
    }
    b.result()
  }

  private def dataspaceBody(dims: Seq[Long]): Array[Byte] = {
    val b = new Buf
    b.w8(1); b.w8(dims.length); b.w8(0); b.bytes(new Array[Byte](5))
    dims.foreach(b.w64)
    b.result()
  }

  /** `gheap` appends VL payloads to the file's global heap and returns
    * (collection address, 1-based object indexes). */
  private def attrBody(a: Attr, gheap: Seq[Array[Byte]] => (Long, Seq[Int])): Array[Byte] = {
    val (dt, dims, value): (H5Type, Seq[Long], Array[Byte]) = a.value match {
      case Vlen(vs) =>
        val payloads     = vs.map(_.getBytes("UTF-8")).toSeq
        val (coll, idxs) = gheap(payloads)
        val b = new Buf
        payloads.zip(idxs).foreach { case (p, idx) =>
          b.w32(p.length.toLong); b.w64(coll); b.w32(idx.toLong)
        }
        (VlenStrT(16), if (vs.length == 1) Nil else Seq(vs.length.toLong), b.result())
      case s: String =>
        val bs = s.getBytes("UTF-8")
        (StrT(bs.length.max(1)), Nil, if (bs.isEmpty) Array[Byte](0) else bs)
      case arr: Array[Double] =>
        val b = java.nio.ByteBuffer.allocate(arr.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        arr.foreach(b.putDouble)
        (FloatT(8, littleEndian = true), Seq(arr.length.toLong), b.array())
      case arr: Array[Long] =>
        val b = java.nio.ByteBuffer.allocate(arr.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        arr.foreach(b.putLong)
        (IntT(8, signed = true, littleEndian = true), Seq(arr.length.toLong), b.array())
      case arr: Array[Int] =>
        val b = java.nio.ByteBuffer.allocate(arr.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        arr.foreach(b.putInt)
        (IntT(4, signed = true, littleEndian = true), Seq(arr.length.toLong), b.array())
      case other => throw new IllegalArgumentException(s"unsupported attribute value $other")
    }
    val nameB = a.name.getBytes("UTF-8") :+ 0.toByte
    val dtB   = dtypeBody(dt)
    val dsB   = dataspaceBody(dims)
    val b = new Buf
    b.w8(1); b.w8(0)
    b.w16(nameB.length); b.w16(dtB.length); b.w16(dsB.length)
    b.bytes(nameB); b.pad(8)
    b.bytes(dtB); b.pad(8)
    b.bytes(dsB); b.pad(8)
    b.bytes(value)
    b.result()
  }

  /** Write an HDF5 file: root vars (group "") plus named subgroups, each a
    * symbol-table group. Returns the encoded bytes.
    *
    * `v2Layout = true` emits superblock v2 + v2 ("OHDR") object headers —
    * the layout newer libhdf5 writes under latest-libver settings — so the
    * reader's v2 paths are round-trip-tested in-repo, not just spec-coded. */
  def write(groups: Seq[WGroup], rootAtts: Seq[Attr] = Nil, v2Layout: Boolean = false): Array[Byte] = {
    val buf = new Buf
    buf.bytes(Signature)
    val (eofPatch, rootHdrPatch) =
      if (v2Layout) {
        // superblock v2: sizes, flags, base, extension, EOF, root header, checksum
        buf.w8(2); buf.w8(8); buf.w8(8); buf.w8(0)
        buf.w64(0L)      // base address
        buf.w64(Undef)   // superblock extension
        val e = buf.len
        buf.w64(0L)      // EOF (patched)
        val r = buf.len
        buf.w64(0L)      // root object header address (patched)
        buf.w32(0L)      // checksum (readers that verify recompute; ours skips)
        (e, r)
      } else {
        // superblock v0; EOF and root STE header address patched at end
        buf.w8(0); buf.w8(0); buf.w8(0); buf.w8(0); buf.w8(0)
        buf.w8(8); buf.w8(8); buf.w8(0)
        buf.w16(4); buf.w16(16)
        buf.w32(0L)
        buf.w64(0L)      // base address
        buf.w64(Undef)   // free space
        val e = buf.len
        buf.w64(0L)      // EOF (patched)
        buf.w64(Undef)   // driver info
        buf.w64(0L)      // root STE: link name offset
        val r = buf.len
        buf.w64(0L)      // root object header address (patched)
        buf.w32(0L); buf.w32(0L)
        buf.bytes(new Array[Byte](16))
        (e, r)
      }

    /** One GCOL collection per VL attribute: object header (index,
      * refcount, reserved, size) + 8-padded payload per value. Written into
      * the file body immediately (data-first, like dataset payloads), so
      * the attribute's 16-byte references are final. */
    def writeGheap(values: Seq[Array[Byte]]): (Long, Seq[Int]) = {
      val objs = new Buf
      values.zipWithIndex.foreach { case (v, i) =>
        objs.w16(i + 1); objs.w16(1); objs.w32(0L)
        objs.w64(v.length.toLong)
        objs.bytes(v); objs.pad(8)
      }
      val collAddr = buf.len.toLong
      buf.bytes("GCOL".getBytes)
      buf.w8(1); buf.w8(0); buf.w16(0)
      buf.w64(16L + objs.len)
      buf.bytes(objs.result())
      (collAddr, (1 to values.length).toSeq)
    }
    def attrB(a: Attr): Array[Byte] = attrBody(a, writeGheap)

    def msg(out: Buf, typ: Int, body: Array[Byte]): Unit =
      if (v2Layout) {
        out.w8(typ); out.w16(body.length); out.w8(0)
        out.bytes(body)
      } else {
        val padded = (body.length + 7) / 8 * 8
        out.w16(typ); out.w16(padded); out.w8(0); out.w8(0); out.w8(0); out.w8(0)
        out.bytes(body); out.bytes(new Array[Byte](padded - body.length))
      }

    /** Emit an object header (v1 or v2) over pre-rendered messages. */
    def writeHeader(nMsgs: Int, msgs: Array[Byte]): Long = {
      val hdrAddr = buf.len.toLong
      if (v2Layout) {
        buf.bytes("OHDR".getBytes)
        buf.w8(2)
        buf.w8(1) // flags: 2-byte size-of-chunk0, nothing else
        buf.w16(msgs.length)
        buf.bytes(msgs)
        buf.w32(0L) // checksum placeholder (reader skips)
      } else {
        buf.w8(1); buf.w8(0)
        buf.w16(nMsgs)
        buf.w32(1L)
        buf.w32(msgs.length.toLong)
        buf.w32(0L) // pad to 8-align message start
        buf.bytes(msgs)
      }
      hdrAddr
    }

    /** Write one dataset: data first (addresses known), then object header.
      * Returns the object header address. */
    def writeDataset(v: WVar): Long = {
      val dt   = dtypeOf(v)
      val raw  = rawBytes(v)
      val layoutB = new Buf
      var filterB: Option[Array[Byte]] = None
      if (v.chunkRows > 0) {
        // chunked: chunk over dim0 only (full extent of other dims)
        val rank    = v.dims.length
        val perRow  = v.dims.drop(1).product * dt.size
        val cdims   = (v.chunkRows.toLong +: v.dims.drop(1)).toArray
        val chunkBytesFull = (cdims.product * dt.size).toInt
        val nChunks = ((v.dims.head + v.chunkRows - 1) / v.chunkRows).toInt
        val entries = (0 until nChunks).map { ci =>
          val row0 = ci.toLong * v.chunkRows
          val rows = math.min(v.chunkRows.toLong, v.dims.head - row0).toInt
          // full-chunk buffer (edge chunks zero-padded), as libhdf5 stores
          val full = new Array[Byte](chunkBytesFull)
          System.arraycopy(raw, (row0 * perRow).toInt, full, 0, (rows * perRow).toInt)
          val stored =
            if (v.deflateLevel > 0) {
              val d = new Deflater(v.deflateLevel)
              d.setInput(full); d.finish()
              val o = new java.io.ByteArrayOutputStream(full.length / 2)
              val tmp = new Array[Byte](8192)
              while (!d.finished()) o.write(tmp, 0, d.deflate(tmp))
              d.end()
              o.toByteArray
            } else full
          val addr = buf.len.toLong
          buf.bytes(stored)
          (row0, stored.length, addr)
        }
        // chunk btree: single leaf node
        val btreeAddr = buf.len.toLong
        buf.bytes("TREE".getBytes)
        buf.w8(1); buf.w8(0); buf.w16(nChunks)
        buf.w64(Undef); buf.w64(Undef)
        entries.foreach { case (row0, storedLen, addr) =>
          buf.w32(storedLen.toLong); buf.w32(0L)
          buf.w64(row0); (1 to rank).foreach(_ => buf.w64(0L)) // mid dims 0 + trailing 0
          buf.w64(addr)
        }
        // final key
        buf.w32(0L); buf.w32(0L)
        buf.w64(v.dims.head); (1 until rank).foreach(i => buf.w64(v.dims(i))); buf.w64(0L)

        layoutB.w8(3); layoutB.w8(2)
        layoutB.w8(rank + 1)
        layoutB.w64(btreeAddr)
        cdims.foreach(d => layoutB.w32(d))
        layoutB.w32(dt.size.toLong)
        if (v.deflateLevel > 0) {
          val fb = new Buf
          fb.w8(1); fb.w8(1); fb.bytes(new Array[Byte](6))
          fb.w16(1); fb.w16(0); fb.w16(0); fb.w16(1)
          fb.w32(v.deflateLevel.toLong); fb.w32(0L)
          filterB = Some(fb.result())
        }
      } else {
        val addr = buf.len.toLong
        buf.bytes(raw)
        layoutB.w8(3); layoutB.w8(1)
        layoutB.w64(addr); layoutB.w64(raw.length.toLong)
      }
      val msgsB = new Buf
      msg(msgsB, 0x0001, dataspaceBody(v.dims))
      msg(msgsB, 0x0003, dtypeBody(dt))
      val fvB = new Buf
      fvB.w8(2); fvB.w8(2); fvB.w8(2); fvB.w8(0)
      msg(msgsB, 0x0005, fvB.result())
      msg(msgsB, 0x0008, layoutB.result())
      filterB.foreach(fb => msg(msgsB, 0x000B, fb))
      v.atts.foreach(a => msg(msgsB, 0x000C, attrB(a)))
      writeHeader(4 + filterB.size + v.atts.length, msgsB.result())
    }

    /** Write one pre-encoded chunked dataset: payloads first (addresses
      * known), then the v1 chunk B-tree (keys ascending, per-dim offsets),
      * then the object header with a DEFINED fill value so unallocated
      * chunks read back as `fill`. Returns the object header address. */
    def writeChunkedDataset(v: WChunkedVar): Long = {
      val dt   = FloatT(8, littleEndian = true)
      val rank = v.dims.length
      require(v.cdims.length == rank, s"${v.name}: cdims rank ${v.cdims.length} != dims rank $rank")
      import scala.math.Ordering.Implicits.seqOrdering
      val entries = v.chunks.sortBy(_._1.toList).map { case (offs, stored) =>
        require(offs.length == rank, s"${v.name}: chunk offset rank mismatch")
        val addr = buf.len.toLong
        buf.bytes(stored)
        (offs, stored.length, addr)
      }
      val btreeAddr = buf.len.toLong
      buf.bytes("TREE".getBytes)
      buf.w8(1); buf.w8(0); buf.w16(entries.length)
      buf.w64(Undef); buf.w64(Undef)
      entries.foreach { case (offs, storedLen, addr) =>
        buf.w32(storedLen.toLong); buf.w32(0L)
        offs.foreach(buf.w64); buf.w64(0L)
        buf.w64(addr)
      }
      // final key
      buf.w32(0L); buf.w32(0L)
      v.dims.foreach(buf.w64); buf.w64(0L)

      val layoutB = new Buf
      layoutB.w8(3); layoutB.w8(2)
      layoutB.w8(rank + 1)
      layoutB.w64(btreeAddr)
      v.cdims.foreach(d => layoutB.w32(d.toLong))
      layoutB.w32(dt.size.toLong)

      val msgsB = new Buf
      msg(msgsB, 0x0001, dataspaceBody(v.dims))
      msg(msgsB, 0x0003, dtypeBody(dt))
      val fvB = new Buf
      fvB.w8(2); fvB.w8(2); fvB.w8(2); fvB.w8(1)
      fvB.w32(8L)
      val fb8 = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fb8.putDouble(v.fill)
      fvB.bytes(fb8.array())
      msg(msgsB, 0x0005, fvB.result())
      msg(msgsB, 0x0008, layoutB.result())
      var nMsgs = 4
      if (v.deflateLevel > 0) {
        val fb = new Buf
        fb.w8(1); fb.w8(1); fb.bytes(new Array[Byte](6))
        fb.w16(1); fb.w16(0); fb.w16(0); fb.w16(1)
        fb.w32(v.deflateLevel.toLong); fb.w32(0L)
        msg(msgsB, 0x000B, fb.result())
        nMsgs += 1
      }
      v.atts.foreach(a => msg(msgsB, 0x000C, attrB(a)))
      writeHeader(nMsgs + v.atts.length, msgsB.result())
    }

    /** Write a symbol-table group over (name → header addr) children.
      * Returns the group object header address. */
    def writeGroup(children: Seq[(String, Long)], atts: Seq[Attr]): Long = {
      // local heap: offset 0 = empty name, then names 8-aligned
      val heapData = new Buf
      heapData.w64(0L)
      val nameOffs = children.map { case (n, _) =>
        val off = heapData.len.toLong
        heapData.bytes(n.getBytes("UTF-8")); heapData.w8(0); heapData.pad(8)
        off
      }
      val heapDataAddr = buf.len.toLong
      buf.bytes(heapData.result())
      val heapAddr = buf.len.toLong
      buf.bytes("HEAP".getBytes)
      buf.w8(0); buf.w8(0); buf.w8(0); buf.w8(0)
      buf.w64(heapData.len.toLong)
      buf.w64(Undef)
      buf.w64(heapDataAddr)
      // SNOD with entries sorted by name
      val sorted = children.zip(nameOffs).sortBy(_._1._1)
      val snodAddr = buf.len.toLong
      buf.bytes("SNOD".getBytes)
      buf.w8(1); buf.w8(0); buf.w16(sorted.length)
      sorted.foreach { case ((_, hdr), off) =>
        buf.w64(off); buf.w64(hdr); buf.w32(0L); buf.w32(0L); buf.bytes(new Array[Byte](16))
      }
      // group btree: one leaf entry pointing at the SNOD
      val btreeAddr = buf.len.toLong
      buf.bytes("TREE".getBytes)
      buf.w8(0); buf.w8(0); buf.w16(1)
      buf.w64(Undef); buf.w64(Undef)
      buf.w64(0L)                                  // key 0: empty name
      buf.w64(snodAddr)
      buf.w64(sorted.lastOption.map(_._2).getOrElse(0L)) // key 1: greatest name
      // group object header: symbol table message (+ attrs)
      val stB = new Buf
      stB.w64(btreeAddr); stB.w64(heapAddr)
      val msgsB = new Buf
      msg(msgsB, 0x0011, stB.result())
      atts.foreach(a => msg(msgsB, 0x000C, attrB(a)))
      writeHeader(1 + atts.length, msgsB.result())
    }

    val root = groups.find(_.name == "")
    val subGroups = groups.filter(_.name.nonEmpty)
    def datasetChildren(g: WGroup): Seq[(String, Long)] =
      g.vars.map(v => v.name -> writeDataset(v)) ++
        g.chunked.map(v => v.name -> writeChunkedDataset(v))
    val rootChildren =
      root.map(datasetChildren).getOrElse(Nil) ++
        subGroups.map(g => g.name -> writeGroup(datasetChildren(g), Nil))
    val rootHdr = writeGroup(rootChildren, rootAtts)
    buf.patch64(rootHdrPatch, rootHdr)
    buf.patch64(eofPatch, buf.len.toLong)
    buf.result()
  }
}
