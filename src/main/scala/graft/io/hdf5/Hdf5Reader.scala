package graft.io.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Minimal pure-Scala HDF5 reader for the subset of the public HDF5
  * File Format Specification that h5py emits with default settings
  * (libver='earliest'), which is what every reference dataset uses
  * (reference SPEC.md:1-101; io/iopen.py:80-186):
  *
  *   - superblock version 0
  *   - version-1 object headers (+ continuation blocks)
  *   - groups as v1-B-tree + local-heap symbol tables (SNOD)
  *   - datasets: contiguous or chunked (v1 chunk B-tree), optionally
  *     deflate- and/or shuffle-filtered
  *   - datatypes: fixed-point, IEEE float, fixed strings; vlen strings
  *     in ATTRIBUTES (global heap)
  *   - attribute messages v1-v3
  *
  * No external HDF5 library exists in this environment, so this reader
  * is written directly against the published format spec
  * (https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html — public
  * documentation). It reads METADATA on demand through a positional
  * FileChannel: data reads are explicit row windows, so a Spark task
  * can read just its slice of each column dataset in parallel — the
  * Spark analog of the reference's per-rank HDF5 column windows
  * (io/mpi.py read paths).
  *
  * Unsupported features (v2 btrees, fractal heaps from
  * libver='latest', datatypes beyond the above) fail loudly with the
  * offending construct named.
  */
final class Hdf5Reader(val path: String) extends AutoCloseable {
  import Hdf5Reader._

  private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
  def close(): Unit = ch.close()

  // ---- primitive positional reads ---------------------------------

  private def buf(off: Long, n: Int): ByteBuffer = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    var read = 0
    while (read < n) {
      val r = ch.read(b, off + read)
      require(r > 0, s"unexpected EOF at ${off + read} in $path")
      read += r
    }
    b.flip(); b
  }
  private def u8(off: Long): Int = buf(off, 1).get() & 0xFF
  private def u16(off: Long): Int = buf(off, 2).getShort() & 0xFFFF
  private def u32(off: Long): Long = buf(off, 4).getInt() & 0xFFFFFFFFL
  private def u64(off: Long): Long = buf(off, 8).getLong()
  def bytes(off: Long, n: Int): Array[Byte] = {
    val b = buf(off, n); val a = new Array[Byte](n); b.get(a); a
  }

  // ---- superblock ---------------------------------------------------

  val rootHeaderAddr: Long = {
    val sig = bytes(0, 8)
    require(sig.sameElements(Signature), s"$path is not an HDF5 file")
    val version = u8(8)
    require(version == 0, s"unsupported superblock version $version (need 0)")
    require(u8(13) == 8 && u8(14) == 8,
      "unsupported offset/length size (need 8/8)")
    // root group symbol table entry at byte 24 + 4*8 = 56
    u64(56 + 8)
  }

  // ---- object headers (v1) -----------------------------------------

  final case class Message(typ: Int, dataOff: Long, dataLen: Int)

  /** All messages of a v1 object header, following continuations. */
  def messages(addr: Long): Seq[Message] = {
    val version = u8(addr)
    require(version == 1,
      s"unsupported object header version $version at $addr (libver='latest' file?)")
    val nMsgs = u16(addr + 2)
    val hdrSize = u32(addr + 8)
    val out = Seq.newBuilder[Message]
    var remainingMsgs = nMsgs
    // block queue: (start, length); first block starts after 16-byte prologue
    var blocks = List((addr + 16, hdrSize))
    while (blocks.nonEmpty && remainingMsgs > 0) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      var p = start
      while (p < start + len && remainingMsgs > 0) {
        val typ = u16(p)
        val size = u16(p + 2)
        val dataOff = p + 8
        if (typ == 0x0010) { // continuation
          blocks = blocks :+ ((u64(dataOff), u64(dataOff + 8)))
        } else if (typ != 0x0000) {
          out += Message(typ, dataOff, size)
        }
        remainingMsgs -= 1
        p = dataOff + size
      }
    }
    out.result()
  }

  // ---- datatype / dataspace ----------------------------------------

  sealed trait DType { def byteSize: Int }
  final case class FixedPoint(byteSize: Int, signed: Boolean) extends DType
  final case class Floating(byteSize: Int) extends DType
  final case class FixedString(byteSize: Int) extends DType
  case object VlenString extends DType { val byteSize = 16 }

  def parseDatatype(off: Long): DType = {
    val b0 = u8(off)
    val cls = b0 & 0x0F
    val bits0 = u8(off + 1)
    val size = u32(off + 4).toInt
    cls match {
      case 0 => FixedPoint(size, (bits0 & 0x08) != 0)
      case 1 => Floating(size)
      case 3 => FixedString(size)
      case 9 =>
        require((bits0 & 0x0F) == 1, s"unsupported vlen datatype (non-string) at $off")
        VlenString
      case other => fail(s"unsupported datatype class $other at $off")
    }
  }

  /** dims of a simple dataspace ([] = scalar). */
  def parseDataspace(off: Long): Seq[Long] = {
    val version = u8(off)
    val ndims = u8(off + 1)
    val base = version match {
      case 1 => off + 8 // v1: 5 reserved bytes
      case 2 => off + 4
      case v => fail(s"unsupported dataspace version $v at $off")
    }
    (0 until ndims).map(i => u64(base + 8L * i))
  }

  // ---- attributes ----------------------------------------------------

  private def pad8(n: Int): Int = (n + 7) & ~7

  def parseAttribute(m: Message): (String, Any) = {
    val version = u8(m.dataOff)
    val nameSize = u16(m.dataOff + 2)
    val dtSize = u16(m.dataOff + 4)
    val dsSize = u16(m.dataOff + 6)
    var p = m.dataOff + 8
    if (version == 3) p += 1 // name-encoding byte
    require(version >= 1 && version <= 3, s"unsupported attribute version $version")
    val name = cstr(bytes(p, nameSize))
    val pads = version == 1
    val nameSpan = if (pads) pad8(nameSize) else nameSize
    val dtOff = p + nameSpan
    val dsOff = dtOff + (if (pads) pad8(dtSize) else dtSize)
    val dataOff = dsOff + (if (pads) pad8(dsSize) else dsSize)
    val dt = parseDatatype(dtOff)
    val dims = parseDataspace(dsOff)
    val n = dims.product.toInt.max(1)
    val values = (0 until n).map(i => decodeScalar(dt, dataOff + i.toLong * dt.byteSize))
    name -> (if (dims.isEmpty) values.head else values.toArray)
  }

  private def decodeScalar(dt: DType, off: Long): Any = dt match {
    case FixedPoint(8, _) => u64(off)
    case FixedPoint(4, true) => buf(off, 4).getInt()
    case FixedPoint(4, false) => u32(off)
    case FixedPoint(2, true) => buf(off, 2).getShort()
    case FixedPoint(2, false) => u16(off)
    case FixedPoint(1, _) => u8(off)
    case Floating(8) => buf(off, 8).getDouble()
    case Floating(4) => buf(off, 4).getFloat()
    case FixedString(n) => cstr(bytes(off, n))
    case VlenString =>
      // vlen reference: length u32, global-heap collection addr u64, index u32
      val len = u32(off).toInt
      val gaddr = u64(off + 4)
      val idx = u32(off + 12).toInt
      new String(globalHeapObject(gaddr, idx).take(len), "UTF-8")
    case other => fail(s"cannot decode attribute datatype $other")
  }

  /** Object `idx` from the global heap collection at `addr`. */
  def globalHeapObject(addr: Long, idx: Int): Array[Byte] = {
    require(new String(bytes(addr, 4), "US-ASCII") == "GCOL",
      s"no global heap at $addr")
    val end = addr + u64(addr + 8)
    var p = addr + 16
    while (p < end) {
      val oid = u16(p)
      if (oid == 0) fail(s"global heap object $idx not found at $addr")
      val size = u64(p + 8)
      if (oid == idx) return bytes(p + 16, size.toInt)
      p += 16 + pad8(size.toInt)
    }
    fail(s"global heap object $idx not found at $addr")
  }

  // ---- groups ---------------------------------------------------------

  final case class ObjectInfo(addr: Long, attrs: Map[String, Any],
                              isGroup: Boolean, msgs: Seq[Message])

  def objectInfo(addr: Long): ObjectInfo = {
    val msgs = messages(addr)
    val attrs = msgs.filter(_.typ == 0x000C).map(parseAttribute).toMap
    ObjectInfo(addr, attrs, msgs.exists(_.typ == 0x0011), msgs)
  }

  /** Child links of a symbol-table group: name → object header addr. */
  def groupLinks(info: ObjectInfo): Seq[(String, Long)] = {
    val stab = info.msgs.find(_.typ == 0x0011)
      .getOrElse(fail(s"object at ${info.addr} is not a symbol-table group"))
    val btreeAddr = u64(stab.dataOff)
    val heapAddr = u64(stab.dataOff + 8)
    val heapDataAddr = {
      require(new String(bytes(heapAddr, 4), "US-ASCII") == "HEAP",
        s"no local heap at $heapAddr")
      u64(heapAddr + 24)
    }
    val out = Seq.newBuilder[(String, Long)]
    def walkBtree(addr: Long): Unit = {
      require(new String(bytes(addr, 4), "US-ASCII") == "TREE",
        s"no b-tree node at $addr")
      require(u8(addr + 4) == 0, s"wrong b-tree node type at $addr")
      val level = u8(addr + 5)
      val n = u16(addr + 6)
      // children at offset 24 + 8 (key0), stride 16
      (0 until n).foreach { i =>
        val child = u64(addr + 24 + 8 + 16L * i)
        if (level > 0) walkBtree(child) else walkSnod(child)
      }
    }
    def walkSnod(addr: Long): Unit = {
      require(new String(bytes(addr, 4), "US-ASCII") == "SNOD",
        s"no symbol node at $addr")
      val n = u16(addr + 6)
      (0 until n).foreach { i =>
        val e = addr + 8 + 40L * i
        val nameOff = u64(e)
        val objAddr = u64(e + 8)
        val name = heapString(heapDataAddr + nameOff)
        out += (name -> objAddr)
      }
    }
    walkBtree(btreeAddr)
    out.result().sortBy(_._1)
  }

  private def heapString(off: Long): String = {
    val sb = new StringBuilder
    var p = off
    var c = u8(p)
    while (c != 0) { sb.append(c.toChar); p += 1; c = u8(p) }
    sb.toString
  }

  // ---- datasets --------------------------------------------------------

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int]) extends Layout

  final case class DatasetMeta(name: String, addr: Long, dims: Seq[Long],
                               dtype: DType, layout: Layout,
                               filters: Seq[Int], attrs: Map[String, Any]) {
    def rows: Long = if (dims.isEmpty) 1L else dims.head
    def elemsPerRow: Int = if (dims.size <= 1) 1 else dims.tail.product.toInt
    def rowBytes: Int = elemsPerRow * dtype.byteSize
  }

  def datasetMeta(name: String, info: ObjectInfo): DatasetMeta = {
    def m(typ: Int) = info.msgs.find(_.typ == typ)
    val space = m(0x0001).map(x => parseDataspace(x.dataOff))
      .getOrElse(fail(s"dataset $name has no dataspace"))
    val dtype = m(0x0003).map(x => parseDatatype(x.dataOff))
      .getOrElse(fail(s"dataset $name has no datatype"))
    val layout = m(0x0008).map { x =>
      val v = u8(x.dataOff)
      require(v == 3, s"unsupported data layout version $v for $name")
      u8(x.dataOff + 1) match {
        case 1 => Contiguous(u64(x.dataOff + 2), u64(x.dataOff + 10))
        case 2 =>
          val nd = u8(x.dataOff + 2) // ndims + 1
          val bt = u64(x.dataOff + 3)
          val cd = (0 until nd - 1).map(i => u32(x.dataOff + 11 + 4L * i).toInt)
          Chunked(bt, cd)
        case c => fail(s"unsupported layout class $c for $name")
      }
    }.getOrElse(fail(s"dataset $name has no layout"))
    val filters = m(0x000B).map { x =>
      val v = u8(x.dataOff)
      val nf = u8(x.dataOff + 1)
      var p = x.dataOff + (if (v == 1) 8 else 2)
      (0 until nf).map { _ =>
        val id = u16(p)
        val nameLen = if (v == 1 || id >= 256) u16(p + 2) else 0
        val nCli = u16(p + 6)
        val cliPad = if (v == 1) (nCli + 1) / 2 * 2 else nCli // v1 pads odd counts
        p += 8 + (if (v == 1) pad8(nameLen) else nameLen) + 4 * cliPad
        id
      }
    }.getOrElse(Nil)
    DatasetMeta(name, info.addr, space, dtype, layout, filters, info.attrs)
  }

  /** Raw bytes of rows [row0, row1) — the windowed read each Spark
    * task performs for its slice.
    */
  def readRows(ds: DatasetMeta, row0: Long, row1: Long): Array[Byte] = {
    val out = new Array[Byte](((row1 - row0) * ds.rowBytes).toInt)
    ds.layout match {
      case Contiguous(addr, _) =>
        require(ds.filters.isEmpty, s"filters on contiguous dataset ${ds.name}")
        val src = bytes(addr + row0 * ds.rowBytes, out.length)
        System.arraycopy(src, 0, out, 0, out.length)
      case Chunked(btreeAddr, chunkDims) =>
        // chunkDims excludes the trailing element-size entry: one per
        // dataset dimension
        require(chunkDims.size == ds.dims.size, s"chunk rank mismatch for ${ds.name}")
        require(ds.dims.size <= 1 ||
          chunkDims.tail.map(_.toLong) == ds.dims.tail,
          s"chunks splitting non-row dimensions unsupported (${ds.name})")
        val chunkRows = chunkDims.head
        val chunkBytes = (chunkDims.map(_.toLong).product * ds.dtype.byteSize).toInt
        collectChunks(btreeAddr, ds.dims.size.max(1)).foreach {
          case (startRow, addr, nbytes) =>
            val cEnd = startRow + chunkRows
            if (cEnd > row0 && startRow < row1) {
              val raw = bytes(addr, nbytes)
              val data = applyFilters(raw, ds.filters, ds.dtype.byteSize, chunkBytes)
              val from = math.max(row0, startRow)
              val until = math.min(row1, cEnd)
              System.arraycopy(
                data, ((from - startRow) * ds.rowBytes).toInt,
                out, ((from - row0) * ds.rowBytes).toInt,
                ((until - from) * ds.rowBytes).toInt)
            }
        }
    }
    out
  }

  /** Chunk index: (startRow, fileAddr, storedBytes). */
  private def collectChunks(addr: Long, rank: Int): Seq[(Long, Long, Int)] = {
    require(new String(bytes(addr, 4), "US-ASCII") == "TREE",
      s"no chunk b-tree at $addr")
    require(u8(addr + 4) == 1, s"wrong b-tree type for chunks at $addr")
    val level = u8(addr + 5)
    val n = u16(addr + 6)
    val keySize = 8 + 8 * (rank + 1)
    val out = Seq.newBuilder[(Long, Long, Int)]
    var p = addr + 24
    (0 until n).foreach { _ =>
      val nbytes = u32(p).toInt
      val startRow = u64(p + 8)
      val child = u64(p + keySize)
      if (level > 0) out ++= collectChunks(child, rank)
      else out += ((startRow, child, nbytes))
      p += keySize + 8
    }
    out.result()
  }

  private def applyFilters(raw: Array[Byte], filters: Seq[Int],
                           elemSize: Int, chunkBytes: Int): Array[Byte] = {
    // pipeline applies in reverse on read
    filters.reverse.foldLeft(raw) { (data, id) =>
      id match {
        case 1 => inflate(data, chunkBytes)
        case 2 => unshuffle(data, elemSize)
        case other => fail(s"unsupported filter id $other (only deflate/shuffle)")
      }
    }
  }

  private def inflate(data: Array[Byte], outSize: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](outSize)
    var off = 0
    while (!inf.finished() && off < outSize)
      off += inf.inflate(out, off, outSize - off)
    inf.end()
    out
  }

  private def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < elemSize) { out(i * elemSize + b) = data(b * n + i); b += 1 }
      i += 1
    }
    out
  }
}

object Hdf5Reader {
  val Signature: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n').map(_.toByte)

  def cstr(b: Array[Byte]): String = {
    val i = b.indexOf(0.toByte)
    new String(if (i < 0) b else b.take(i), "UTF-8")
  }

  def fail(msg: String): Nothing = throw new Hdf5FormatException(msg)
}

final class Hdf5FormatException(msg: String) extends RuntimeException(msg)
