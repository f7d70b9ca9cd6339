package graft.io.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Minimal pure-Scala HDF5 reader for the subset of the public HDF5
  * File Format Specification that h5py emits — BOTH the default
  * libver='earliest' layout every reference dataset uses (reference
  * SPEC.md:1-101; io/iopen.py:80-186) AND the modern libver='latest'
  * layout newer toolchains produce:
  *
  *   - superblocks v0/v1 (legacy) and v2/v3 (checksummed)
  *   - version-1 object headers (+ continuation blocks) and
  *     version-2 checksummed object headers (OHDR/OCHK, Jenkins
  *     lookup3 checksums VERIFIED on read)
  *   - groups as v1-B-tree + local-heap symbol tables (SNOD), as
  *     compact link messages (v2 groups), or as DENSE link storage
  *     (fractal heap FRHP/FHIB/FHDB + v2-B-tree BTHD/BTIN/BTLF name
  *     index — what a modern writer emits past the compact-link
  *     threshold, i.e. any real many-column catalog)
  *   - datasets: contiguous (layout v3/v4) or chunked via v1 chunk
  *     B-tree, or any of the layout-v4 chunk indexes: Single Chunk,
  *     Implicit, Fixed Array (single-page AND paged FADB), Extensible
  *     Array (EAHD/EAIB/EADB incl. EASB super blocks AND paged data
  *     blocks with EASB page-init bitmaps — the h5py appendable/
  *     maxshape=None shape at any chunk count),
  *     and v2 B-tree (record types 10/11); optionally deflate- and/or
  *     shuffle-filtered, honoring per-chunk filter masks (raw partial
  *     edge chunks under H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS)
  *   - datatypes: fixed-point, IEEE float, fixed strings; vlen
  *     strings (global-heap GCOL) in attributes AND datasets — the
  *     h5py default mapping for plain Python str columns
  *   - attribute messages v1-v3, compact AND dense storage (Attribute
  *     Info + fractal heap + v2-B-tree type-8 name index — what
  *     libhdf5 emits past 8 attributes, e.g. attribute-heavy header
  *     groups), incl. HUGE heap objects (>4 KiB values such as
  *     provenance blobs, indirect via the heap's type-1 B-tree)
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
  * Unsupported residue (filtered fractal heaps; tiny heap objects,
  * which link/attribute messages can never produce; paged
  * index-block-pointed EA data blocks, a shape libhdf5 never emits;
  * datatypes beyond the above) fails loudly with the offending
  * construct named. Each refusal is EVIDENCED, not asserted:
  * `scripts/h5residue_probe.py` scans every committed fixture for the
  * shapes' on-disk markers, prints the format-level argument for why
  * each is unreachable from link/attribute/chunk storage (filters are
  * dcpl-only; tiny-ID capacity 6–7 B < minimum serialized message;
  * the EA Page Bitmap exists only in super blocks), and — where h5py
  * exists — actively drives libhdf5 at the shapes and re-scans its
  * output. See FIXTURES.md §Refused-residue evidence.
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

  /** Little-endian unsigned integer of ANY width 1..8 — the v4 layout
    * and fixed-array structures encode sizes in the MINIMAL byte width
    * (3- and 5-byte fields are routine in real files, not just the
    * power-of-two widths).
    */
  private def uVar(off: Long, n: Int): Long = {
    val b = bytes(off, n)
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(i) & 0xFFL) << (8 * i); i += 1 }
    v
  }
  def bytes(off: Long, n: Int): Array[Byte] = {
    val b = buf(off, n); val a = new Array[Byte](n); b.get(a); a
  }

  // ---- superblock ---------------------------------------------------

  /** (superblock version, root object header address). v0/v1 locate
    * the root through its symbol-table entry; v2/v3 store the address
    * directly and carry a lookup3 checksum, verified here.
    */
  val (superblockVersion: Int, rootHeaderAddr: Long) = {
    val sig = bytes(0, 8)
    require(sig.sameElements(Signature), s"$path is not an HDF5 file")
    // every file offset this reader computes assumes base address 0 —
    // a nonzero base (user-block files) would misread silently
    def requireZeroBase(off: Long): Unit =
      require(u64(off) == 0, s"nonzero base address ${u64(off)} unsupported")
    u8(8) match {
      case 0 =>
        require(u8(13) == 8 && u8(14) == 8,
          "unsupported offset/length size (need 8/8)")
        requireZeroBase(24)
        // root group symbol table entry at byte 24 + 4*8 = 56
        (0, u64(56 + 8))
      case 1 =>
        require(u8(13) == 8 && u8(14) == 8,
          "unsupported offset/length size (need 8/8)")
        // v1 inserts indexed-storage-K (2) + reserved (2) before the
        // base address, shifting the root entry to byte 60
        requireZeroBase(28)
        (1, u64(60 + 8))
      case v @ (2 | 3) =>
        require(u8(9) == 8 && u8(10) == 8,
          "unsupported offset/length size (need 8/8)")
        val stored = u32(44)
        val computed = Lookup3.hashU(bytes(0, 44), 0)
        require(stored == computed,
          f"superblock v$v checksum mismatch (stored 0x$stored%08x != computed 0x$computed%08x)")
        requireZeroBase(12)
        (v, u64(36))
      case v => fail(s"unsupported superblock version $v")
    }
  }

  // ---- object headers (v1 + checksummed v2) -------------------------

  final case class Message(typ: Int, dataOff: Long, dataLen: Int)

  /** All messages of an object header, following continuations.
    * Dispatches on the OHDR signature: v2 headers (libver='latest')
    * start with "OHDR"; v1 headers start with a bare version byte.
    */
  def messages(addr: Long): Seq[Message] =
    if (new String(bytes(addr, 4), "US-ASCII") == "OHDR") messagesV2(addr)
    else messagesV1(addr)

  /** v2 (checksummed) object header: OHDR prefix + sized chunk 0 +
    * OCHK continuation blocks; every chunk's lookup3 checksum is
    * verified before its messages are trusted.
    */
  private def messagesV2(addr: Long): Seq[Message] = {
    val version = u8(addr + 4)
    require(version == 2, s"unsupported OHDR version $version at $addr")
    val flags = u8(addr + 5)
    var p = addr + 6
    if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) p += 4  // attr storage phase-change bounds
    val szBytes = 1 << (flags & 0x03)
    val chunk0 = szBytes match {
      case 1 => u8(p).toLong
      case 2 => u16(p).toLong
      case 4 => u32(p)
      case _ => u64(p)
    }
    p += szBytes
    val prefixLen = (p - addr).toInt
    val stored = u32(p + chunk0)
    val computed = Lookup3.hashU(bytes(addr, prefixLen + chunk0.toInt), 0)
    require(stored == computed,
      f"object header checksum mismatch at $addr (stored 0x$stored%08x != 0x$computed%08x)")
    // messages carry a 2-byte creation-order field iff header bit 2 set
    val msgHdr = if ((flags & 0x04) != 0) 6 else 4
    val out = Seq.newBuilder[Message]
    // a crafted file with cyclic continuation pointers (each block
    // individually checksum-valid) must terminate, not spin/OOM
    val seen = scala.collection.mutable.Set[Long]()
    var blocks = List((p, chunk0))
    while (blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      var q = start
      val end = start + len
      // no message count in v2 — iterate by size; a trailing gap
      // smaller than a message header terminates the block
      while (q + msgHdr <= end) {
        val typ = u8(q)
        val size = u16(q + 1)
        val dataOff = q + msgHdr
        if (typ == 0x0010) { // continuation: OCHK block
          val cAddr = u64(dataOff)
          val cLen = u64(dataOff + 8)
          require(seen.add(cAddr), s"cyclic continuation chain at $cAddr")
          require(new String(bytes(cAddr, 4), "US-ASCII") == "OCHK",
            s"no OCHK continuation at $cAddr")
          val cStored = u32(cAddr + cLen - 4)
          val cComputed = Lookup3.hashU(bytes(cAddr, (cLen - 4).toInt), 0)
          require(cStored == cComputed,
            f"continuation checksum mismatch at $cAddr (0x$cStored%08x != 0x$cComputed%08x)")
          blocks = blocks :+ ((cAddr + 4, cLen - 8)) // minus sig + checksum
        } else if (typ != 0x0000) {
          out += Message(typ, dataOff, size)
        }
        q = dataOff + size
      }
    }
    out.result()
  }

  /** All messages of a v1 object header, following continuations. */
  private def messagesV1(addr: Long): Seq[Message] = {
    val version = u8(addr)
    require(version == 1,
      s"unsupported object header version $version at $addr")
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

  def parseAttribute(m: Message): (String, Any) = parseAttributeAt(m.dataOff)

  /** Dense attribute storage: every record of the name-index v2
    * B-tree (type 8: heap ID (8) + message flags (1) + creation
    * order (4) + lookup3 name hash (4)) dereferences into the fractal
    * heap, where the stored object is a serialized attribute
    * message — the same encoding compact 0x000C messages carry.
    * Shared attributes (nonzero message flags) fail loudly.
    */
  private def denseAttributes(fheapAddr: Long, nameBtAddr: Long,
                              at: Long): Seq[(String, Any)] = {
    val heap = new FractalHeap(fheapAddr)
    v2BtreeRecords(nameBtAddr, Set(8)).map { rec =>
      require(rec.length == 17,
        s"dense-attribute record size ${rec.length} != 17 at $at")
      require((rec(8) & 0xFF) == 0,
        s"shared/flagged dense attribute (flags ${rec(8) & 0xFF}) unsupported at $at")
      parseAttributeAt(heap.objectPos(rec.take(8))._1)
    }
  }

  /** Attribute-message body at an absolute file offset — shared by
    * compact messages and fractal-heap objects (dense storage
    * serializes the identical encoding).
    */
  private def parseAttributeAt(dataOff: Long): (String, Any) = {
    val version = u8(dataOff)
    val nameSize = u16(dataOff + 2)
    val dtSize = u16(dataOff + 4)
    val dsSize = u16(dataOff + 6)
    var p = dataOff + 8
    if (version == 3) p += 1 // name-encoding byte
    require(version >= 1 && version <= 3, s"unsupported attribute version $version")
    val name = cstr(bytes(p, nameSize))
    val pads = version == 1
    val nameSpan = if (pads) pad8(nameSize) else nameSize
    val dtOff = p + nameSpan
    val dsOff = dtOff + (if (pads) pad8(dtSize) else dtSize)
    val valOff = dsOff + (if (pads) pad8(dsSize) else dsSize)
    val dt = parseDatatype(dtOff)
    val dims = parseDataspace(dsOff)
    val n = dims.product.toInt.max(1)
    val values = (0 until n).map(i => decodeScalar(dt, valOff + i.toLong * dt.byteSize))
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

  /** EVERY object of the global heap collection at `addr`, decoded in
    * one pass. A vlen-string DATASET references the same collection
    * once per element — per-element [[globalHeapObject]] lookups would
    * re-scan the collection per row (quadratic in rows), so bulk
    * decode and cache by collection address instead.
    */
  def globalHeapObjects(addr: Long): Map[Int, Array[Byte]] = {
    require(new String(bytes(addr, 4), "US-ASCII") == "GCOL",
      s"no global heap at $addr")
    val end = addr + u64(addr + 8)
    val out = Map.newBuilder[Int, Array[Byte]]
    var p = addr + 16
    while (p < end) {
      val oid = u16(p)
      if (oid == 0) return out.result() // free-space terminator
      val size = u64(p + 8)
      require(size <= Int.MaxValue, s"global heap object $oid too large at $addr")
      out += oid -> bytes(p + 16, size.toInt)
      p += 16 + pad8(size.toInt)
    }
    out.result()
  }

  // ---- groups ---------------------------------------------------------

  final case class ObjectInfo(addr: Long, attrs: Map[String, Any],
                              isGroup: Boolean, msgs: Seq[Message])

  def objectInfo(addr: Long): ObjectInfo = {
    val msgs = messages(addr)
    // dense attribute storage (Attribute Info + fractal heap + v2
    // B-tree type-8 name index — what libhdf5 emits past its
    // compact-attribute threshold of 8, e.g. the attribute-heavy
    // header groups real catalogs carry): walk the name index so
    // units/descriptions/load-conditions survive instead of the
    // 0x000C scan silently missing them
    val dense = msgs.find(_.typ == 0x0015).toSeq.flatMap { ai =>
      val flags = u8(ai.dataOff + 1)
      var q = ai.dataOff + 2
      if ((flags & 0x01) != 0) q += 2 // max creation index
      val fheap = u64(q)
      if (fheap == Undef) Seq.empty
      else denseAttributes(fheap, u64(q + 8), addr)
    }
    val attrs = (msgs.filter(_.typ == 0x000C).map(parseAttribute) ++ dense).toMap
    // a group carries a symbol table (v1), or link-info/group-info
    // messages (v2 "new-style" groups)
    val isGroup = msgs.exists(m =>
      m.typ == 0x0011 || m.typ == 0x0002 || m.typ == 0x000A)
    ObjectInfo(addr, attrs, isGroup, msgs)
  }

  /** Child links of a group: name → object header addr. Handles v1
    * symbol-table groups, v2 groups with compact link messages, AND v2
    * groups with dense link storage (fractal heap + v2-B-tree name
    * index — what h5py libver='latest' switches to once a group holds
    * more than its compact-link threshold of links, i.e. any real
    * many-column catalog).
    */
  def groupLinks(info: ObjectInfo): Seq[(String, Long)] =
    info.msgs.find(_.typ == 0x0011) match {
      case Some(stab) => symbolTableLinks(stab)
      case None =>
        require(info.isGroup, s"object at ${info.addr} is not a group")
        // dense storage puts links in a fractal heap named by link-info
        val dense = info.msgs.find(_.typ == 0x0002).flatMap { li =>
          val flags = u8(li.dataOff + 1)
          var q = li.dataOff + 2
          if ((flags & 0x01) != 0) q += 8 // max creation index
          val fheap = u64(q)
          val nameBt = u64(q + 8)
          if (fheap == Undef) None
          else {
            require(nameBt != Undef,
              s"dense link storage without a name index at ${info.addr}")
            Some(denseLinks(fheap, nameBt))
          }
        }
        dense.getOrElse(
          info.msgs.filter(_.typ == 0x0006).map(parseLink).sortBy(_._1))
    }

  /** Dense link storage: every record of the name-index v2 B-tree
    * (type 5: name-hash + fractal-heap ID) dereferences into the
    * fractal heap, where the stored object is a serialized link
    * message — the same encoding [[parseLink]] reads compactly.
    */
  private def denseLinks(fheapAddr: Long, nameBtAddr: Long): Seq[(String, Long)] = {
    val heap = new FractalHeap(fheapAddr)
    v2BtreeRecords(nameBtAddr, Set(5)).map { rec =>
      // record: lookup3(name)(4) + heap ID (rest)
      parseLinkAt(heap.objectPos(rec.drop(4))._1)
    }.sortBy(_._1)
  }

  /** Hard-link message (type 0x0006) of a v2 compact group. */
  private def parseLink(m: Message): (String, Long) = parseLinkAt(m.dataOff)

  /** Link-message body at an absolute file offset — shared by compact
    * messages and fractal-heap objects (dense storage serializes the
    * identical encoding).
    */
  private def parseLinkAt(dataOff: Long): (String, Long) = {
    val version = u8(dataOff)
    require(version == 1, s"unsupported link message version $version")
    val flags = u8(dataOff + 1)
    var p = dataOff + 2
    val linkType = if ((flags & 0x08) != 0) { val t = u8(p); p += 1; t } else 0
    if ((flags & 0x04) != 0) p += 8 // creation order
    if ((flags & 0x10) != 0) p += 1 // name charset
    val lenSz = 1 << (flags & 0x03)
    val nameLen = lenSz match {
      case 1 => u8(p)
      case 2 => u16(p)
      case 4 => u32(p).toInt
      case _ => u64(p).toInt
    }
    p += lenSz
    val name = new String(bytes(p, nameLen), "UTF-8")
    p += nameLen
    require(linkType == 0,
      s"unsupported link type $linkType for '$name' (hard links only)")
    name -> u64(p)
  }

  private def symbolTableLinks(stab: Message): Seq[(String, Long)] = {
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

  // ---- v2 B-trees (BTHD / BTIN / BTLF) -------------------------------

  private def sig4(addr: Long): String = new String(bytes(addr, 4), "US-ASCII")

  /** Minimal unsigned encoding width — H5VM_limit_enc_size. */
  private def encSize(v: Long): Int =
    math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L)) + 7) / 8)

  /** All records of a v2 B-tree, in tree order; each is `recordSize`
    * raw bytes. Used for dense-link name indexes (type 5) and v4
    * chunk indexes (types 10/11). Every node's lookup3 checksum is
    * verified. Any depth: internal-node child pointers follow
    * libhdf5's geometry (H5B2hdr.c) — address(8) + record count
    * (width = minimal encoding of the LEAF capacity, uniform across
    * depths) + total subtree records (width = minimal encoding of the
    * child depth's cumulative capacity, absent over leaves; the
    * internal capacity at each depth is solved from nodeSize against
    * that pointer width).
    */
  private[hdf5] def v2BtreeRecords(hdrAddr: Long,
                                   expectTypes: Set[Int]): Seq[Array[Byte]] = {
    require(sig4(hdrAddr) == "BTHD", s"no v2 b-tree header at $hdrAddr")
    require(u8(hdrAddr + 4) == 0, s"unsupported BTHD version at $hdrAddr")
    val btType = u8(hdrAddr + 5)
    require(expectTypes.contains(btType),
      s"unexpected v2 b-tree type $btType at $hdrAddr (want ${expectTypes.mkString("/")})")
    val nodeSize = u32(hdrAddr + 6)
    val recordSize = u16(hdrAddr + 10)
    val depth = u16(hdrAddr + 12)
    val rootAddr = u64(hdrAddr + 16)
    val rootNRec = u16(hdrAddr + 24)
    val totalNRec = u64(hdrAddr + 26)
    val hStored = u32(hdrAddr + 34)
    val hComputed = Lookup3.hashU(bytes(hdrAddr, 34), 0)
    require(hStored == hComputed, s"BTHD checksum mismatch at $hdrAddr")
    require(recordSize > 0 && nodeSize > recordSize + 10,
      s"implausible v2 b-tree geometry at $hdrAddr (node $nodeSize, record $recordSize)")
    if (totalNRec == 0 || rootAddr == Undef) return Seq.empty

    def leafRecords(addr: Long, n: Int): Seq[Array[Byte]] = {
      require(sig4(addr) == "BTLF", s"no v2 b-tree leaf at $addr")
      require(u8(addr + 4) == 0 && u8(addr + 5) == btType,
        s"BTLF version/type mismatch at $addr")
      val used = 6 + n * recordSize
      val s = u32(addr + used)
      val c = Lookup3.hashU(bytes(addr, used), 0)
      require(s == c, s"BTLF checksum mismatch at $addr")
      (0 until n).map(i => bytes(addr + 6 + i.toLong * recordSize, recordSize))
    }

    require(depth <= 8, s"implausible v2 b-tree depth $depth at $hdrAddr")
    // per-depth geometry (libhdf5 H5B2hdr.c): record-count width is
    // uniform (minimal encoding of the LEAF capacity); the total-
    // subtree-records width at depth d is the minimal encoding of the
    // cumulative capacity at d, which feeds the pointer width — and
    // therefore the internal capacity — at d+1
    val maxLeafRec = (nodeSize - 10) / recordSize
    val nrecW = encSize(maxLeafRec)
    val cumW = new Array[Int](depth + 1)   // cumW(0) = 0: leaves carry no total
    locally {
      var cum = maxLeafRec.toLong
      var d = 1
      while (d <= depth) {
        val ptrW = 8 + nrecW + cumW(d - 1)
        val mr = (nodeSize - (10 + ptrW)) / (recordSize + ptrW)
        require(mr >= 1, s"v2 b-tree node size $nodeSize too small for depth $d at $hdrAddr")
        cum = (mr + 1).toLong * cum + mr
        cumW(d) = encSize(cum)
        d += 1
      }
    }

    def walk(addr: Long, d: Int, nRec: Int): Seq[Array[Byte]] =
      if (d == 0) leafRecords(addr, nRec)
      else {
        require(sig4(addr) == "BTIN", s"no v2 b-tree internal node at $addr")
        require(u8(addr + 4) == 0 && u8(addr + 5) == btType,
          s"BTIN version/type mismatch at $addr")
        val recsStart = addr + 6
        val ptrStart = recsStart + nRec.toLong * recordSize
        val ptrW = 8 + nrecW + cumW(d - 1)
        val used = (6 + nRec.toLong * recordSize + (nRec + 1).toLong * ptrW).toInt
        val s = u32(addr + used)
        val c = Lookup3.hashU(bytes(addr, used), 0)
        require(s == c, s"BTIN checksum mismatch at $addr")
        val out = Seq.newBuilder[Array[Byte]]
        (0 to nRec).foreach { i =>
          val p = ptrStart + i.toLong * ptrW
          out ++= walk(u64(p), d - 1, uVar(p + 8, nrecW).toInt)
          if (i < nRec)
            out += bytes(recsStart + i.toLong * recordSize, recordSize)
        }
        out.result()
      }

    walk(rootAddr, depth, rootNRec)
  }

  // ---- fractal heaps (FRHP / FHIB / FHDB) ----------------------------

  /** Fractal heap reader for MANAGED objects (direct blocks behind
    * the doubling table, checksums verified) and HUGE objects (values
    * past the max managed size, e.g. >4 KiB attribute blobs, indirect
    * via the heap's type-1 v2 B-tree). Tiny IDs (impossible for
    * link/attribute messages), directly-accessed huge objects,
    * filtered heaps and nested indirect blocks fail loudly by name.
    */
  private[hdf5] final class FractalHeap(hdrAddr: Long) {
    require(sig4(hdrAddr) == "FRHP", s"no fractal heap header at $hdrAddr")
    require(u8(hdrAddr + 4) == 0, s"unsupported FRHP version at $hdrAddr")
    val heapIdLen: Int = u16(hdrAddr + 5)
    private val ioFilterLen = u16(hdrAddr + 7)
    private val flags = u8(hdrAddr + 9)
    private val maxManagedObjSize = u32(hdrAddr + 10)
    private val managedSpace = u64(hdrAddr + 46)
    private val tableWidth = u16(hdrAddr + 110)
    private val startBlockSize = u64(hdrAddr + 112)
    private val maxDirectSize = u64(hdrAddr + 120)
    private val maxHeapBits = u16(hdrAddr + 128)
    private val rootBlockAddr = u64(hdrAddr + 132)
    private val curRowsRoot = u16(hdrAddr + 140)
    // no public API attaches a filter pipeline to link/attribute heap
    // creation (filters are dataset-creation-plist-only), so the only
    // fractal heaps this reader reaches are unfiltered by API
    // construction — evidence in scripts/h5residue_probe.py
    require(ioFilterLen == 0, s"filtered fractal heap unsupported at $hdrAddr " +
      "(unreachable for link/attribute storage — scripts/h5residue_probe.py)")
    locally {
      val s = u32(hdrAddr + 142)
      val c = Lookup3.hashU(bytes(hdrAddr, 142), 0)
      require(s == c, s"FRHP checksum mismatch at $hdrAddr")
    }
    private val offW = (maxHeapBits + 7) / 8
    private val lenW = encSize(maxManagedObjSize)
    // dense-link heaps size IDs minimally (1+offW+lenW = 7); dense-
    // attribute heaps request 8-byte IDs (H5A_DENSE_FHEAP_ID_LEN),
    // zero-padded past the flag/offset/length fields
    require(heapIdLen >= 1 + offW + lenW,
      s"fractal heap ID length $heapIdLen < 1+$offW+$lenW at $hdrAddr")
    private val checksummed = (flags & 0x02) != 0
    private val dblockHdrLen = 4 + 1 + 8 + offW + (if (checksummed) 4 else 0)

    /** doubling-table row size: rows 0 and 1 at the starting size,
      * then doubling per row.
      */
    private def rowSize(r: Int): Long =
      if (r < 2) startBlockSize else startBlockSize << (r - 1)

    /** (fileAddr | Undef, heapOffset, size) for every direct block, in
      * heap-space order.
      */
    private val directBlocks: Seq[(Long, Long, Long)] =
      if (curRowsRoot == 0) {
        // root IS a direct block; its size equals the heap's managed
        // space (one block spans the whole managed range)
        Seq((rootBlockAddr, 0L, managedSpace))
      } else {
        require(sig4(rootBlockAddr) == "FHIB",
          s"no root indirect block at $rootBlockAddr")
        require(u8(rootBlockAddr + 4) == 0,
          s"unsupported FHIB version at $rootBlockAddr")
        require(u64(rootBlockAddr + 5) == hdrAddr,
          s"FHIB header back-pointer mismatch at $rootBlockAddr")
        val maxDirectRows =
          (java.lang.Long.numberOfTrailingZeros(maxDirectSize)
            - java.lang.Long.numberOfTrailingZeros(startBlockSize)) + 2
        require(curRowsRoot <= maxDirectRows,
          s"fractal heap with nested indirect blocks unsupported at $hdrAddr " +
            s"($curRowsRoot rows > $maxDirectRows direct rows)")
        val entries = curRowsRoot * tableWidth
        val entriesStart = rootBlockAddr + 13 + offW
        val used = (13 + offW + entries.toLong * 8).toInt
        val s = u32(rootBlockAddr + used)
        val c = Lookup3.hashU(bytes(rootBlockAddr, used), 0)
        require(s == c, s"FHIB checksum mismatch at $rootBlockAddr")
        var off = 0L
        (0 until entries).map { i =>
          val sz = rowSize(i / tableWidth)
          val t = (u64(entriesStart + i.toLong * 8), off, sz)
          off += sz
          t
        }
      }

    // verify each ALLOCATED direct block once up front: signature,
    // back-pointer, stored block offset, and (if flagged) a checksum
    // computed over the whole block with the checksum field zeroed
    directBlocks.foreach { case (addr, off, size) =>
      if (addr != Undef) {
        require(sig4(addr) == "FHDB", s"no direct block at $addr")
        require(u8(addr + 4) == 0, s"unsupported FHDB version at $addr")
        require(u64(addr + 5) == hdrAddr,
          s"FHDB header back-pointer mismatch at $addr")
        require(uVar(addr + 13, offW) == off,
          s"FHDB block offset ${uVar(addr + 13, offW)} != expected $off at $addr")
        if (checksummed) {
          require(size <= Int.MaxValue, s"direct block too large at $addr")
          val img = bytes(addr, size.toInt)
          val stored = (img(13 + offW) & 0xFFL) | ((img(14 + offW) & 0xFFL) << 8) |
            ((img(15 + offW) & 0xFFL) << 16) | ((img(16 + offW) & 0xFFL) << 24)
          java.util.Arrays.fill(img, 13 + offW, 17 + offW, 0.toByte)
          val computed = Lookup3.hashU(img, 0)
          require(stored == computed, s"FHDB checksum mismatch at $addr")
        }
      }
    }

    private def idLe(id: Array[Byte], from: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (id(from + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }

    /** HUGE objects (> the heap's max managed size, e.g. a >4 KiB
      * attribute value) live OUTSIDE heap space, indirect through the
      * heap's type-1 v2 B-tree (record = address + length + huge ID;
      * address+length never fit an 7/8-byte ID, so libhdf5 always
      * goes indirect for these heaps). Keyed by the ID the heap ID's
      * trailing bytes carry.
      */
    private lazy val hugeBtAddr: Long = u64(hdrAddr + 22)
    private lazy val hugeObjects: Map[Long, (Long, Long)] =
      if (hugeBtAddr == Undef) Map.empty
      else v2BtreeRecords(hugeBtAddr, Set(1)).map { rec =>
        require(rec.length == 24,
          s"huge-object record size ${rec.length} != 24 at $hdrAddr")
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        bb.getLong(16) -> (bb.getLong(0), bb.getLong(8))
      }.toMap

    /** Absolute (file position, length) of any heap object — managed
      * (via direct blocks) or huge (via the type-1 B-tree). Tiny IDs
      * (objects inlined in the ID — never emitted for link/attribute
      * messages, which exceed the 6/7 spare ID bytes), reserved ID
      * types and directly-accessed huge objects fail loudly.
      */
    def objectPos(id: Array[Byte]): (Long, Long) = {
      require(id.length >= heapIdLen, s"short heap ID (${id.length} B)")
      val b0 = id(0) & 0xFF
      require((b0 & 0xC0) == 0, s"unsupported heap ID version ${(b0 >> 6) & 3}")
      (b0 >> 4) & 0x3 match {
        case 0 =>
          val off = idLe(id, 1, offW)
          val len = idLe(id, 1 + offW, lenW)
          (filePos(off, len), len)
        case 1 =>
          if (hugeBtAddr == Undef) fail(
            s"directly-accessed huge heap object unsupported (no type-1 b-tree at $hdrAddr)")
          val hugeId = idLe(id, 1, heapIdLen - 1)
          hugeObjects.getOrElse(hugeId,
            fail(s"huge object $hugeId not in the heap's type-1 b-tree"))
        // tiny IDs embed the object in the ID itself — capacity
        // heapIdLen-1 (6 B links / 7 B attrs, h5residue_probe.py
        // confirms against fixture bytes), below the smallest
        // serialized link (≥13 B) or attribute (≥11 B) message, so no
        // conforming writer can reach this arm for our heap consumers
        case 2 => fail("tiny fractal heap object unsupported " +
          "(structurally impossible for link/attribute heaps — " +
          "scripts/h5residue_probe.py)")
        case t => fail(s"reserved fractal heap ID type $t")
      }
    }

    /** File position of `len` object bytes at heap offset `off` —
      * offsets address heap space, where each direct block spans
      * [blockOffset, blockOffset + size) INCLUDING its header.
      */
    def filePos(off: Long, len: Long): Long = {
      val blk = directBlocks.find { case (_, bOff, bSz) =>
        off >= bOff + dblockHdrLen && off + len <= bOff + bSz
      }.getOrElse(fail(
        s"heap offset $off (+$len) outside any allocated direct block"))
      require(blk._1 != Undef, s"heap offset $off in an unallocated block")
      blk._1 + (off - blk._2)
    }
  }

  // ---- datasets --------------------------------------------------------

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int]) extends Layout
  /** layout v4, index type 1: the whole dataset is one chunk.
    * `filterMask` bit i set = pipeline filter i was skipped when this
    * chunk was written (H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS).
    */
  final case class SingleChunk(addr: Long, storedBytes: Long,
                               filterMask: Int, chunkDims: Seq[Int]) extends Layout
  /** layout v4, index type 2: unfiltered chunks at addr + i*chunkBytes. */
  final case class ImplicitIndex(addr: Long, chunkDims: Seq[Int]) extends Layout
  /** layout v4, index type 3: chunk addresses in a fixed array. */
  final case class FixedArray(headerAddr: Long, chunkDims: Seq[Int]) extends Layout
  /** layout v4, index type 4: chunk addresses in an extensible array —
    * what h5py emits for an APPENDABLE dataset (maxshape=(None,)), the
    * natural shape of an incrementally-written catalog.
    */
  final case class ExtensibleArray(headerAddr: Long, chunkDims: Seq[Int]) extends Layout
  /** layout v4, index type 5: chunk records in a v2 B-tree — h5py's
    * index for datasets appendable in more than one dimension.
    */
  final case class V2BtreeChunks(headerAddr: Long, chunkDims: Seq[Int]) extends Layout

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
      u8(x.dataOff) match {
        case 3 => u8(x.dataOff + 1) match {
          case 1 => Contiguous(u64(x.dataOff + 2), u64(x.dataOff + 10))
          case 2 =>
            val nd = u8(x.dataOff + 2) // ndims + 1
            val bt = u64(x.dataOff + 3)
            val cd = (0 until nd - 1).map(i => u32(x.dataOff + 11 + 4L * i).toInt)
            Chunked(bt, cd)
          case c => fail(s"unsupported layout class $c for $name")
        }
        case 4 => u8(x.dataOff + 1) match {
          case 1 => Contiguous(u64(x.dataOff + 2), u64(x.dataOff + 10))
          case 2 => parseChunkedV4(name, x.dataOff + 2)
          case c => fail(s"unsupported layout v4 class $c for $name")
        }
        case v => fail(s"unsupported data layout version $v for $name")
      }
    }.getOrElse(fail(s"dataset $name has no layout"))
    val filters = m(0x000B).map { x =>
      val v = u8(x.dataOff)
      val nf = u8(x.dataOff + 1)
      var p = x.dataOff + (if (v == 1) 8 else 2)
      (0 until nf).map { _ =>
        val id = u16(p)
        if (v == 1) {
          // v1 description: id(2) nameLen(2) flags(2) nClients(2),
          // name padded to 8, client data padded to an EVEN count
          val nameLen = u16(p + 2)
          val nCli = u16(p + 6)
          p += 8 + pad8(nameLen) + 4L * ((nCli + 1) / 2 * 2)
        } else {
          // v2 description: the Name Length field exists ONLY for
          // id ≥ 256 — for id < 256 the fixed part is id(2) flags(2)
          // nClients(2) = 6 bytes, and neither name nor client data
          // is padded. Reading nClients at p+6 there (the old parse)
          // lands INSIDE the first client-data word, so the advance
          // to the next description was garbage for any multi-filter
          // v2 pipeline (shuffle+deflate under libver='latest').
          val nameLen = if (id >= 256) u16(p + 2) else 0
          val nCli = u16(p + (if (id >= 256) 6 else 4))
          p += (if (id >= 256) 8 else 6) + nameLen + 4L * nCli
        }
        id
      }
    }.getOrElse(Nil)
    DatasetMeta(name, info.addr, space, dtype, layout, filters, info.attrs)
  }

  /** layout message v4, class 2 (chunked): variable-width chunk dims
    * (the trailing entry is the element size) + one of several chunk
    * index structures.
    */
  private def parseChunkedV4(name: String, off0: Long): Layout = {
    val flags = u8(off0)
    val nd = u8(off0 + 1) // rank + 1 (includes element-size dim)
    val encLen = u8(off0 + 2)
    require(encLen >= 1 && encLen <= 8,
      s"bad dim encoding width $encLen for $name")
    val dims = (0 until nd).map(i => uVar(off0 + 3 + i.toLong * encLen, encLen))
    val chunkDims = dims.dropRight(1).map(_.toInt) // drop element size
    var p = off0 + 3 + nd.toLong * encLen
    u8(p) match {
      case 1 => // single chunk; size+mask present iff the filtered bit set
        p += 1
        if ((flags & 0x02) != 0) {
          val size = u64(p); p += 8
          val mask = u32(p).toInt; p += 4
          SingleChunk(u64(p), size, mask, chunkDims)
        } else SingleChunk(u64(p), -1L, 0, chunkDims)
      case 2 => ImplicitIndex(u64(p + 1), chunkDims)
      case 3 => FixedArray(u64(p + 2), chunkDims) // skip page-bits byte
      case 4 =>
        // creation params (max bits, index elements, min pointers,
        // min elements, page bits) repeat in the EAHD header, which
        // is authoritative — skip the 5 bytes here
        ExtensibleArray(u64(p + 6), chunkDims)
      case 5 =>
        // creation params: node size (4) + split/merge percents (2)
        V2BtreeChunks(u64(p + 7), chunkDims)
      case t => fail(s"unsupported chunk index type $t for $name")
    }
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
      case chunked =>
        val chunkDims = chunked match {
          case Chunked(_, cd) => cd
          case SingleChunk(_, _, _, cd) => cd
          case ImplicitIndex(_, cd) => cd
          case FixedArray(_, cd) => cd
          case ExtensibleArray(_, cd) => cd
          case V2BtreeChunks(_, cd) => cd
          case _ => fail(s"unreachable layout for ${ds.name}")
        }
        // chunkDims excludes the trailing element-size entry: one per
        // dataset dimension
        require(chunkDims.size == ds.dims.size, s"chunk rank mismatch for ${ds.name}")
        require(ds.dims.size <= 1 ||
          chunkDims.tail.map(_.toLong) == ds.dims.tail,
          s"chunks splitting non-row dimensions unsupported (${ds.name})")
        val chunkRows = chunkDims.head
        val chunkBytes = (chunkDims.map(_.toLong).product * ds.dtype.byteSize).toInt
        chunkIndex(ds, chunkRows, chunkBytes).foreach {
          case (startRow, addr, nbytes, fMask) =>
            val cEnd = startRow + chunkRows
            if (cEnd > row0 && startRow < row1 && addr != Undef) {
              val raw = bytes(addr, nbytes)
              val data = applyFilters(raw, ds.filters, fMask, ds.dtype.byteSize, chunkBytes)
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

  /** Unified chunk enumeration: (startRow, fileAddr, storedBytes,
    * filterMask) for every chunked layout flavor. Mask bit i set =
    * pipeline filter i skipped for that chunk (libhdf5 writes partial
    * edge chunks unfiltered under
    * H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS).
    */
  private def chunkIndex(ds: DatasetMeta, chunkRows: Int,
                         chunkBytes: Int): Seq[(Long, Long, Int, Int)] = ds.layout match {
    case Chunked(btreeAddr, _) => collectChunks(btreeAddr, ds.dims.size.max(1))
    case SingleChunk(addr, storedBytes, fMask, _) =>
      val n = if (storedBytes >= 0) storedBytes.toInt else chunkBytes
      Seq((0L, addr, n, fMask))
    case ImplicitIndex(base, _) =>
      require(ds.filters.isEmpty, s"filters with implicit chunk index (${ds.name})")
      val nChunks = ((ds.rows + chunkRows - 1) / chunkRows).toInt
      (0 until nChunks).map(i =>
        (i.toLong * chunkRows, base + i.toLong * chunkBytes, chunkBytes, 0))
    case FixedArray(hdrAddr, _) => fixedArrayChunks(ds, hdrAddr, chunkRows, chunkBytes)
    case ExtensibleArray(hdrAddr, _) =>
      extensibleArrayChunks(ds, hdrAddr, chunkRows, chunkBytes)
    case V2BtreeChunks(hdrAddr, _) =>
      v2BtreeChunks(ds, hdrAddr, chunkRows, chunkBytes)
    case other => fail(s"not a chunked layout: $other")
  }

  /** Extensible Array chunk index (layout v4 type 4): EAHD header +
    * EAIB index block (+ EADB data blocks), all checksum-verified.
    * Client 0 = unfiltered chunk addresses; client 1 = (address,
    * stored size, filter mask). The first `idxBlkElmts` elements live
    * inline in the index block; later elements live in data blocks
    * whose geometry follows the super-block doubling rule (super
    * block u holds 2^(u/2) data blocks of minElmts*2^((u+1)/2)
    * elements each); the index block points directly at the data
    * blocks of the first super blocks (2*(minPtrs-1) of them), later
    * ones hang off secondary EASB blocks. Super-block data blocks
    * larger than one page (2^pageBits elements) are PAGED — prefix +
    * checksum, per-page element runs with own checksums, page-init
    * bitmap in the owning EASB — the shape an appendable dataset
    * reaches past ~100k chunks at libhdf5's default geometry. Only
    * the (never emitted by libhdf5) paged index-block-pointed shape
    * fails loudly by name.
    */
  private def extensibleArrayChunks(ds: DatasetMeta, hdrAddr: Long,
                                    chunkRows: Int, chunkBytes: Int): Seq[(Long, Long, Int, Int)] = {
    require(sig4(hdrAddr) == "EAHD", s"no extensible-array header at $hdrAddr (${ds.name})")
    require(u8(hdrAddr + 4) == 0, s"unsupported EAHD version (${ds.name})")
    val clientId = u8(hdrAddr + 5)
    require(clientId == 0 || clientId == 1,
      s"unsupported extensible-array client $clientId (${ds.name})")
    val elemSize = u8(hdrAddr + 6)
    val maxBits = u8(hdrAddr + 7)
    val idxElmts = u8(hdrAddr + 8)
    val minElmts = u8(hdrAddr + 9)
    val minPtrs = u8(hdrAddr + 10)
    val pageBits = u8(hdrAddr + 11)
    // 6 L-sized stats at +12 (nsblks, sblk size, ndblks, dblk size,
    // max index set, nelements) — informational, not needed here
    val iblockAddr = u64(hdrAddr + 60)
    locally {
      val s = u32(hdrAddr + 68)
      val c = Lookup3.hashU(bytes(hdrAddr, 68), 0)
      require(s == c, s"EAHD checksum mismatch at $hdrAddr (${ds.name})")
    }
    val szW = elemSize - 12
    if (clientId == 0) require(elemSize == 8,
      s"unexpected unfiltered EA element size $elemSize (${ds.name})")
    else require(szW >= 1 && szW <= 8,
      s"unsupported EA chunk-size width $szW (${ds.name})")
    require(minElmts > 0 && (minElmts & (minElmts - 1)) == 0 &&
        minPtrs > 0 && (minPtrs & (minPtrs - 1)) == 0,
      s"non-power-of-two EA geometry (${ds.name})")
    // super-block doubling rule (H5EA): sblk u -> 2^(u/2) data blocks
    // of minElmts * 2^((u+1)/2) elements each
    def sblkNDblks(u: Int): Int = 1 << (u / 2)
    def sblkDblkNelmts(u: Int): Long = minElmts.toLong << ((u + 1) / 2)
    val nsblks = 1 + (maxBits - encLog2(minElmts)) / 2
    val ndblkAddrs = 2 * (minPtrs - 1)
    // index block covers exactly the first `directRows` super-block
    // rows, whose data blocks sum to ndblkAddrs direct pointers; rows
    // >= directRows live behind EASB super blocks
    val directRows = {
      var k = 0; var sum = 0
      while (sum < ndblkAddrs && k < nsblks) { sum += sblkNDblks(k); k += 1 }
      require(sum == ndblkAddrs,
        s"EA geometry mismatch: $sum direct data blocks != $ndblkAddrs (${ds.name})")
      k
    }
    val nsblkAddrs = nsblks - directRows
    require(sig4(iblockAddr) == "EAIB", s"no EA index block at $iblockAddr (${ds.name})")
    require(u8(iblockAddr + 4) == 0 && u8(iblockAddr + 5) == clientId,
      s"EAIB version/client mismatch at $iblockAddr (${ds.name})")
    require(u64(iblockAddr + 6) == hdrAddr,
      s"EAIB header back-pointer mismatch at $iblockAddr (${ds.name})")
    val ibElems = iblockAddr + 14
    val ibDblks = ibElems + idxElmts.toLong * elemSize
    val ibUsed = (14 + idxElmts.toLong * elemSize + (ndblkAddrs + nsblkAddrs).toLong * 8).toInt
    locally {
      val s = u32(iblockAddr + ibUsed)
      val c = Lookup3.hashU(bytes(iblockAddr, ibUsed), 0)
      require(s == c, s"EAIB checksum mismatch at $iblockAddr (${ds.name})")
    }
    def decodeElem(off: Long, chunkIdx: Int): Option[(Long, Long, Int, Int)] = {
      val addr = u64(off)
      if (addr == Undef) None
      else if (clientId == 0) Some((chunkIdx.toLong * chunkRows, addr, chunkBytes, 0))
      else {
        val stored = uVar(off + 8, szW)
        require(stored <= Int.MaxValue,
          s"stored chunk size $stored B exceeds Int range (${ds.name})")
        val mask = u32(off + 8 + szW).toInt
        Some((chunkIdx.toLong * chunkRows, addr, stored.toInt, mask))
      }
    }

    val nChunksL = (ds.rows + chunkRows - 1) / chunkRows
    require(nChunksL <= Int.MaxValue,
      s"extensible-array chunk count $nChunksL exceeds Int range (${ds.name})")
    val nChunks = nChunksL.toInt
    val offW = (maxBits + 7) / 8

    // JVM long shifts wrap at 64 bits, and page byte counts are
    // buffered through Int — an absurd pageBits would alias to tiny
    // pages (or truncate pageBytes to 0) instead of failing, so refuse
    // it by name like the fixed-array path does
    require(pageBits < 63,
      s"unsupported extensible-array pageBits $pageBits (${ds.name})")
    val pageElems = 1L << pageBits
    require(pageElems <= Int.MaxValue / elemSize,
      s"extensible-array page size ($pageElems elems * $elemSize B) too " +
        s"large to buffer (${ds.name})")
    def nPagesOf(ne: Long): Int = if (ne > pageElems) (ne / pageElems).toInt else 0

    // super blocks (EASB) are lazily located + verified once each:
    // sblk ordinal s (row directRows + s) -> (address of its
    // data-block-pointer region, page-init bitmap), or None if
    // unallocated. Rows whose data blocks exceed one page are PAGED:
    // the EASB carries the init bitmap for ALL its data blocks' pages
    // (bit = dblk_in_sblk * npages + page, MSB-first per libhdf5's
    // H5VM_bit_get), the data blocks store only prefix + checksum,
    // and elements live in per-page runs with own checksums — the
    // shape an appendable dataset reaches past ~100k chunks at
    // libhdf5's default chunk-EA geometry.
    val sblkCache = scala.collection.mutable.Map[Int, Option[(Long, Array[Byte])]]()
    def superBlock(s: Int, row: Int, firstElem: Long): Option[(Long, Array[Byte])] =
      sblkCache.getOrElseUpdate(s, {
        require(s < nsblkAddrs,
          s"chunk beyond extensible-array capacity (super block $s of $nsblkAddrs, ${ds.name})")
        val addr = u64(ibDblks + (ndblkAddrs + s).toLong * 8)
        if (addr == Undef) None
        else {
          require(sig4(addr) == "EASB", s"no EA super block at $addr (${ds.name})")
          require(u8(addr + 4) == 0 && u8(addr + 5) == clientId,
            s"EASB version/client mismatch at $addr (${ds.name})")
          require(u64(addr + 6) == hdrAddr,
            s"EASB header back-pointer mismatch at $addr (${ds.name})")
          require(uVar(addr + 14, offW) == firstElem,
            s"EASB block offset ${uVar(addr + 14, offW)} != expected $firstElem (${ds.name})")
          val nDb = sblkNDblks(row)
          val nPg = nPagesOf(sblkDblkNelmts(row))
          val bmBytes = if (nPg > 0) (nDb * nPg + 7) / 8 else 0
          val used = (14 + offW + bmBytes + nDb.toLong * 8).toInt
          val st = u32(addr + used)
          val c = Lookup3.hashU(bytes(addr, used), 0)
          require(st == c, s"EASB checksum mismatch at $addr (${ds.name})")
          val bitmap =
            if (bmBytes > 0) bytes(addr + 14 + offW, bmBytes)
            else Array.empty[Byte]
          Some((addr + 14 + offW + bmBytes, bitmap))
        }
      })

    // data blocks are lazily located: (dblk ordinal) -> (element
    // region address — or, for PAGED blocks, the first page's address
    // — and the paged flag), verified once each. `slot` is the file
    // offset of the block's 8-byte address — in the index block for
    // the first ndblkAddrs blocks, inside an EASB beyond them. A
    // paged block's own checksum covers only its prefix; element
    // pages are verified individually on first touch below.
    val dblkCache = scala.collection.mutable.Map[Int, Option[(Long, Boolean)]]()
    def dataBlock(ord: Int, slot: Long, firstElem: Long,
                  nelmts: Long): Option[(Long, Boolean)] =
      dblkCache.getOrElseUpdate(ord, {
        val addr = u64(slot)
        if (addr == Undef) None
        else {
          require(sig4(addr) == "EADB", s"no EA data block at $addr (${ds.name})")
          require(u8(addr + 4) == 0 && u8(addr + 5) == clientId,
            s"EADB version/client mismatch at $addr (${ds.name})")
          require(u64(addr + 6) == hdrAddr,
            s"EADB header back-pointer mismatch at $addr (${ds.name})")
          require(uVar(addr + 14, offW) == firstElem,
            s"EADB block offset ${uVar(addr + 14, offW)} != expected $firstElem (${ds.name})")
          if (nPagesOf(nelmts) == 0) {
            val used = (14 + offW + nelmts * elemSize).toInt
            val s = u32(addr + used)
            val c = Lookup3.hashU(bytes(addr, used), 0)
            require(s == c, s"EADB checksum mismatch at $addr (${ds.name})")
            Some((addr + 14 + offW, false))
          } else {
            val used = 14 + offW
            val s = u32(addr + used)
            val c = Lookup3.hashU(bytes(addr, used), 0)
            require(s == c, s"EADB prefix checksum mismatch at $addr (${ds.name})")
            Some((addr + used + 4, true))
          }
        }
      })

    // per-page checksum verification, once per touched page
    val pageBytes = (pageElems * elemSize).toInt
    val pageOk = scala.collection.mutable.Set[(Int, Int)]()
    def verifyPage(ord: Int, pagesBase: Long, pg: Int): Unit =
      if (!pageOk((ord, pg))) {
        val pAddr = pagesBase + pg.toLong * (pageBytes + 4)
        val s = u32(pAddr + pageBytes)
        val c = Lookup3.hashU(bytes(pAddr, pageBytes), 0)
        require(s == c,
          s"EA data-block page checksum mismatch at $pAddr (${ds.name})")
        pageOk += ((ord, pg))
      }

    (0 until nChunks).flatMap { i =>
      if (i < idxElmts) decodeElem(ibElems + i.toLong * elemSize, i)
      else {
        // walk super blocks to find the data block holding element i
        var j = (i - idxElmts).toLong
        var u = 0
        var ord = 0
        var firstElem = idxElmts.toLong
        var found: Option[(Long, Long, Int, Int)] = None
        var done = false
        while (!done) {
          require(u < nsblks, s"chunk $i beyond extensible-array capacity (${ds.name})")
          val ne = sblkDblkNelmts(u)
          val cap = sblkNDblks(u).toLong * ne
          if (j < cap) {
            val dInRow = (j / ne).toInt
            val d = ord + dInRow
            val dFirst = firstElem + (j / ne) * ne
            // rows below directRows resolve through the index block's
            // direct pointers; later rows through their EASB (a row
            // never straddles the two — the geometry check above
            // guarantees direct pointers end exactly at a row break).
            // Paged data blocks can only hang off an EASB (which holds
            // their page-init bitmap); libhdf5 never pages the
            // index-block-pointed blocks, so that shape fails loudly.
            // …and the format gives it nowhere else to live: the Page
            // Bitmap field exists ONLY in the super-block layout, so
            // this shape is unrepresentable, not merely unemitted
            // (scripts/h5residue_probe.py)
            if (u < directRows) require(nPagesOf(ne) == 0,
              s"paged index-block-pointed EA data blocks unsupported (${ds.name} — " +
                "unrepresentable: no Page Bitmap outside super blocks, " +
                "scripts/h5residue_probe.py)")
            val slotAndBm: Option[(Long, Array[Byte])] =
              if (u < directRows) Some((ibDblks + d.toLong * 8, Array.empty[Byte]))
              else superBlock(u - directRows, u, firstElem)
                .map { case (ptrRegion, bm) => (ptrRegion + dInRow.toLong * 8, bm) }
            found = slotAndBm.flatMap { case (sl, bm) =>
              dataBlock(d, sl, dFirst, ne).flatMap { case (baseAddr, paged) =>
                val idx = j % ne
                if (!paged) decodeElem(baseAddr + idx * elemSize, i)
                else {
                  val nPg = nPagesOf(ne)
                  val pg = (idx / pageElems).toInt
                  if (!bitGet(bm, dInRow * nPg + pg)) None // page never written
                  else {
                    verifyPage(d, baseAddr, pg)
                    decodeElem(baseAddr + pg.toLong * (pageBytes + 4)
                      + (idx % pageElems) * elemSize, i)
                  }
                }
              }
            }
            done = true
          } else {
            j -= cap; ord += sblkNDblks(u); firstElem += cap; u += 1
          }
        }
        found
      }
    }
  }

  private def encLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Page-init bitmap bit addressing shared by the paged fixed-array
    * and extensible-array readers: MSB-first within each byte,
    * mirroring libhdf5's `H5VM_bit_get` (`1 << (7 - offset % 8)`) —
    * the convention real FA/EA page bitmaps carry on disk.
    */
  private def bitGet(bitmap: Array[Byte], i: Int): Boolean =
    (bitmap(i >> 3) & (1 << (7 - (i & 7)))) != 0

  /** v2-B-tree chunk index (layout v4 type 5): record type 10
    * (unfiltered: address + scaled offset per dimension) or 11
    * (filtered: address + stored size + filter mask + scaled
    * offsets). Scaled offsets are chunk-grid coordinates; this reader
    * requires chunks to span non-row dimensions, so only offset 0
    * (the row axis) varies.
    */
  private def v2BtreeChunks(ds: DatasetMeta, hdrAddr: Long,
                            chunkRows: Int, chunkBytes: Int): Seq[(Long, Long, Int, Int)] = {
    val rank = ds.dims.size.max(1)
    val filtered = ds.filters.nonEmpty
    val recs = v2BtreeRecords(hdrAddr, Set(if (filtered) 11 else 10))
    recs.map { rec =>
      val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
      val addr = bb.getLong(0)
      if (!filtered) {
        require(rec.length == 8 + 8 * rank,
          s"v2 b-tree chunk record size ${rec.length} != ${8 + 8 * rank} (${ds.name})")
        val scaled0 = bb.getLong(8)
        (scaled0 * chunkRows, addr, chunkBytes, 0)
      } else {
        val szW = rec.length - 12 - 8 * rank
        require(szW >= 1 && szW <= 8,
          s"unsupported v2 b-tree chunk-size width $szW (${ds.name})")
        var stored = 0L
        var i = 0
        while (i < szW) { stored |= (rec(8 + i) & 0xFFL) << (8 * i); i += 1 }
        require(stored <= Int.MaxValue,
          s"stored chunk size $stored B exceeds Int range (${ds.name})")
        val mask = bb.getInt(8 + szW)
        val scaled0 = ByteBuffer.wrap(rec, 12 + szW, 8)
          .order(ByteOrder.LITTLE_ENDIAN).getLong
        (scaled0 * chunkRows, addr, stored.toInt, mask)
      }
    }
  }

  /** Fixed Array chunk index (layout v4 type 3): FAHD header + FADB
    * data block, both checksum-verified. Client 0 = unfiltered chunk
    * addresses; client 1 = (address, stored size, filter mask)
    * triples. Data blocks with more entries than one page (2^pageBits)
    * are PAGED: a bitmap of initialized pages follows the prefix, then
    * per-page element runs each with its own checksum — the layout a
    * modern toolchain emits for any dataset past ~1024 chunks.
    */
  private def fixedArrayChunks(ds: DatasetMeta, hdrAddr: Long, chunkRows: Int,
                               chunkBytes: Int): Seq[(Long, Long, Int, Int)] = {
    require(new String(bytes(hdrAddr, 4), "US-ASCII") == "FAHD",
      s"no fixed-array header at $hdrAddr (${ds.name})")
    require(u8(hdrAddr + 4) == 0, s"unsupported FAHD version (${ds.name})")
    val clientId = u8(hdrAddr + 5)
    require(clientId == 0 || clientId == 1,
      s"unsupported fixed-array client $clientId (${ds.name})")
    val entrySize = u8(hdrAddr + 6)
    val pageBits = u8(hdrAddr + 7)
    val maxEntries = u64(hdrAddr + 8)
    val dbAddr = u64(hdrAddr + 16)
    val hStored = u32(hdrAddr + 24)
    val hComputed = Lookup3.hashU(bytes(hdrAddr, 24), 0)
    require(hStored == hComputed, s"FAHD checksum mismatch at $hdrAddr (${ds.name})")
    require(new String(bytes(dbAddr, 4), "US-ASCII") == "FADB",
      s"no fixed-array data block at $dbAddr (${ds.name})")
    require(u8(dbAddr + 4) == 0 && u8(dbAddr + 5) == clientId,
      s"FADB version/client mismatch at $dbAddr (${ds.name})")
    val prefixLen = 14 // sig(4) + version(1) + client(1) + hdr addr(8)
    val nChunksL = (ds.rows + chunkRows - 1) / chunkRows
    require(nChunksL <= Int.MaxValue,
      s"fixed-array chunk count $nChunksL exceeds Int range (${ds.name})")
    val nChunks = nChunksL.toInt
    require(nChunks <= maxEntries,
      s"fixed array too small for ${ds.name}: $nChunks chunks > $maxEntries entries")
    // this reader buffers each checksum region in one array — a >2 GiB
    // index would silently truncate through .toInt, so refuse it by
    // name instead (fail-loudly convention)
    require(prefixLen + maxEntries * entrySize <= Int.MaxValue,
      s"fixed-array index region ${maxEntries * entrySize} B too large " +
        s"to buffer (${ds.name})")

    def entry(e: Long, i: Int): (Long, Long, Int, Int) =
      if (clientId == 0) (i.toLong * chunkRows, u64(e), chunkBytes, 0)
      else {
        // entry = address(8) + stored size(entrySize-12) + filter
        // mask(4); real HDF5 sizes the stored-size field MINIMALLY
        // (3 bytes for chunks in [64 KB, 16 MB) etc.) — any width 1..8
        val szW = entrySize - 12
        if (szW < 1 || szW > 8)
          fail(s"unsupported chunk-size width $szW (${ds.name})")
        val stored = uVar(e + 8, szW)
        require(stored <= Int.MaxValue,
          s"stored chunk size $stored B exceeds Int range (${ds.name})")
        (i.toLong * chunkRows, u64(e), stored.toInt, u32(e + 8 + szW).toInt)
      }

    // JVM long shifts wrap at 64 bits: an absurd pageBits would alias
    // to a tiny page size instead of failing — refuse it by name
    require(pageBits < 63, s"unsupported fixed-array pageBits $pageBits (${ds.name})")
    val pageSize = 1L << pageBits
    if (maxEntries <= pageSize) {
      // unpaged: elements inline, one checksum over prefix+elements
      val elems = dbAddr + prefixLen
      val dStored = u32(elems + maxEntries * entrySize)
      val dComputed = Lookup3.hashU(
        bytes(dbAddr, (prefixLen + maxEntries * entrySize).toInt), 0)
      require(dStored == dComputed, s"FADB checksum mismatch at $dbAddr (${ds.name})")
      (0 until nChunks).map(i => entry(elems + i.toLong * entrySize, i))
    } else {
      // paged: prefix + initialized-page bitmap + checksum, then page
      // runs (elements + per-page checksum; last page truncated)
      val nPages = ((maxEntries + pageSize - 1) / pageSize).toInt
      val bitmapBytes = (nPages + 7) / 8
      val dStored = u32(dbAddr + prefixLen + bitmapBytes)
      val dComputed = Lookup3.hashU(bytes(dbAddr, prefixLen + bitmapBytes), 0)
      require(dStored == dComputed,
        s"paged FADB checksum mismatch at $dbAddr (${ds.name})")
      val bitmap = bytes(dbAddr + prefixLen, bitmapBytes)
      def pageInit(p: Int): Boolean = bitGet(bitmap, p)
      def pageEntries(p: Int): Long =
        math.min(pageSize, maxEntries - p.toLong * pageSize)
      val pagesStart = dbAddr + prefixLen + bitmapBytes + 4
      // page offsets accumulate truncated-last-page sizes
      val pageOff = new Array[Long](nPages)
      var off = pagesStart
      (0 until nPages).foreach { p =>
        pageOff(p) = off
        off += pageEntries(p) * entrySize + 4
      }
      // verify each INITIALIZED page's checksum once up front
      (0 until nPages).filter(pageInit).foreach { p =>
        val len = (pageEntries(p) * entrySize).toInt
        val s = u32(pageOff(p) + len)
        val c = Lookup3.hashU(bytes(pageOff(p), len), 0)
        require(s == c,
          s"fixed-array page $p checksum mismatch at ${pageOff(p)} (${ds.name})")
      }
      (0 until nChunks).flatMap { i =>
        val p = (i / pageSize).toInt
        if (!pageInit(p)) None // uninitialized page: no allocated chunks
        else Some(entry(pageOff(p) + (i % pageSize) * entrySize, i))
      }
    }
  }

  /** Chunk index: (startRow, fileAddr, storedBytes, filterMask) from
    * the v1 B-tree (key = chunk size, filter mask, scaled offsets).
    */
  private def collectChunks(addr: Long, rank: Int): Seq[(Long, Long, Int, Int)] = {
    require(new String(bytes(addr, 4), "US-ASCII") == "TREE",
      s"no chunk b-tree at $addr")
    require(u8(addr + 4) == 1, s"wrong b-tree type for chunks at $addr")
    val level = u8(addr + 5)
    val n = u16(addr + 6)
    val keySize = 8 + 8 * (rank + 1)
    val out = Seq.newBuilder[(Long, Long, Int, Int)]
    var p = addr + 24
    (0 until n).foreach { _ =>
      val nbytes = u32(p).toInt
      val fMask = u32(p + 4).toInt
      val startRow = u64(p + 8)
      val child = u64(p + keySize)
      if (level > 0) out ++= collectChunks(child, rank)
      else out += ((startRow, child, nbytes, fMask))
      p += keySize + 8
    }
    out.result()
  }

  /** Decode one chunk through the dataset's filter pipeline. `mask`
    * bit i set means filter i was SKIPPED when the chunk was written
    * (libhdf5 stores partial edge chunks raw under
    * H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS) — honoring it keeps
    * spec-valid files readable instead of feeding raw bytes to the
    * inflater.
    */
  private def applyFilters(raw: Array[Byte], filters: Seq[Int], mask: Int,
                           elemSize: Int, chunkBytes: Int): Array[Byte] = {
    // pipeline applies in reverse on read
    filters.zipWithIndex.reverse.foldLeft(raw) { case (data, (id, i)) =>
      if ((mask & (1 << i)) != 0) data
      else id match {
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
    try {
      while (!inf.finished() && off < outSize) {
        val n = inf.inflate(out, off, outSize - off)
        // a TRUNCATED stream makes inflate() return 0 with the
        // inflater asking for more input — without this check the
        // loop spins forever (wedging a Spark task) instead of
        // failing loudly like every other corruption path here
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          fail(s"truncated or corrupt deflate stream: " +
            s"${data.length} compressed bytes produced $off of $outSize")
        off += n
      }
      out
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"corrupt deflate stream (${e.getMessage}): " +
          s"${data.length} compressed bytes, expected $outSize out")
    } finally inf.end()
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

  /** HDF5's "undefined address" sentinel (all ones). */
  val Undef: Long = -1L

  def cstr(b: Array[Byte]): String = {
    val i = b.indexOf(0.toByte)
    new String(if (i < 0) b else b.take(i), "UTF-8")
  }

  def fail(msg: String): Nothing = throw new Hdf5FormatException(msg)
}

/** Bob Jenkins' lookup3 hash (`hashlittle`), the checksum HDF5 uses
  * for v2/v3 superblocks, v2 object headers and the v4 chunk-index
  * structures — public domain algorithm, published at
  * https://burtleburtle.net/bob/c/lookup3.c and specified by the HDF5
  * format document. Implemented from the published description; the
  * spec's own test vectors are asserted in Hdf5Spec.
  */
object Lookup3 {
  private def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))

  /** hashlittle(data, initval) — returns the 32-bit `c` word. */
  def hash(data: Array[Byte], init: Int): Int = {
    var a = 0xdeadbeef + data.length + init
    var b = a
    var c = a
    var i = 0
    def w(off: Int, n: Int): Int = {
      var v = 0; var j = 0
      while (j < n) { v |= (data(off + j) & 0xFF) << (8 * j); j += 1 }
      v
    }
    while (data.length - i > 12) {
      a += w(i, 4); b += w(i + 4, 4); c += w(i + 8, 4)
      // mix(a,b,c)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12
    }
    val rem = data.length - i
    if (rem == 0) return c // per lookup3: zero tail skips final()
    a += w(i, math.min(rem, 4))
    if (rem > 4) b += w(i + 4, math.min(rem - 4, 4))
    if (rem > 8) c += w(i + 8, rem - 8)
    // final(a,b,c)
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** Convenience: unsigned value as Long for comparison with u32 reads. */
  def hashU(data: Array[Byte], init: Int): Long = hash(data, init) & 0xFFFFFFFFL
}

final class Hdf5FormatException(msg: String) extends RuntimeException(msg)
