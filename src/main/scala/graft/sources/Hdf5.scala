package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Pure-JVM reader for the HDF5 subset that netCDF-4 files are built
  * from — the container real ERA5 downloads ship in today (the classic
  * CDF-1/2 path is [[NetCdf3]]; [[Ingest.era5CellSeries]] dispatches on
  * the magic bytes). Implements the PUBLIC on-disk format (HDF5 File
  * Format Specification v2/v3, hdfgroup.org):
  *
  *  - superblock version 0/1 (what libhdf5 writes by default, and
  *    therefore what netcdf-c produces) and version 2/3 (libver-latest
  *    writers);
  *  - old-style groups: B-tree v1 ('TREE' type 0) over 'SNOD' symbol
  *    nodes with names in a local heap ('HEAP') — the netcdf-c group
  *    encoding; one level is walked recursively so nested groups work;
  *  - version-1 AND version-2 ('OHDR') object headers, with
  *    continuation blocks;
  *  - messages: dataspace (v1/v2), datatype (fixed-point, IEEE float,
  *    and fixed-size strings), data layout v3 (contiguous + chunked),
  *    filter pipeline v1/v2 (deflate = zlib via j.u.zip.Inflater,
  *    shuffle; fletcher32 checksums are skipped, not verified),
  *    attributes v1/v2/v3, symbol table, link (v2 groups), NIL —
  *    everything else is skipped by its declared length;
  *  - chunk index: B-tree v1 ('TREE' type 1), any depth.
  *
  * Out of scope, detected and rejected with clear errors rather than
  * misread: fractal-heap "new style" group link storage, szip/other
  * filters, variable-length and compound datatypes (netCDF-4's
  * DIMENSION_LIST attribute is vlen — it is skipped as opaque, and
  * [[Ingest]] resolves axes by coordinate length instead), datasets
  * larger than 2 GiB per read.
  *
  * Scale shape: like [[NetCdf3]], parsing is header-only — grid
  * variables are read by POINT ACCESS with a per-call decompressed-
  * chunk cache, so a cell-series extract touches O(series/chunk) chunks
  * and the full grid is never materialized. The whole reader is
  * Spark-free and runs inside executor tasks (binaryFile →
  * mapPartitions, see Ingest.fromEra5NetCdfDir).
  */
object Hdf5 {

  private val Magic = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFF… = "undefined address"

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && Magic.indices.forall(i => bytes(i) == Magic(i))

  // -------------------------------------------------------------------
  // Model

  /** Datatype: class 0 = fixed-point, 1 = float, 3 = string. */
  final case class DType(clazz: Int, size: Int, littleEndian: Boolean, signed: Boolean)

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** `chunkDims` excludes the trailing element-size pseudo-dimension. */
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int]) extends Layout
  case object NoData extends Layout

  final case class Filter(id: Int, clientValues: Seq[Int])

  final case class H5Var(
      name: String,
      shape: Seq[Long],
      dtype: DType,
      layout: Layout,
      filters: Seq[Filter],
      attrs: Map[String, Any]) // String | Array[Double]

  final case class H5File(vars: Seq[H5Var], bytes: Array[Byte]) {
    def variable(names: String*): H5Var =
      names.flatMap(n => vars.find(_.name == n)).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"variable not found: ${names.mkString("/")} (have ${vars.map(_.name).mkString(",")})"))
  }

  // -------------------------------------------------------------------
  // Low-level cursor (HDF5 is little-endian on disk)

  private final class Cur(val bytes: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = bb(2).getShort & 0xffff; v }
    def u32(): Long = { val v = bb(4).getInt & 0xffffffffL; v }
    def u64(): Long = bb(8).getLong
    def skip(n: Int): Unit = pos += n
    def raw(n: Int): Array[Byte] = { val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a }
    private def bb(n: Int): ByteBuffer = {
      val b = ByteBuffer.wrap(bytes, pos, n).order(ByteOrder.LITTLE_ENDIAN)
      pos += n
      b
    }
  }

  // -------------------------------------------------------------------
  // Parse: superblock → root group → datasets

  def parse(bytes: Array[Byte]): H5File = {
    require(isHdf5(bytes), "not an HDF5 file (bad signature)")
    val c = new Cur(bytes, 8)
    val sbVersion = c.u8()
    val rootHeaderAddr = sbVersion match {
      case 0 | 1 =>
        c.skip(1 + 1 + 1 + 1) // freespace ver, root-ST ver, reserved, shared-msg ver
        val sizeOfOffsets = c.u8(); val sizeOfLengths = c.u8()
        require(sizeOfOffsets == 8 && sizeOfLengths == 8,
          s"only 8-byte offsets/lengths supported (got $sizeOfOffsets/$sizeOfLengths)")
        c.skip(1) // reserved
        c.skip(2 + 2 + 4) // leaf k, internal k, consistency flags
        if (sbVersion == 1) c.skip(2 + 2) // indexed-storage k + reserved
        c.skip(8 * 4) // base, freespace, EOF, driver info
        // root group symbol table entry
        c.u64() // link name offset
        val hdr = c.u64()
        hdr
      case 2 | 3 =>
        val sizeOfOffsets = c.u8(); val sizeOfLengths = c.u8()
        require(sizeOfOffsets == 8 && sizeOfLengths == 8, "only 8-byte offsets/lengths supported")
        c.skip(1) // consistency flags
        c.skip(8 * 3) // base, extension, EOF
        val hdr = c.u64()
        hdr
      case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
    }
    val vars = mutable.ArrayBuffer[H5Var]()
    walkGroup(bytes, rootHeaderAddr, prefix = "", vars, depth = 0)
    H5File(vars.toSeq, bytes)
  }

  /** Parse the object at `addr`; datasets are appended to `out`, groups
    * recursed into (names joined with '/'). */
  private def walkGroup(bytes: Array[Byte], addr: Long, prefix: String,
      out: mutable.ArrayBuffer[H5Var], depth: Int): Unit = {
    require(depth < 16, "group nesting too deep (cycle?)")
    val obj = readObjectHeader(bytes, addr)
    if (obj.isDataset) {
      out += H5Var(prefix.stripSuffix("/"), obj.shape, obj.dtype.get,
        obj.layout.getOrElse(NoData), obj.filters, obj.attrs.toMap)
    } else {
      // old-style group: symbol-table message → B-tree v1 of SNODs
      for ((btree, heap) <- obj.symbolTable) {
        val names = mutable.ArrayBuffer[(String, Long)]()
        collectSnodEntries(bytes, btree, heap, names)
        names.foreach { case (name, childAddr) =>
          walkGroup(bytes, childAddr, s"$prefix$name/", out, depth + 1)
        }
      }
      // new-style group: hard Link messages carried in the header
      obj.links.foreach { case (name, childAddr) =>
        walkGroup(bytes, childAddr, s"$prefix$name/", out, depth + 1)
      }
      if (obj.symbolTable.isEmpty && obj.links.isEmpty && obj.usesFractalHeap)
        throw new IllegalArgumentException(
          "HDF5 dense (fractal-heap) group link storage is not supported")
    }
  }

  private def collectSnodEntries(bytes: Array[Byte], btreeAddr: Long, heapAddr: Long,
      out: mutable.ArrayBuffer[(String, Long)]): Unit = {
    val heapDataAddr = {
      val h = new Cur(bytes, btSafe(heapAddr))
      require(h.raw(4).sameElements("HEAP".getBytes), "bad local heap signature")
      h.skip(1 + 3) // version + reserved
      h.u64(); h.u64() // data size, free list head
      h.u64()
    }
    def heapString(off: Long): String = {
      var i = (heapDataAddr + off).toInt
      val start = i
      while (bytes(i) != 0) i += 1
      new String(bytes, start, i - start, StandardCharsets.UTF_8)
    }
    def walk(addr: Long): Unit = {
      val c = new Cur(bytes, btSafe(addr))
      require(c.raw(4).sameElements("TREE".getBytes), "bad group B-tree signature")
      val nodeType = c.u8(); val level = c.u8(); val entries = c.u16()
      require(nodeType == 0, s"expected group B-tree (type 0), got $nodeType")
      c.u64(); c.u64() // siblings
      // keys and children interleave: key0, child0, key1, child1, … keyN
      val children = (0 until entries).map { _ => c.u64(); c.u64() }.map(identity)
      if (level > 0) children.foreach(walk)
      else children.foreach { snodAddr =>
        val s = new Cur(bytes, btSafe(snodAddr))
        require(s.raw(4).sameElements("SNOD".getBytes), "bad symbol node signature")
        s.skip(1 + 1) // version + reserved
        val n = s.u16()
        (0 until n).foreach { _ =>
          val nameOff = s.u64()
          val hdr = s.u64()
          s.skip(4 + 4 + 16) // cache type, reserved, scratch
          out += heapString(nameOff) -> hdr
        }
      }
    }
    walk(btreeAddr)
  }

  private def btSafe(addr: Long): Int = {
    require(addr >= 0 && addr <= Int.MaxValue, s"address $addr out of supported range")
    addr.toInt
  }

  // -------------------------------------------------------------------
  // Object headers (v1 and v2) + messages

  private final class ObjInfo {
    var shape: Seq[Long] = Seq.empty
    var dtype: Option[DType] = None
    var layout: Option[Layout] = None
    var filters: Seq[Filter] = Seq.empty
    val attrs = mutable.Map[String, Any]()
    var symbolTable: Option[(Long, Long)] = None
    val links = mutable.ArrayBuffer[(String, Long)]()
    var usesFractalHeap = false
    def isDataset: Boolean = dtype.isDefined && layout.isDefined
  }

  private def readObjectHeader(bytes: Array[Byte], addr: Long): ObjInfo = {
    val info = new ObjInfo
    val c = new Cur(bytes, btSafe(addr))
    if (bytes(c.pos) == 'O' && bytes(c.pos + 1) == 'H') {
      // version 2: 'OHDR'
      c.skip(4)
      val version = c.u8()
      require(version == 2, s"bad OHDR version $version")
      val flags = c.u8()
      if ((flags & 0x20) != 0) c.skip(4 + 4) // access/mod/change/birth times
      if ((flags & 0x20) != 0) c.skip(8)
      if ((flags & 0x10) != 0) c.skip(2 + 2) // compact/dense attr counts
      val sizeBytes = 1 << (flags & 0x3)
      val chunkSize = sizeBytes match {
        case 1 => c.u8().toLong
        case 2 => c.u16().toLong
        case 4 => c.u32()
        case 8 => c.u64()
      }
      readMessagesV2(bytes, c.pos, chunkSize, (flags & 0x4) != 0, info)
    } else {
      val version = c.u8()
      require(version == 1, s"unsupported object header version $version at $addr")
      c.skip(1)
      val nMessages = c.u16()
      c.u32() // ref count
      val headerSize = c.u32()
      c.skip(4) // pad to 8-byte boundary
      readMessagesV1(bytes, c.pos, headerSize, nMessages, info)
    }
    info
  }

  private def readMessagesV1(bytes: Array[Byte], start: Int, blockSize: Long,
      totalMessages: Int, info: ObjInfo): Unit = {
    var remainingMsgs = totalMessages
    val blocks = mutable.Queue[(Int, Long)]((start, blockSize))
    while (blocks.nonEmpty && remainingMsgs > 0) {
      var (pos, size) = blocks.dequeue()
      val end = pos + size.toInt
      while (pos + 8 <= end && remainingMsgs > 0) {
        val c = new Cur(bytes, pos)
        val msgType = c.u16()
        val msgSize = c.u16()
        c.skip(1 + 3) // flags + reserved
        val bodyPos = c.pos
        if (msgType == 0x10) { // continuation
          val cc = new Cur(bytes, bodyPos)
          blocks.enqueue((btSafe(cc.u64()), cc.u64()))
        } else handleMessage(bytes, msgType, bodyPos, info)
        pos = bodyPos + msgSize
        remainingMsgs -= 1
      }
    }
  }

  private def readMessagesV2(bytes: Array[Byte], start: Int, blockSize: Long,
      creationOrder: Boolean, info: ObjInfo): Unit = {
    val blocks = mutable.Queue[(Int, Long)]((start, blockSize))
    var first = true
    while (blocks.nonEmpty) {
      var (pos, size) = blocks.dequeue()
      if (!first) {
        require(bytes(pos) == 'O' && bytes(pos + 1) == 'C', "bad OCHK signature")
        pos += 4
        size -= 4
      }
      first = false
      val end = pos + size.toInt - 4 // trailing gap/checksum
      while (pos + 4 <= end) {
        val c = new Cur(bytes, pos)
        val msgType = c.u8()
        val msgSize = c.u16()
        c.skip(1) // flags
        if (creationOrder) c.skip(2)
        val bodyPos = c.pos
        if (msgType == 0x10) {
          val cc = new Cur(bytes, bodyPos)
          blocks.enqueue((btSafe(cc.u64()), cc.u64()))
        } else handleMessage(bytes, msgType, bodyPos, info)
        pos = bodyPos + msgSize
      }
    }
  }

  private def handleMessage(bytes: Array[Byte], msgType: Int, pos: Int, info: ObjInfo): Unit =
    msgType match {
      case 0x01 => info.shape = readDataspace(new Cur(bytes, pos))
      case 0x03 => info.dtype = Some(readDatatype(new Cur(bytes, pos)))
      case 0x08 => info.layout = Some(readLayout(new Cur(bytes, pos)))
      case 0x0b => info.filters = readFilterPipeline(new Cur(bytes, pos))
      case 0x0c =>
        readAttribute(bytes, new Cur(bytes, pos)).foreach { case (k, v) => info.attrs(k) = v }
      case 0x11 =>
        val c = new Cur(bytes, pos)
        info.symbolTable = Some((c.u64(), c.u64()))
      case 0x06 => // link message (v2 groups, compact storage)
        readLinkMessage(new Cur(bytes, pos)).foreach(info.links += _)
      case 0x02 => info.usesFractalHeap = true // link info (dense storage pointer)
      case _ => () // NIL, fill value, object-modification-time, etc.: skip
    }

  private def readDataspace(c: Cur): Seq[Long] = {
    val version = c.u8()
    val rank = c.u8()
    val flags = c.u8()
    version match {
      case 1 => c.skip(1 + 4) // reserved
      case 2 => c.skip(1) // dataspace type
      case v => throw new IllegalArgumentException(s"unsupported dataspace version $v")
    }
    val dims = (0 until rank).map(_ => c.u64())
    if ((flags & 1) != 0) (0 until rank).foreach(_ => c.u64()) // maxdims
    dims
  }

  private def readDatatype(c: Cur): DType = {
    val cv = c.u8()
    val clazz = cv & 0x0f
    val bits0 = c.u8(); c.skip(2) // class bit fields
    val size = c.u32().toInt
    clazz match {
      case 0 => DType(0, size, littleEndian = (bits0 & 1) == 0, signed = (bits0 & 0x08) != 0)
      case 1 => DType(1, size, littleEndian = (bits0 & 1) == 0, signed = true)
      case 3 => DType(3, size, littleEndian = true, signed = false)
      case other => throw new IllegalArgumentException(
        s"unsupported datatype class $other (fixed/float/string only)")
    }
  }

  private def readLayout(c: Cur): Layout = {
    val version = c.u8()
    require(version == 3, s"only data-layout v3 supported (got $version)")
    c.u8() match {
      case 0 => NoData // compact — not produced for grid data
      case 1 =>
        val addr = c.u64(); val size = c.u64()
        if (addr == Undef) NoData else Contiguous(addr, size)
      case 2 =>
        val dimensionality = c.u8()
        val addr = c.u64()
        val dims = (0 until dimensionality - 1).map(_ => c.u32().toInt)
        c.u32() // element size pseudo-dim
        if (addr == Undef) NoData else Chunked(addr, dims)
      case other => throw new IllegalArgumentException(s"unsupported layout class $other")
    }
  }

  private def readFilterPipeline(c: Cur): Seq[Filter] = {
    val version = c.u8()
    val n = c.u8()
    if (version == 1) c.skip(2 + 4) else require(version == 2, s"bad filter pipeline v$version")
    (0 until n).map { _ =>
      val id = c.u16()
      val nameLen = if (version == 2 && id < 256) 0 else c.u16()
      c.u16() // flags
      val nValues = c.u16()
      c.skip(nameLen)
      val values = (0 until nValues).map(_ => c.u32().toInt)
      if (version == 1 && nValues % 2 == 1) c.skip(4)
      Filter(id, values)
    }
  }

  /** Attribute v1/v2/v3 → name -> (String | Array[Double]); vlen and
    * reference-typed attributes (DIMENSION_LIST) resolve to None. */
  private def readAttribute(bytes: Array[Byte], c: Cur): Option[(String, Any)] = {
    val version = c.u8()
    c.u8() match { case _ => () } // v1 reserved / v2-v3 flags
    val nameSize = c.u16()
    val dtSize = c.u16()
    val dsSize = c.u16()
    if (version == 3) c.skip(1) // name charset
    def pad8(n: Int): Int = if (version == 1) (n + 7) & ~7 else n
    val name = {
      val raw = c.raw(pad8(nameSize))
      val z = raw.indexOf(0.toByte)
      new String(raw, 0, if (z >= 0) z else raw.length, StandardCharsets.UTF_8)
    }
    val dt =
      try Some(readDatatype(new Cur(bytes, c.pos)))
      catch { case _: IllegalArgumentException => None }
    c.skip(pad8(dtSize))
    val shape = readDataspace(new Cur(bytes, c.pos))
    c.skip(pad8(dsSize))
    dt.flatMap { t =>
      val n = shape.product.max(1L).toInt
      t.clazz match {
        case 3 =>
          val raw = c.raw(t.size * n)
          val z = raw.indexOf(0.toByte)
          Some(name -> new String(raw, 0, if (z >= 0) z else raw.length, StandardCharsets.UTF_8))
        case _ =>
          Some(name -> Array.tabulate(n)(i => decodeScalar(bytes, c.pos + i * t.size, t)))
      }
    }
  }

  private def readLinkMessage(c: Cur): Option[(String, Long)] = {
    val version = c.u8()
    require(version == 1, s"unsupported link message version $version")
    val flags = c.u8()
    val linkType = if ((flags & 0x08) != 0) c.u8() else 0
    if ((flags & 0x04) != 0) c.u64() // creation order
    if ((flags & 0x10) != 0) c.u8() // charset
    val lenSize = 1 << (flags & 0x3)
    val nameLen = lenSize match {
      case 1 => c.u8().toLong
      case 2 => c.u16().toLong
      case 4 => c.u32()
      case 8 => c.u64()
    }
    val name = new String(c.raw(nameLen.toInt), StandardCharsets.UTF_8)
    if (linkType == 0) Some(name -> c.u64()) else None // hard links only
  }

  // -------------------------------------------------------------------
  // Data access

  private def decodeScalar(bytes: Array[Byte], pos: Int, t: DType): Double = {
    val order = if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val b = ByteBuffer.wrap(bytes, pos, t.size).order(order)
    (t.clazz, t.size) match {
      case (1, 4) => b.getFloat.toDouble
      case (1, 8) => b.getDouble
      case (0, 1) => if (t.signed) b.get.toDouble else (b.get & 0xff).toDouble
      case (0, 2) => if (t.signed) b.getShort.toDouble else (b.getShort & 0xffff).toDouble
      case (0, 4) => if (t.signed) b.getInt.toDouble else (b.getInt & 0xffffffffL).toDouble
      case (0, 8) => b.getLong.toDouble
      case other => throw new IllegalArgumentException(s"unsupported (class, size) $other")
    }
  }

  /** One chunk's index entry. */
  private final case class ChunkRef(offsets: Seq[Long], addr: Long, nBytes: Int, filterMask: Int)

  private def collectChunks(bytes: Array[Byte], btreeAddr: Long, rank: Int,
      out: mutable.ArrayBuffer[ChunkRef]): Unit = {
    val c = new Cur(bytes, btSafe(btreeAddr))
    require(c.raw(4).sameElements("TREE".getBytes), "bad chunk B-tree signature")
    val nodeType = c.u8(); val level = c.u8(); val entries = c.u16()
    require(nodeType == 1, s"expected chunk B-tree (type 1), got $nodeType")
    c.u64(); c.u64() // siblings
    (0 until entries).foreach { _ =>
      val nBytes = c.u32().toInt
      val mask = c.u32().toInt
      val offs = (0 until rank).map(_ => c.u64())
      c.u64() // element-size pseudo-dimension offset (always 0)
      val child = c.u64()
      if (level > 0) collectChunks(bytes, child, rank, out)
      else out += ChunkRef(offs, child, nBytes, mask)
    }
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var total = 0
    while (total < expected && !inf.finished()) {
      val n = inf.inflate(out, total, expected - total)
      require(n > 0 || !inf.needsInput(), "truncated deflate stream in chunk")
      total += n
    }
    inf.end()
    out
  }

  private def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + j) = data(j * n + i); i += 1 }
      j += 1
    }
    out
  }

  /** Stateful point-reader over one variable: caches decompressed
    * chunks by address so a series extract decompresses each visited
    * chunk once. Create per task; not thread-safe. */
  final class VarReader(f: H5File, val v: H5Var) {
    private val strides: Seq[Long] =
      v.shape.foldRight(List(1L)) { (d, acc) => (d * acc.head) :: acc }.tail
    private val chunkCache = mutable.Map[Long, Array[Byte]]()
    private val chunks: Seq[ChunkRef] = v.layout match {
      case Chunked(btree, dims) =>
        val buf = mutable.ArrayBuffer[ChunkRef]()
        collectChunks(f.bytes, btree, dims.length, buf)
        buf.toSeq
      case _ => Seq.empty
    }

    private def applyFilters(raw: Array[Byte], mask: Int, nElems: Int): Array[Byte] = {
      // filters are applied in reverse pipeline order on read; bit i of
      // the mask set means filter i was skipped for this chunk
      var data = raw
      v.filters.zipWithIndex.reverse.foreach { case (flt, i) =>
        if ((mask & (1 << i)) == 0) flt.id match {
          case 1 => data = inflate(data, nElems * v.dtype.size)
          case 2 => data = unshuffle(data, flt.clientValues.headOption.getOrElse(v.dtype.size))
          case 3 => data = data.dropRight(4) // fletcher32: trailing checksum, unverified
          case other => throw new IllegalArgumentException(s"unsupported HDF5 filter id $other")
        }
      }
      data
    }

    /** Element at a full N-D index, undecoded (no fill/scale handling —
      * [[Ingest]] layers the CF unpacking, same as the CDF path). */
    def elementAt(idx: Seq[Long]): Double = v.layout match {
      case Contiguous(addr, _) =>
        val flat = idx.zip(strides).map { case (i, s) => i * s }.sum
        decodeScalar(f.bytes, btSafe(addr + flat * v.dtype.size), v.dtype)
      case Chunked(_, chunkDims) =>
        val chunk = chunks.find(ch =>
          ch.offsets.zip(chunkDims).zip(idx).forall { case ((o, cd), i) => i >= o && i < o + cd })
          .getOrElse(throw new IllegalArgumentException(
            s"no chunk covers index ${idx.mkString(",")} of ${v.name}"))
        val nElems = chunkDims.map(_.toLong).product.toInt
        val data = chunkCache.getOrElseUpdate(chunk.addr, applyFilters(
          java.util.Arrays.copyOfRange(f.bytes, btSafe(chunk.addr), btSafe(chunk.addr) + chunk.nBytes),
          chunk.filterMask, nElems))
        val local = idx.zip(chunk.offsets).map { case (i, o) => i - o }
        val cStrides = chunkDims.map(_.toLong)
          .foldRight(List(1L)) { (d, acc) => (d * acc.head) :: acc }.tail
        val flat = local.zip(cStrides).map { case (i, s) => i * s }.sum
        decodeScalar(data, (flat * v.dtype.size).toInt, v.dtype)
      case NoData => throw new IllegalArgumentException(s"variable ${v.name} has no data")
    }

    /** Whole small variable (coordinates), row-major. */
    def readAll(): Array[Double] = {
      val n = v.shape.product.max(1L)
      require(n <= 16000000L, s"variable ${v.name} too large for a full read ($n elements)")
      val idx = Array.fill(v.shape.length)(0L)
      Array.tabulate(n.toInt) { _ =>
        val value = elementAt(idx.toSeq)
        var d = v.shape.length - 1
        while (d >= 0) {
          idx(d) += 1
          if (idx(d) < v.shape(d)) d = -1 else { idx(d) = 0; d -= 1 }
        }
        value
      }
    }
  }
}
