package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Spec-conformant minimal HDF5 writer for tests (the [[NcFixture]]
  * counterpart for the NetCDF-4 path): superblock v0, old-style root
  * group (B-tree v1 + local heap + SNOD), v1 object headers, datasets
  * with contiguous or chunked (+ optional shuffle/deflate) layout and
  * v1 attributes — exactly the encoding libhdf5 produces for
  * netcdf-c-written files, per the public HDF5 File Format
  * Specification. No h5py/netCDF4 exists in this container, so the
  * fixtures are hand-assembled from the spec; every structure carries
  * its mandated signature/version bytes so a conformance slip fails
  * loudly in the reader rather than silently passing. */
object H5Fixture {

  private val Undef = -1L

  final case class FAttr(name: String, value: Any) // String | Array[Double]
  final case class FDs(
      name: String,
      shape: Seq[Int],
      dtypeClass: Int, // 0 fixed, 1 float
      size: Int,
      raw: Array[Double], // PACKED values, row-major (cast to dtype on write)
      attrs: Seq[FAttr] = Seq.empty,
      chunkDims: Option[Seq[Int]] = None,
      shuffle: Boolean = false,
      deflate: Boolean = false)

  private final class Buf {
    val bytes = mutable.ArrayBuffer[Byte]()
    def pos: Int = bytes.length
    def u8(v: Int): Unit = bytes += v.toByte
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt))
    def u64(v: Long): Unit = (0 until 8).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt))
    def raw(b: Array[Byte]): Unit = bytes ++= b
    def ascii(s: String): Unit = raw(s.getBytes("US-ASCII"))
    def padTo8(start: Int): Unit = while ((pos - start) % 8 != 0) u8(0)
    def reserveU64(): Int = { val p = pos; u64(0); p }
    def patchU64(at: Int, v: Long): Unit =
      (0 until 8).foreach(i => bytes(at + i) = ((v >> (8 * i)) & 0xff).toByte)
    def result: Array[Byte] = bytes.toArray
  }

  private def encodeElems(raw: Array[Double], clazz: Int, size: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(raw.length * size).order(ByteOrder.LITTLE_ENDIAN)
    raw.foreach { v =>
      (clazz, size) match {
        case (0, 2) => bb.putShort(v.toShort)
        case (0, 4) => bb.putInt(v.toInt)
        case (0, 8) => bb.putLong(v.toLong)
        case (1, 4) => bb.putFloat(v.toFloat)
        case (1, 8) => bb.putDouble(v)
        case other => throw new IllegalArgumentException(s"unsupported fixture dtype $other")
      }
    }
    bb.array()
  }

  private def shuffleBytes(data: Array[Byte], elemSize: Int): Array[Byte] = {
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(j * n + i) = data(i * elemSize + j); i += 1 }
      j += 1
    }
    out
  }

  private def deflateBytes(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def datatypeMsg(clazz: Int, size: Int): Array[Byte] = {
    val b = new Buf
    b.u8(0x10 | clazz) // version 1, class
    b.u8(if (clazz == 0) 0x08 else 0x00) // LE; fixed-point: signed
    b.u8(0); b.u8(0)
    b.u32(size.toLong)
    if (clazz == 0) { b.u16(0); b.u16(8 * size) } // bit offset, precision
    else {
      b.u16(0); b.u16(8 * size)
      if (size == 4) { b.u8(23); b.u8(8); b.u8(0); b.u8(23); b.u32(127L) }
      else { b.u8(52); b.u8(11); b.u8(0); b.u8(52); b.u32(1023L) }
    }
    b.result
  }

  private def dataspaceMsg(shape: Seq[Int]): Array[Byte] = {
    val b = new Buf
    b.u8(1); b.u8(shape.length); b.u8(0); b.u8(0); b.u32(0L)
    shape.foreach(d => b.u64(d.toLong))
    b.result
  }

  private def attributeMsg(a: FAttr): Array[Byte] = {
    val (dtBytes, dsBytes, dataBytes) = a.value match {
      case s: String =>
        val sb = s.getBytes("UTF-8")
        val dt = { // class 3 string, size = len
          val b = new Buf; b.u8(0x13); b.u8(0); b.u8(0); b.u8(0); b.u32(sb.length.toLong); b.result
        }
        (dt, dataspaceMsg(Seq.empty), sb)
      case arr: Array[Double] =>
        (datatypeMsg(1, 8), dataspaceMsg(Seq(arr.length)), encodeElems(arr, 1, 8))
      case other => throw new IllegalArgumentException(s"unsupported attr value $other")
    }
    val b = new Buf
    val nameBytes = a.name.getBytes("UTF-8") :+ 0.toByte
    b.u8(1); b.u8(0) // version 1, reserved
    b.u16(nameBytes.length)
    b.u16(dtBytes.length)
    b.u16(dsBytes.length)
    val s0 = b.pos; b.raw(nameBytes); b.padTo8(s0)
    val s1 = b.pos; b.raw(dtBytes); b.padTo8(s1)
    val s2 = b.pos; b.raw(dsBytes); b.padTo8(s2)
    b.raw(dataBytes)
    b.result
  }

  /** Build a complete HDF5 file with the given root-level datasets.
    * `sbVersion` 0 writes the classic superblock (symbol-table root
    * entry, what libhdf5 1.8-default files carry); 2 writes the modern
    * compact superblock (direct root-header address + checksum, what
    * `libver=latest` / 1.10+ files carry) — the group machinery below
    * is identical, which the spec exploits to cover both parse paths
    * with one byte layout. */
  def build(datasets: Seq[FDs], sbVersion: Int = 0): Array[Byte] = {
    require(sbVersion == 0 || sbVersion == 2, s"sbVersion 0 or 2, got $sbVersion")
    val b = new Buf

    b.raw(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    var rootBtreeScratch = -1
    var rootHeapScratch = -1
    val (eofPatch, rootHdrPatch) = if (sbVersion == 0) {
      // ---- superblock v0
      b.u8(0) // superblock version
      b.u8(0); b.u8(0); b.u8(0); b.u8(0) // fs ver, root ST ver, reserved, shared ver
      b.u8(8); b.u8(8); b.u8(0) // size of offsets, lengths, reserved
      b.u16(4); b.u16(16) // group leaf / internal k
      b.u32(0L) // consistency flags
      b.u64(0L) // base address
      b.u64(Undef) // free-space info
      val eofP = b.reserveU64()
      b.u64(Undef) // driver info
      // root group symbol table entry
      b.u64(0L) // link name offset
      val rootP = b.reserveU64()
      b.u32(1L); b.u32(0L) // cache type 1, reserved
      rootBtreeScratch = b.reserveU64()
      rootHeapScratch = b.reserveU64()
      (eofP, rootP)
    } else {
      // ---- superblock v2: sizes, flags, base/extension/EOF, root
      // header address, checksum (readers that don't verify skip it)
      b.u8(2) // superblock version
      b.u8(8); b.u8(8) // size of offsets, lengths
      b.u8(0) // consistency flags
      b.u64(0L) // base address
      b.u64(Undef) // superblock extension
      val eofP = b.reserveU64()
      val rootP = b.reserveU64()
      b.u32(0L) // checksum (not verified by this reader)
      (eofP, rootP)
    }

    // ---- root group object header v1 (one symbol-table message)
    b.patchU64(rootHdrPatch, b.pos.toLong)
    b.u8(1); b.u8(0) // version, reserved
    b.u16(1) // messages
    b.u32(1L) // ref count
    b.u32(24L) // header size: 8 (msg hdr) + 16 (body)
    b.u32(0L) // pad to 8
    b.u16(0x11); b.u16(16); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    val stBtreePatch = b.reserveU64()
    val stHeapPatch = b.reserveU64()

    // ---- local heap with link names
    val sorted = datasets.sortBy(_.name)
    val heapData = new Buf
    heapData.u8(0) // offset 0: empty string
    heapData.padTo8(0)
    val nameOffsets = sorted.map { ds =>
      val off = heapData.pos
      heapData.raw(ds.name.getBytes("UTF-8") :+ 0.toByte)
      heapData.padTo8(0)
      ds.name -> off.toLong
    }.toMap
    val heapAddr = b.pos.toLong
    b.ascii("HEAP"); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    b.u64(heapData.pos.toLong) // data segment size
    b.u64(Undef) // free-list head: none
    val heapDataPatch = b.reserveU64()
    b.patchU64(heapDataPatch, b.pos.toLong)
    b.raw(heapData.result)
    b.patchU64(stHeapPatch, heapAddr)
    if (rootHeapScratch >= 0) b.patchU64(rootHeapScratch, heapAddr)

    // ---- group B-tree v1 with one SNOD child
    val btreeAddr = b.pos.toLong
    b.ascii("TREE"); b.u8(0); b.u8(0); b.u16(1)
    b.u64(Undef); b.u64(Undef)
    b.u64(0L) // key0: empty-string heap offset
    val snodPatch = b.reserveU64()
    b.u64(nameOffsets(sorted.last.name)) // key1: greatest name
    b.patchU64(stBtreePatch, btreeAddr)
    if (rootBtreeScratch >= 0) b.patchU64(rootBtreeScratch, btreeAddr)

    // ---- SNOD with one entry per dataset
    b.patchU64(snodPatch, b.pos.toLong)
    b.ascii("SNOD"); b.u8(1); b.u8(0); b.u16(sorted.length)
    val hdrPatches = sorted.map { ds =>
      b.u64(nameOffsets(ds.name))
      val p = b.reserveU64()
      b.u32(0L); b.u32(0L) // cache type 0, reserved
      b.u64(0L); b.u64(0L) // scratch
      ds.name -> p
    }.toMap

    // ---- datasets: data first, then object header
    sorted.foreach { ds =>
      val encoded = encodeElems(ds.raw, ds.dtypeClass, ds.size)
      val layoutAndFilters: (Array[Byte], Option[Array[Byte]]) = ds.chunkDims match {
        case None =>
          val dataAddr = b.pos.toLong
          b.raw(encoded)
          val lay = new Buf
          lay.u8(3); lay.u8(1); lay.u64(dataAddr); lay.u64(encoded.length.toLong)
          (lay.result, None)
        case Some(cd) =>
          require(ds.shape.zip(cd).forall { case (s, c) => s % c == 0 },
            "fixture chunk dims must divide the shape")
          // write chunks row-major over the chunk grid
          val grid = ds.shape.zip(cd).map { case (s, c) => s / c }
          val strides = ds.shape.foldRight(List(1)) { (d, acc) => (d * acc.head) :: acc }.tail
          val chunkRefs = mutable.ArrayBuffer[(Seq[Long], Long, Int)]()
          def chunkCells(gridIdx: Seq[Int]): Array[Double] = {
            val origin = gridIdx.zip(cd).map { case (g, c) => g * c }
            val nElems = cd.product
            val out = new Array[Double](nElems)
            val cStrides = cd.foldRight(List(1)) { (d, acc) => (d * acc.head) :: acc }.tail
            var i = 0
            while (i < nElems) {
              val localIdx = cd.indices.map(k => (i / cStrides(k)) % cd(k))
              val flat = localIdx.zip(origin).zip(strides)
                .map { case ((l, o), s) => (l + o) * s }.sum
              out(i) = ds.raw(flat)
              i += 1
            }
            out
          }
          def gridIndices(g: Seq[Int]): Seq[Seq[Int]] =
            g.foldLeft(Seq(Seq.empty[Int]))((acc, n) => acc.flatMap(p => (0 until n).map(p :+ _)))
          gridIndices(grid).foreach { gi =>
            var chunkBytes = encodeElems(chunkCells(gi), ds.dtypeClass, ds.size)
            if (ds.shuffle) chunkBytes = shuffleBytes(chunkBytes, ds.size)
            if (ds.deflate) chunkBytes = deflateBytes(chunkBytes)
            val addr = b.pos.toLong
            b.raw(chunkBytes)
            chunkRefs += ((gi.zip(cd).map { case (g, c) => (g * c).toLong }, addr, chunkBytes.length))
          }
          // chunk B-tree v1, single leaf
          val btAddr = b.pos.toLong
          b.ascii("TREE"); b.u8(1); b.u8(0); b.u16(chunkRefs.length)
          b.u64(Undef); b.u64(Undef)
          chunkRefs.foreach { case (offs, addr, n) =>
            b.u32(n.toLong); b.u32(0L)
            offs.foreach(b.u64)
            b.u64(0L) // element pseudo-dim
            b.u64(addr)
          }
          // final key after last child
          b.u32(0L); b.u32(0L); ds.shape.foreach(d => b.u64(d.toLong)); b.u64(0L)
          val lay = new Buf
          lay.u8(3); lay.u8(2); lay.u8(cd.length + 1)
          lay.u64(btAddr)
          cd.foreach(c => lay.u32(c.toLong))
          lay.u32(ds.size.toLong)
          val filters =
            if (!ds.shuffle && !ds.deflate) None
            else Some {
              val fp = new Buf
              val n = (if (ds.shuffle) 1 else 0) + (if (ds.deflate) 1 else 0)
              fp.u8(1); fp.u8(n); fp.u16(0); fp.u32(0L)
              if (ds.shuffle) { // applied first on write
                fp.u16(2); fp.u16(0); fp.u16(0); fp.u16(1); fp.u32(ds.size.toLong); fp.u32(0L)
              }
              if (ds.deflate) {
                fp.u16(1); fp.u16(0); fp.u16(0); fp.u16(1); fp.u32(6L); fp.u32(0L)
              }
              fp.result
            }
          (lay.result, filters)
      }
      val (layoutBody, filterBody) = layoutAndFilters
      val msgs: Seq[(Int, Array[Byte])] =
        Seq(0x01 -> dataspaceMsg(ds.shape), 0x03 -> datatypeMsg(ds.dtypeClass, ds.size),
          0x08 -> layoutBody) ++
          filterBody.map(fb => 0x0b -> fb).toSeq ++
          ds.attrs.map(a => 0x0c -> attributeMsg(a))
      val bodies = msgs.map { case (t, body) =>
        val padded = body ++ Array.fill((8 - body.length % 8) % 8)(0.toByte)
        (t, padded)
      }
      val hdrSize = bodies.map(_._2.length + 8).sum
      b.patchU64(hdrPatches(ds.name), b.pos.toLong)
      b.u8(1); b.u8(0)
      b.u16(bodies.length)
      b.u32(1L)
      b.u32(hdrSize.toLong)
      b.u32(0L) // pad
      bodies.foreach { case (t, body) =>
        b.u16(t); b.u16(body.length); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
        b.raw(body)
      }
    }

    b.patchU64(eofPatch, b.pos.toLong)
    b.result
  }
}
