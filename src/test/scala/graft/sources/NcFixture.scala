package graft.sources

/** Hand-rolled CDF-1 fixture writer, shared by NetCdf3Spec and the CLI
  * spec. Written directly from the public on-disk layout (big-endian
  * header, 4-byte padding, record interleaving), independently of the
  * production reader — a shared misreading of the spec would have to be
  * made twice.
  */
object NcFixture {

  // ---- hand-rolled CDF-1 writer (test-local, spec-literal) ----

  case class FDim(name: String, len: Int) // len 0 = record dim
  case class FAttr(name: String, ncType: Int, value: Any) // String | Seq[Double]
  case class FVar(name: String, dimIds: Seq[Int], attrs: Seq[FAttr],
      ncType: Int, data: Seq[Double])

  def typeSize(t: Int) = t match {
    case 1 | 2 => 1; case 3 => 2; case 4 | 5 => 4; case 6 => 8
  }

  class W {
    val o = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = { o.write(v >>> 24); o.write(v >>> 16); o.write(v >>> 8); o.write(v) }
    def raw(b: Array[Byte]): Unit = o.write(b)
    def padTo4(): Unit = while (o.size % 4 != 0) o.write(0)
    def name(s: String): Unit = { val b = s.getBytes("UTF-8"); i32(b.length); raw(b); padTo4() }
    def value(t: Int, v: Double): Unit = t match {
      case 1 => o.write(v.toInt)
      case 3 => { val s = v.toInt; o.write(s >>> 8); o.write(s) }
      case 4 => i32(v.toInt)
      case 5 => i32(java.lang.Float.floatToIntBits(v.toFloat))
      case 6 => { val l = java.lang.Double.doubleToLongBits(v); i32((l >>> 32).toInt); i32(l.toInt) }
    }
    def attrs(as: Seq[FAttr]): Unit = {
      if (as.isEmpty) { i32(0); i32(0) }
      else {
        i32(0x0c); i32(as.size)
        as.foreach { a =>
          name(a.name); i32(a.ncType)
          a.value match {
            case s: String => val b = s.getBytes("UTF-8"); i32(b.length); raw(b); padTo4()
            case vs: Seq[_] =>
              i32(vs.size)
              vs.foreach(v => value(a.ncType, v.asInstanceOf[Double]))
              padTo4()
          }
        }
      }
    }
  }

  /** Two-pass build: header length is independent of begin values
    * (4 bytes each in CDF-1), so pass 1 uses zeros and pass 2 patches. */
  def build(dims: Seq[FDim], vars: Seq[FVar], numRecs: Int): Array[Byte] = {
    def isRec(v: FVar) = v.dimIds.headOption.exists(dims(_).len == 0)
    def recBytes(v: FVar): Int =
      v.dimIds.drop(1).map(dims(_).len).product * typeSize(v.ncType)
    def fixedBytes(v: FVar): Int =
      v.dimIds.map(dims(_).len).product * typeSize(v.ncType)
    def pad4(n: Int) = (n + 3) & ~3

    def header(begins: Map[String, Int]): Array[Byte] = {
      val w = new W
      w.raw(Array('C'.toByte, 'D'.toByte, 'F'.toByte, 1.toByte))
      w.i32(numRecs)
      if (dims.isEmpty) { w.i32(0); w.i32(0) }
      else { w.i32(0x0a); w.i32(dims.size); dims.foreach { d => w.name(d.name); w.i32(d.len) } }
      w.i32(0); w.i32(0) // no global attrs
      if (vars.isEmpty) { w.i32(0); w.i32(0) }
      else {
        w.i32(0x0b); w.i32(vars.size)
        vars.foreach { v =>
          w.name(v.name); w.i32(v.dimIds.size); v.dimIds.foreach(w.i32)
          w.attrs(v.attrs); w.i32(v.ncType)
          w.i32(if (isRec(v)) pad4(recBytes(v)) else pad4(fixedBytes(v))) // vsize
          w.i32(begins.getOrElse(v.name, 0))
        }
      }
      w.o.toByteArray
    }

    val headerLen = header(Map.empty).length
    // lay out data: fixed vars in order (padded), then the record section
    var off = headerLen
    val begins = scala.collection.mutable.Map[String, Int]()
    vars.filterNot(isRec).foreach { v => begins(v.name) = off; off += pad4(fixedBytes(v)) }
    val recVars = vars.filter(isRec)
    val single = recVars.size == 1
    var inRec = 0
    recVars.foreach { v =>
      begins(v.name) = off + inRec
      inRec += (if (single) recBytes(v) else pad4(recBytes(v)))
    }
    val w = new W
    w.raw(header(begins.toMap))
    vars.filterNot(isRec).foreach { v =>
      v.data.foreach(x => w.value(v.ncType, x)); w.padTo4()
    }
    for (r <- 0 until numRecs; v <- recVars) {
      val per = recBytes(v) / typeSize(v.ncType)
      v.data.slice(r * per, (r + 1) * per).foreach(x => w.value(v.ncType, x))
      if (!single) w.padTo4()
    }
    w.o.toByteArray
  }

}
