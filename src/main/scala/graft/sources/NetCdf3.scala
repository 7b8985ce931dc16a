package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Pure-JVM reader for the NetCDF classic formats (CDF-1 and the
  * 64-bit-offset CDF-2 variant) — the container ERA5 grids historically
  * ship in. Implements the public on-disk layout: big-endian header
  * (dim list, global attributes, variable list with per-variable
  * attributes and data offsets), fixed-size variable data at `begin`,
  * and record-variable data interleaved per record (with the
  * single-record-variable no-padding special case). NetCDF-4 files are
  * HDF5 containers and are handled by [[Hdf5]] — this parser detects
  * them and rejects with a clear error so callers route via
  * [[Ingest.era5CellSeries]]'s magic-byte dispatch.
  *
  * Reference semantics mirrored downstream (Ingest.fromEra5NetCdf):
  * fetch/era5_hourly.py:309-347 `_parse_with_netcdf4` — nearest grid
  * cell by |coord − station|, CF time decode from the `units`
  * attribute, packed-short unpacking via `scale_factor`/`add_offset`,
  * fill values → NaN.
  */
object NetCdf3 {

  final case class Dim(name: String, length: Int) { def isRecord: Boolean = length == 0 }
  final case class Var(
      name: String,
      dimIds: Seq[Int],
      attrs: Map[String, Any], // String | Array[Double] (numeric attrs)
      ncType: Int,
      begin: Long)
  final case class NcFile(
      dims: Seq[Dim],
      globalAttrs: Map[String, Any],
      vars: Seq[Var],
      numRecs: Int,
      bytes: Array[Byte]) {
    def variable(names: String*): Var =
      names.flatMap(n => vars.find(_.name == n)).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"variable not found: ${names.mkString("/")} (have ${vars.map(_.name).mkString(",")})"))
  }

  private val NcDimension = 0x0a
  private val NcVariable = 0x0b
  private val NcAttribute = 0x0c

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 => 1 // byte, char
    case 3 => 2 // short
    case 4 | 5 => 4 // int, float
    case 6 => 8 // double
    case other => throw new IllegalArgumentException(s"unknown nc_type $other")
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  def parse(bytes: Array[Byte]): NcFile = {
    if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F')
      throw new IllegalArgumentException(
        "NetCDF-4 (HDF5 container) is not supported; classic CDF-1/CDF-2 only")
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    require(b.get() == 'C' && b.get() == 'D' && b.get() == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = b.get().toInt
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numRecs = b.getInt()

    def readName(): String = {
      val n = b.getInt()
      val s = new Array[Byte](n)
      b.get(s)
      b.position(b.position() + (pad4(n) - n).toInt)
      new String(s, StandardCharsets.UTF_8)
    }

    def readTaggedCount(expectedTag: Int): Int = {
      val tag = b.getInt()
      val count = b.getInt()
      require(tag == expectedTag || (tag == 0 && count == 0),
        s"bad list tag $tag (expected $expectedTag)")
      count
    }

    def readAttrs(): Map[String, Any] = {
      val n = readTaggedCount(NcAttribute)
      (0 until n).map { _ =>
        val name = readName()
        val t = b.getInt()
        val nelems = b.getInt()
        val value: Any = t match {
          case 2 =>
            val s = new Array[Byte](nelems)
            b.get(s)
            b.position(b.position() + (pad4(nelems) - nelems).toInt)
            new String(s, StandardCharsets.UTF_8)
          case _ =>
            typeSize(t) // rejects unknown nc_types with a clear message
            val out = new Array[Double](nelems)
            var i = 0
            while (i < nelems) {
              out(i) = t match {
                case 1 => b.get().toDouble
                case 3 => b.getShort().toDouble
                case 4 => b.getInt().toDouble
                case 5 => b.getFloat().toDouble
                case 6 => b.getDouble()
              }
              i += 1
            }
            val used = nelems.toLong * typeSize(t)
            b.position(b.position() + (pad4(used) - used).toInt)
            out
        }
        name -> value
      }.toMap
    }

    val nDims = readTaggedCount(NcDimension)
    val dims = (0 until nDims).map(_ => Dim(readName(), b.getInt()))
    val globalAttrs = readAttrs()
    val nVars = readTaggedCount(NcVariable)
    val vars = (0 until nVars).map { _ =>
      val name = readName()
      val nd = b.getInt()
      val dimIds = (0 until nd).map(_ => b.getInt())
      val attrs = readAttrs()
      val t = b.getInt()
      b.getInt() // vsize: per spec, untrusted (can overflow) — recomputed
      val begin = if (version == 1) b.getInt().toLong else b.getLong()
      Var(name, dimIds, attrs, t, begin)
    }
    val f = NcFile(dims, globalAttrs, vars, numRecs, bytes)
    if (numRecs != -1) f
    else {
      // STREAMING sentinel (0xFFFFFFFF): the record count is derived
      // from the byte length past the first record slab, per the spec's
      // guidance for indeterminate-length writers
      val recVars = vars.filter(v => v.dimIds.headOption.exists(dims(_).isRecord))
      if (recVars.isEmpty) f.copy(numRecs = 0)
      else {
        val stride = recordStride(f.copy(numRecs = 0))
        val start = recVars.map(_.begin).min
        f.copy(numRecs = ((bytes.length - start) / stride).toInt)
      }
    }
  }

  /** Shape of a variable with the record dimension resolved to numRecs. */
  def shape(f: NcFile, v: Var): Seq[Int] =
    v.dimIds.map { id =>
      val d = f.dims(id)
      if (d.isRecord) f.numRecs else d.length
    }

  private def isRecordVar(f: NcFile, v: Var): Boolean =
    v.dimIds.headOption.exists(id => f.dims(id).isRecord)

  /** Bytes of one record of a record variable (record dim excluded),
    * unpadded. */
  private def recordBytes(f: NcFile, v: Var): Long =
    v.dimIds.drop(1).map(id => f.dims(id).length.toLong).product * typeSize(v.ncType)

  /** Stride between consecutive records in the record-data section: the
    * sum of all record variables' padded one-record sizes — except with
    * exactly ONE record variable, whose slabs pack unpadded. */
  private def recordStride(f: NcFile): Long = {
    val recVars = f.vars.filter(isRecordVar(f, _))
    if (recVars.size == 1) recordBytes(f, recVars.head)
    else recVars.map(v => pad4(recordBytes(f, v))).sum
  }

  private def rawAt(f: NcFile, v: Var, off: Long): Double = {
    val bb = ByteBuffer.wrap(f.bytes, off.toInt, typeSize(v.ncType))
    v.ncType match {
      case 1 => bb.get().toDouble
      case 2 => (bb.get() & 0xff).toDouble
      case 3 => bb.getShort().toDouble
      case 4 => bb.getInt().toDouble
      case 5 => bb.getFloat().toDouble
      case 6 => bb.getDouble()
    }
  }

  /** fill → NaN (checked against the PACKED value), then scale/offset —
    * the netCDF4-python masked-array behavior the reference relies on. */
  private def unpacker(v: Var): Double => Double = {
    def numAttr(names: String*): Option[Double] =
      names.flatMap(v.attrs.get).collectFirst { case a: Array[Double] if a.nonEmpty => a(0) }
    val fill = numAttr("_FillValue", "missing_value")
    val scale = numAttr("scale_factor").getOrElse(1.0)
    val offset = numAttr("add_offset").getOrElse(0.0)
    x => if (fill.exists(_ == x)) Double.NaN else x * scale + offset
  }

  /** Read a whole variable, row-major, as doubles (unpacked). Returns
    * (shape, values). Sized for coordinate/sample variables — grid
    * extracts should use [[readCellSeries]] instead, which never
    * materializes the full grid. */
  def readVar(f: NcFile, name: String): (Seq[Int], Array[Double]) = {
    val v = f.variable(name)
    val shp = shape(f, v)
    val n = shp.map(_.toLong).product
    require(n <= Int.MaxValue, s"variable $name too large for a single read")
    val out = new Array[Double](n.toInt)
    val ts = typeSize(v.ncType)

    if (!isRecordVar(f, v)) {
      var i = 0L
      while (i < n) { out(i.toInt) = rawAt(f, v, v.begin + i * ts); i += 1 }
    } else {
      val perRec = (n / math.max(1, f.numRecs)).toInt
      val stride = recordStride(f)
      var r = 0
      while (r < f.numRecs) {
        var i = 0
        while (i < perRec) {
          out(r * perRec + i) = rawAt(f, v, v.begin + r * stride + i.toLong * ts)
          i += 1
        }
        r += 1
      }
    }
    val unpack = unpacker(v)
    var i = 0
    while (i < out.length) { out(i) = unpack(out(i)); i += 1 }
    (shp, out)
  }

  /** Read a 1-D series along `seriesDimId` with every other dimension
    * held at `fixedIdx` (default 0) — the nearest-cell extract path:
    * O(series length) point reads, the full grid is NEVER materialized
    * (a month of 0.25° global ERA5 is ~6 GB as doubles; the extracted
    * cell is a few KB). For record variables the series dim must be the
    * record (unlimited) dim — the only axis the classic layout streams. */
  def readCellSeries(
      f: NcFile, name: String, seriesDimId: Int,
      fixedIdx: Map[Int, Int]): Array[Double] = {
    val v = f.variable(name)
    val ts = typeSize(v.ncType)
    val shp = shape(f, v)
    val strides = shp.foldRight(List(1L)) { (d, acc) => (d * acc.head) :: acc }.tail
    val seriesPos = v.dimIds.indexOf(seriesDimId)
    require(seriesPos >= 0, s"variable $name has no dimension id $seriesDimId")
    val isRec = isRecordVar(f, v)
    require(!isRec || seriesPos == 0,
      s"record variable $name: the series dim must be the record dim")
    val inner = v.dimIds.indices.filterNot(_ == seriesPos).map { i =>
      val idx = fixedIdx.getOrElse(v.dimIds(i), 0)
      require(idx >= 0 && idx < shp(i),
        s"index $idx out of range for dim ${f.dims(v.dimIds(i)).name} of $name")
      idx.toLong * strides(i)
    }.sum
    val recStride = if (isRec) recordStride(f) else 0L
    val unpack = unpacker(v)
    Array.tabulate(shp(seriesPos)) { t =>
      val off =
        if (isRec) v.begin + t * recStride + inner * ts
        else v.begin + (t * strides(seriesPos) + inner) * ts
      unpack(rawAt(f, v, off))
    }
  }

  /** CF time decode: `<unit> since <base>` with unit in
    * seconds/minutes/hours/days, proleptic-Gregorian base — the
    * "standard" calendar for post-1582 data. Returns epoch MICROS. */
  def decodeTime(units: String, values: Array[Double]): Array[Long] = {
    val m = "(?i)\\s*(second|minute|hour|day)s?\\s+since\\s+(.+)".r
    val (unitUs, baseStr) = units match {
      case m(u, rest) =>
        val us = u.toLowerCase match {
          case "second" => 1000000L
          case "minute" => 60L * 1000000L
          case "hour" => 3600L * 1000000L
          case "day" => 86400L * 1000000L
        }
        (us, rest.trim)
      case other => throw new IllegalArgumentException(s"unsupported time units: $other")
    }
    val base = parseBase(baseStr)
    values.map(v => base + math.round(v * unitUs))
  }

  /** "YYYY-M-D[ H:M[:S[.f]]][Z| +00:00]" → epoch micros (UTC). */
  private[sources] def parseBase(s: String): Long = {
    val cleaned = s.replace("T", " ").replaceAll("(?i)\\s*(Z|\\+0+:?0*)$", "").trim
    val dt = "(\\d{1,4})-(\\d{1,2})-(\\d{1,2})(?:\\s+(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.(\\d+))?)?)?".r
    cleaned match {
      case dt(y, mo, d, h, mi, sec, frac) =>
        val ldt = java.time.LocalDateTime.of(
          y.toInt, mo.toInt, d.toInt,
          Option(h).map(_.toInt).getOrElse(0),
          Option(mi).map(_.toInt).getOrElse(0),
          Option(sec).map(_.toInt).getOrElse(0))
        val micros = Option(frac)
          .map(fr => (("0." + fr).toDouble * 1e6).round)
          .getOrElse(0L)
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + micros
      case other =>
        throw new IllegalArgumentException(s"unparseable time base: $other")
    }
  }
}
