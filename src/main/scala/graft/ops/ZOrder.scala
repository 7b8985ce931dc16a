package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bucketized
  * dimensions so that sorting by ONE key gives locality in BOTH — each
  * parquet row group then covers a small rectangle of (x, y) space and
  * a selective predicate on EITHER dimension prunes row groups from
  * footer min/max stats alone.
  *
  * This is the multi-column completion of [[graft.sources.Sinks
  * .writeSortedBy]]: a linear sort gives perfect pruning on its leading
  * column and ZERO pruning on any other (every row group spans the full
  * range of the second column); the z-curve trades a little of the
  * leading column's locality for pruning ∝ √selectivity on each of the
  * two dimensions. At 100 TB this is the layout for fact tables queried
  * by both time AND entity (the "one user's events last week" scan that
  * a time-sorted layout turns into a full-partition read).
  *
  * Everything is pure integer Column arithmetic, codegen'd, and
  * bit-reproducible in DuckDB (no doubles anywhere near a bucket
  * boundary: buckets come from `(v - min) * N DIV (max - min + 1)`,
  * exact in 64-bit — (max-min)·N must stay under 2⁶³, which holds for
  * any epoch-second or id range at N = 2¹⁶).
  */
object ZOrder {

  /** Bits per dimension (two dims → 32-bit z key). */
  val DimBits = 16

  /** Spread the low 16 bits of v so bit i lands at bit 2i — the
    * standard mask ladder, expressed as Column ops (literal shifts
    * only, so it stays in whole-stage codegen). */
  private def spread16(v: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    m.foldLeft(v) { case (acc, (s, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(mask))
    }
  }

  /** Morton-interleave two 16-bit bucket indices into a 32-bit z value
    * (x in even bits, y in odd). */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Bits per dimension in the 3-D key (3 × 21 = 63 bits — the key
    * tops out at bit 62, safely positive in a signed long). */
  val DimBits3 = 21

  /** 3-D mask ladder constants, shared with the DuckDB oracle spelling
    * (interpolated there as decimal literals so both engines run the
    * identical arithmetic). */
  val Spread3Masks: Seq[(Int, Long)] = Seq(
    (32, 0x1F00000000FFFFL),
    (16, 0x1F0000FF0000FFL),
    (8, 0x100F00F00F00F00FL),
    (4, 0x10C30C30C30C30C3L),
    (2, 0x1249249249249249L))

  /** Spread the low 21 bits of v so bit i lands at bit 3i — the 64-bit
    * three-way mask ladder (same shape as [[spread16]], stride 3).
    * Spelled mask-BEFORE-shift, `(v & m) | ((v & (m >> s)) << s)`:
    * the shifted operand then never carries a bit past 62, which is
    * what lets DuckDB's overflow-checked `<<` replay the identical
    * ladder (the classic shift-then-mask spelling relies on silent
    * wraparound and raises there). */
  private def spread21(v: Column): Column =
    Spread3Masks.foldLeft(v) { case (acc, (s, mask)) =>
      acc.bitwiseAND(lit(mask))
        .bitwiseOR(shiftleft(acc.bitwiseAND(lit(mask >> s)), s))
    }

  /** Morton-interleave three 21-bit bucket indices into a 63-bit z
    * value (x in bits ≡0 mod 3, y ≡1, z ≡2) — the layout key for fact
    * tables queried by time AND entity AND domain. Two dims cost each
    * other √selectivity; three cost ∛ — still decisive when the linear
    * alternative is zero pruning on two of the three. */
  def interleave21x3(x: Column, y: Column, z: Column): Column =
    spread21(x)
      .bitwiseOR(shiftleft(spread21(y), 1))
      .bitwiseOR(shiftleft(spread21(z), 2))

  /** Exact-integer bucketization of v into [0, 2^bits): requires the
    * inclusive driver-known bounds of v. The span·2^bits < 2^53 guard
    * is the price of bit-exact cross-engine floor math — a column wider
    * than the budget (epoch MICROS over hours, raw 64-bit hashes)
    * should be pre-scaled to a coarser unit (seconds, a prefix, a mod)
    * first; clustering quality is unchanged, only the bucket resolution
    * moves. */
  def bucket(v: Column, min: Long, max: Long, bits: Int = DimBits): Column = {
    require(max >= min, s"empty bucket range [$min, $max]")
    // overflow-proof guard: a near-full-range long column would wrap
    // `max - min + 1` and sail past a naive long-arithmetic check
    val span = BigInt(max) - BigInt(min) + 1
    require(span * (1L << bits) < (BigInt(1) << 53),
      s"range $span too wide for exact bucket math at 2^$bits buckets")
    // Divide is double-typed in both engines; floor is EXACT here because
    // the numerator stays under 2^53 and the true quotient is at least
    // 1/span away from the next integer when not integral — far wider
    // than the quotient's ulp. Both engines round identically, so the
    // oracle can reproduce the bucket bit-for-bit with the same spelling.
    floor((v - lit(min)) * lit(1L << bits) / lit(span.toLong)).cast("long")
  }

  /** The z key for two long-valued columns with driver-known bounds. */
  def zkey(x: Column, xMin: Long, xMax: Long, y: Column, yMin: Long, yMax: Long): Column =
    interleave16(bucket(x, xMin, xMax), bucket(y, yMin, yMax))

  /** The 3-D z key for three long-valued columns with driver-known
    * bounds, at 21 bits per dimension. */
  def zkey3(x: Column, xMin: Long, xMax: Long,
      y: Column, yMin: Long, yMax: Long,
      z: Column, zMin: Long, zMax: Long): Column =
    interleave21x3(
      bucket(x, xMin, xMax, DimBits3),
      bucket(y, yMin, yMax, DimBits3),
      bucket(z, zMin, zMax, DimBits3))

  /** Inclusive (min, max) per dim from ONE aggregate — a driver scalar
    * fetch, like a sink's commit metadata. None when ANY dim has no
    * usable bounds (empty input, all-null, or not castable to long):
    * nothing to cluster then, and every dim is treated the same way. */
  private def boundsOf(df: DataFrame, dims: Seq[String]): Option[Seq[(Long, Long)]] = {
    val aggs = dims.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val Array(b) = df.agg(aggs.head, aggs.drop(1): _*).collect()
    if (b.toSeq.indices.exists(b.isNullAt)) None
    else Some(dims.indices.map(i => (b.getLong(2 * i), b.getLong(2 * i + 1))))
  }

  private def writeByKey(df: DataFrame, dir: String, key: Option[Column],
      numFiles: Int): Unit = key match {
    case None => df.write.mode("overwrite").parquet(dir)
    case Some(z) =>
      val keyed = df.withColumn("__z", z)
      val ranged =
        if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__z"))
        else keyed.repartitionByRange(col("__z"))
      ranged.sortWithinPartitions(col("__z")).drop("__z")
        .write.mode("overwrite").parquet(dir)
  }

  /** Z-ordered parquet layout: bucketize both dims from one min/max
    * aggregate, range-partition files by z, sort row groups by z, drop
    * the key. Bounds are computed on the input — for an APPEND workload
    * compute them once from expected domain bounds instead so file N+1
    * sorts by the same curve as file 0. */
  def writeZOrderedBy(df: DataFrame, dir: String, xCol: String, yCol: String,
      numFiles: Int = 0): Unit =
    writeByKey(df, dir,
      boundsOf(df, Seq(xCol, yCol)).map { case Seq((x0, x1), (y0, y1)) =>
        zkey(col(xCol).cast("long"), x0, x1, col(yCol).cast("long"), y0, y1)
      }, numFiles)

  /** 3-D z-ordered layout — (time, entity, domain) fact tables where
    * all three predicates matter. Same write shape as the 2-D sink. */
  def writeZOrdered3By(df: DataFrame, dir: String, xCol: String, yCol: String,
      zCol: String, numFiles: Int = 0): Unit =
    writeByKey(df, dir,
      boundsOf(df, Seq(xCol, yCol, zCol)).map {
        case Seq((x0, x1), (y0, y1), (z0, z1)) =>
          zkey3(col(xCol).cast("long"), x0, x1,
            col(yCol).cast("long"), y0, y1,
            col(zCol).cast("long"), z0, z1)
      }, numFiles)
}
