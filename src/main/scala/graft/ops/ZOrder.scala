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

  /** Exact-integer bucketization of v into [0, 2^DimBits): requires the
    * inclusive driver-known bounds of v. The span·2^16 < 2^53 guard is
    * the price of bit-exact cross-engine floor math — a column wider
    * than ~2^37 (epoch MICROS over hours, raw 64-bit hashes) should be
    * pre-scaled to a coarser unit (seconds, a prefix) first; clustering
    * quality is unchanged, only the bucket resolution moves. */
  def bucket(v: Column, min: Long, max: Long): Column = {
    require(max >= min, s"empty bucket range [$min, $max]")
    // overflow-proof guard: a near-full-range long column would wrap
    // `max - min + 1` and sail past a naive long-arithmetic check
    val span = BigInt(max) - BigInt(min) + 1
    require(span * (1L << DimBits) < (BigInt(1) << 53),
      s"range $span too wide for exact bucket math at 2^$DimBits buckets")
    // Divide is double-typed in both engines; floor is EXACT here because
    // the numerator stays under 2^53 and the true quotient is at least
    // 1/span away from the next integer when not integral — far wider
    // than the quotient's ulp. Both engines round identically, so the
    // oracle can reproduce the bucket bit-for-bit with the same spelling.
    floor((v - lit(min)) * lit(1L << DimBits) / lit(span.toLong)).cast("long")
  }

  /** The z key for two long-valued columns with driver-known bounds. */
  def zkey(x: Column, xMin: Long, xMax: Long, y: Column, yMin: Long, yMax: Long): Column =
    interleave16(bucket(x, xMin, xMax), bucket(y, yMin, yMax))

  /** Z-ordered parquet layout: bucketize both dims from one min/max
    * aggregate (a driver scalar fetch, like a sink's commit metadata),
    * range-partition files by z, sort row groups by z, drop the key.
    * Bounds are computed on the input — for an APPEND workload compute
    * them once from expected domain bounds instead so file N+1 sorts by
    * the same curve as file 0. */
  def writeZOrderedBy(df: DataFrame, dir: String, xCol: String, yCol: String,
      numFiles: Int = 0): Unit = {
    val Array(b) = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).collect()
    // no usable bounds on EITHER dim (empty input, or a dim that is
    // all-null / not castable to long): nothing to cluster, keep the
    // write — and treat both dims the same way
    if ((0 to 3).exists(b.isNullAt)) {
      df.write.mode("overwrite").parquet(dir)
      return
    }
    val z = zkey(col(xCol).cast("long"), b.getLong(0), b.getLong(1),
      col(yCol).cast("long"), b.getLong(2), b.getLong(3))
    val keyed = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
