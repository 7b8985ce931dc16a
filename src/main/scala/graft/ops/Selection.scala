package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort.
  *
  * A total sort of 100 TB shuffles 100 TB once to answer one quantile;
  * `percentile_approx` avoids that but is, by construction, approximate.
  * This is the third point of the trade-off: EXACT k-th smallest in a
  * handful of histogram passes, shuffling only a `fanout`-row histogram
  * per pass.
  *
  * Each pass buckets the surviving value range into `fanout` equal-width
  * bins, counts rows per bin (map-side partial aggregation — the data
  * rows never move, only the tiny per-partition histograms meet), finds
  * the bin holding the k-th element from the cumulative counts, and
  * descends into it. The candidate predicate (`col BETWEEN lo AND hi`)
  * is a plain range filter, so on a range-sorted/z-ordered layout each
  * pass also PRUNES row groups — later passes read a shrinking slice of
  * the table. When the surviving bin's population fits comfortably on
  * the driver the remainder is sorted locally.
  *
  * Mirrors the selection problem the reference solves with
  * pandas.quantile over in-memory frames (metrics/summary.py) — the
  * reference can sort because it holds the column in RAM; at engine
  * scale the histogram descent is the standard spelling (Blum et al.
  * selection, adapted to fixed-width histograms).
  */
object Selection {

  /** k-th smallest (1-based) value of numeric column `c` in `df`.
    * Deterministic and exact for any multiset: equal values are
    * interchangeable under order statistics, so tie order is
    * irrelevant. NaNs must be filtered by the caller (they have no
    * place in an order statistic); nulls are ignored.
    *
    * `maxPasses` bounds the descent for adversarial distributions
    * (values clustered within double-ulp ranges): when hit, falls back
    * to sorting the surviving candidates distributed-side via top-k —
    * still exact, never silently approximate.
    */
  def kthSmallest(
      df: DataFrame,
      c: String,
      k: Long,
      fanout: Int = 1024,
      collectThreshold: Long = 65536,
      maxPasses: Int = 8): Double = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(col(c).cast("double").as("v")).filter(col("v").isNotNull)
    val Array(row) = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).collect()
    val n = row.getLong(0)
    require(k <= n, s"k=$k exceeds non-null count $n")
    var lo = row.getDouble(1)
    var hi = row.getDouble(2)
    var kRem = k
    var candidates = n
    var passes = 0
    while (candidates > collectThreshold && lo < hi && passes < maxPasses) {
      val width = (hi - lo) / fanout
      if (width == 0d) return lo // range collapsed below double resolution
      // equal-width bin index, clamped so v == hi lands in the last bin.
      // floor() is monotonic in v, so each bin's membership is an
      // interval of the value domain — which lets the next pass's bounds
      // be the bin's ACTUAL min/max (collected in the same histogram
      // aggregate) instead of arithmetic bin edges: an edge recomputed as
      // lo + width*b can land an ulp off the assignment formula and
      // silently drop a boundary value between passes.
      val bin = least(floor((col("v") - lit(lo)) / lit(width)), lit(fanout - 1))
      val hist = vals
        .filter(col("v") >= lit(lo) && col("v") <= lit(hi))
        .groupBy(bin.cast("int").as("b"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      var cum = 0L
      var b = 0
      def cnt(i: Int): Long = hist.get(i).map(_._1).getOrElse(0L)
      while (b < fanout && cum + cnt(b) < kRem) { cum += cnt(b); b += 1 }
      kRem -= cum
      val (c0, mn, mx) = hist(b)
      candidates = c0
      lo = mn; hi = mx
      if (lo == hi) return lo // the whole surviving bin is one value
      passes += 1
    }
    // remainder: exact k-th of the surviving range via distributed top-k
    // (sort + limit over <= collectThreshold rows — tiny)
    vals.filter(col("v") >= lit(lo) && col("v") <= lit(hi))
      .orderBy(col("v")).limit(kRem.toInt)
      .orderBy(col("v").desc).limit(1)
      .collect()(0).getDouble(0)
  }

  /** Exact discrete quantiles (k = ceil(q*n), 1-based) — one
    * [[kthSmallest]] descent per requested q over the same frame. */
  def quantilesDisc(df: DataFrame, c: String, qs: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(c).cast("double").as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    qs.map { q =>
      require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
      kthSmallest(vals, "v", math.ceil(q * n).toLong)
    }
  }
}
