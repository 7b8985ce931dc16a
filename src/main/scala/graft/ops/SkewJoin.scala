package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join (inner or left-outer), driven by the
  * Count-Min sketch: one
  * fixed-memory sketch pass over the fact side finds the hot keys, the
  * dimension rows for JUST those keys broadcast (the hot slice of a
  * dimension is tiny even when the whole dimension is not
  * broadcastable), and the cold remainder takes the ordinary shuffle
  * join. The result is exactly the plain inner join — the regime split
  * is physical, not semantic.
  *
  * This is AQE's skew-join mitigation as an explicit, composable
  * operator, for the cases AQE cannot see: skew known ahead of a
  * multi-stage pipeline, a right side above the broadcast budget whose
  * hot slice is not, or an engine run with AQE disabled. It composes
  * the round's sketch machinery the way [[SaltedAgg]] composes
  * two-phase aggregation: detection costs O(d·w) memory regardless of
  * fact size, and the hot-key COLLECT is provably bounded — at most
  * count/threshold true-hot keys exist, and CMS over-candidates are
  * capped the same way because estimates only ever overshoot by the
  * shared-cell load.
  *
  * At 100 TB: the fact side is scanned twice (sketch + join) — cheap
  * relative to the shuffle it avoids on the hot keys, and the sketch
  * pass is a natural piggyback on any preceding stage that already
  * scans the fact.
  */
object SkewJoin {

  /** @param hotThreshold fact-row count above which a key is "hot"
    * @return exactly `fact.join(dim, Seq(key))`, skew-split physically
    */
  def inner(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int = 4096, d: Int = 4): DataFrame =
    split(fact, dim, key, hotThreshold, w, d, "inner")

  /** Left-outer variant: unmatched fact rows (including null keys)
    * survive with null dim columns, exactly as in the plain left join —
    * both the hot and cold regimes preserve their left side, so the
    * union is the full fact. */
  def leftOuter(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int = 4096, d: Int = 4): DataFrame =
    split(fact, dim, key, hotThreshold, w, d, "left_outer")

  private def split(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int, d: Int, joinType: String): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    // 60-bit md5-derived hash (not xxhash64: CountMin's bit-sliced rows
    // need uniform independent bits) — the library's one shared hash
    // spelling, so the sketch and every oracle query stay on one contract
    val h = expr(graft.queries.Shingles.h60(s"CAST($key AS STRING)"))
    // null keys match nothing in either join type; they must also never
    // reach the sketch (a null hash would explode to null cells and NPE
    // the matrix densify). In left_outer they re-enter via the cold side.
    val cms = CountMin.build(
      fact.filter(col(key).isNotNull).select(h.as("h")), "h", w, d)
    val est = CountMin.estimate(cms, w, h)

    // the hot-key SET: bounded driver state (≤ count/threshold true-hot
    // keys; sketch overshoot admits at most the same order again)
    val hotKeys = fact.filter(col(key).isNotNull && est >= hotThreshold)
      .select(col(key)).distinct().collect().map(_.get(0))

    if (hotKeys.isEmpty) fact.join(dim, Seq(key), joinType)
    else {
      val isHot = col(key).isin(hotKeys.toIndexedSeq: _*)
      val hotSide = fact.filter(isHot)
        .join(broadcast(dim.filter(isHot)), Seq(key), joinType)
      val coldSide = fact.filter(!isHot || col(key).isNull)
        .join(dim, Seq(key), joinType)
      hotSide.unionByName(coldSide)
    }
  }
}
