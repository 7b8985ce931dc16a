package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two keyed snapshots of the same table — the
  * CDC-extraction shape (what changed between yesterday's and today's
  * dump) that feeds [[Upsert]] and the streaming snapshot maintenance.
  *
  * Scale design (100 TB snapshots):
  *  - ONE co-partitioned full-outer join on the key columns; both sides
  *    hash-exchange exactly once. No windows, no broadcast (both sides
  *    are full-table scale).
  *  - Payload equality travels as a single xxhash64 over the compare
  *    columns, computed map-side BEFORE the exchange — the shuffle
  *    carries (key, 8-byte hash) instead of the full row width, which is
  *    the difference between shuffling 100 TB and shuffling a few TB of
  *    keys. The emitted feed re-reads nothing: unchanged rows (the
  *    dominant case) are dropped before they ever materialize.
  *  - Hash-equality is a one-sided risk: a 64-bit collision — or a null
  *    moving between adjacent payload columns (xxhash64 skips nulls, so
  *    ("A", null) and (null, "A") digest identically) — would class an
  *    update as unchanged (never corrupts an insert/delete). For
  *    audit-grade diffs call with `byValue = true`, which compares the
  *    payload columns directly (wider shuffle, zero false-unchanged).
  */
object SnapshotDiff {

  /** Change feed: key columns plus a `change_type` column
    * ('insert' | 'delete' | 'update'); unchanged rows are dropped. */
  def changes(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      byValue: Boolean = false): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty)
    val keyCols = keys.map(col)
    if (byValue) {
      val o = oldSnap.select((keyCols :+ struct(compareCols.map(col): _*).as("_p_old")): _*)
      val n = newSnap.select((keyCols :+ struct(compareCols.map(col): _*).as("_p_new")): _*)
      classify(o.join(n, keys, "full_outer"), keys,
        oldSide = col("_p_old"), newSide = col("_p_new"))
    } else {
      val o = oldSnap.select((keyCols :+ xxhash64(compareCols.map(col): _*).as("_h_old")): _*)
      val n = newSnap.select((keyCols :+ xxhash64(compareCols.map(col): _*).as("_h_new")): _*)
      classify(o.join(n, keys, "full_outer"), keys,
        oldSide = col("_h_old"), newSide = col("_h_new"))
    }
  }

  private def classify(
      joined: DataFrame, keys: Seq[String],
      oldSide: org.apache.spark.sql.Column,
      newSide: org.apache.spark.sql.Column): DataFrame =
    joined
      .withColumn("change_type",
        when(oldSide.isNull, lit("insert"))
          .when(newSide.isNull, lit("delete"))
          // null-safe inequality: payload fields may themselves be null
          // in byValue mode, and `=!=` would yield NULL (→ silently
          // unchanged) instead of a detected update
          .when(!(oldSide <=> newSide), lit("update")))
      .filter(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type")): _*)
}
