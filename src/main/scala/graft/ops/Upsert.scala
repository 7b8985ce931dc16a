package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style keep-latest upsert merge — the batch MERGE a pipeline needs
  * to fold a change feed into a keyed snapshot (reference runs are
  * append-only; this is the steady-state mutation shape a 100 TB corpus
  * store needs on top of it).
  *
  * Semantics: rows from `updates` replace rows from `base` with the same
  * key; within either side the row with the greatest `orderBy` tuple
  * wins, and on a full tie the update side wins. Output carries exactly
  * the input columns.
  *
  * Scale shape: ONE aggregation over the unioned inputs —
  * `max_by(struct(all columns), struct(orderBy…, side))`. A struct-typed
  * aggregate buffer keeps this out of whole-stage HashAggregate (Spark
  * plans a SortAggregate pair), but the part that matters at 100 TB
  * survives: the PARTIAL max_by runs map-side before the exchange, so
  * each mapper's sort is local and the shuffle carries one candidate row
  * per (mapper, key) — O(distinct keys), no matter how hot a key's
  * change history is — where a row_number window would shuffle every
  * change-log row and sort whole reducer partitions. At production scale
  * `base` is the previous snapshot partition and `updates` the day's
  * feed; the same one-agg plan holds. UpsertSpec pins the plan: partial
  * aggregation below the single exchange, no Window operator.
  */
object Upsert {

  /** @param keys     identity columns (the MERGE ON clause)
    * @param orderBy  recency columns, compared lexicographically; callers
    *                 should end with a unique tiebreak (an id) so the
    *                 winner is deterministic, not first-encountered
    */
  def mergeLatest(
      base: DataFrame, updates: DataFrame,
      keys: Seq[String], orderBy: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(orderBy.nonEmpty, "need at least one recency column")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"schema mismatch: base ${cols.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    val missing = (keys ++ orderBy).filterNot(cols.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val side = "__upsert_side"
    val tagged = base.withColumn(side, lit(0))
      .unionByName(updates.withColumn(side, lit(1)))
    val recency: Column = struct((orderBy.map(col) :+ col(side)): _*)
    val winner = tagged
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), recency).as("__row"))
      .select(col("__row.*"))
    winner
  }

  /** Tombstone expiry — the state bound for delete-aware snapshots.
    *
    * A CDC feed with deletes keeps the DELETE rows in the snapshot
    * (is-delete flag), because recency must survive the deletion: if
    * the tombstone vanished immediately, an out-of-order OLDER update
    * arriving later would find no stored row to lose against and
    * resurrect the key. But a tombstone only needs to outlive the
    * feed's out-of-order horizon; past it, the row is dead weight —
    * at 100 TB a churn-heavy key space would otherwise grow the
    * snapshot with every key ever deleted. This drops tombstones whose
    * recency column is older than `horizon` — exactly the watermark
    * eviction rule, applied at the storage grain. Pure filter: no
    * shuffle, partition-prunable when the snapshot is recency-
    * partitioned. */
  def expireTombstones(
      snapshot: DataFrame, deleteCol: String, recencyCol: String,
      horizon: Column): DataFrame =
    snapshot.filter(!col(deleteCol) || col(recencyCol) >= horizon)

  /** Collapse one frame to its latest row per key — the single-side
    * case of [[mergeLatest]] (same one-aggregation plan), used to
    * seed a snapshot from the first change batch. */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(orderBy.nonEmpty, "need at least one recency column")
    val cols = df.columns.toSeq
    val missing = (keys ++ orderBy).filterNot(cols.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), struct(orderBy.map(col): _*)).as("__row"))
      .select(col("__row.*"))
  }
}
