package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed stats table against a CDC feed —
  * the library form of the `o19_incremental_agg` query (see the oracle
  * entry in queries/CoreQueries.scala for the DuckDB-checked instance).
  *
  * The refresh never rescans the fact for the mergeable state and
  * rescans ONLY delta-touched groups for the rest:
  *  - `n` and each `sum_<c>` are abelian-group state: a delete retracts
  *    as weight −1, so the stored aggregate merges with the (tiny)
  *    signed delta aggregate in one full-outer join keyed by group;
  *  - each `min_<c>`/`max_<c>` is only semigroup state (a delete can
  *    remove the current extremum), so those columns recompute from the
  *    updated table — restricted by a semi join to the touched groups,
  *    which against partitioned/row-group-sorted storage is partition
  *    pruning, not a scan.
  * Untouched groups keep their stored row byte-for-byte; groups whose
  * rows are all deleted drop out (n reaches 0); brand-new groups enter
  * through the merge's full-outer side.
  *
  * Contract: `maintain(stored, changes, updated, spec)` equals
  * `storedAggregate(updated, spec)` row for row (IncrementalAggSpec
  * pins this, plus the semi-join/full-outer plan shape). Sums are
  * maintained in double.
  */
object IncrementalAgg {

  /** keys → grouping columns; sumCols → maintained as n/sum (mergeable);
    * minMaxCols → maintained as min/max (recomputed for touched groups). */
  final case class Spec(keys: Seq[String], sumCols: Seq[String], minMaxCols: Seq[String])

  private def outCols(spec: Spec) =
    spec.keys.map(col) ++ (col("n") +:
      (spec.sumCols.map(c => col(s"sum_$c")) ++
        spec.minMaxCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c")))))

  /** The stored aggregate (the materialized table this operator keeps
    * current): one hash aggregate with map-side partials. */
  def storedAggregate(table: DataFrame, spec: Spec): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      (spec.sumCols.map(c => sum(col(c).cast("double")).as(s"sum_$c")) ++
        spec.minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    table.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(outCols(spec): _*)
  }

  /** Refresh `stored` to equal `storedAggregate(updated, spec)`.
    *
    * @param signedChanges the CDC feed: the table's columns plus a
    *   weight column `w` (+1 insert, −1 delete; an update is a −1/+1
    *   pair). Small relative to the fact — it is the thing that changed.
    * @param updated the post-change logical table, read ONLY for
    *   min/max of touched groups (key-pruned). Pass the storage handle,
    *   not a recomputed union, so pruning reaches the scan.
    */
  def maintain(stored: DataFrame, signedChanges: DataFrame, updated: DataFrame,
      spec: Spec): DataFrame = {
    val k = spec.keys
    val deltaAggs = sum(col("w")).as("dn") +:
      spec.sumCols.map(c => sum(col("w") * col(c).cast("double")).as(s"dsum_$c"))
    val delta = signedChanges.groupBy(k.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)
    val merged = stored.join(delta, k, "full_outer")
      .select(k.map(col) ++
        ((coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n") +:
          spec.sumCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0.0)) + coalesce(col(s"dsum_$c"), lit(0.0)))
              .as(s"sum_$c"))): _*)
      .filter(col("n") > 0)
    if (spec.minMaxCols.isEmpty) merged.select(outCols(spec): _*)
    else {
      val affected = delta.select(k.map(col): _*)
      val mmAggs = spec.minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      val mm = updated.join(affected, k, "left_semi")
        .groupBy(k.map(col): _*).agg(mmAggs.head, mmAggs.tail: _*)
      val touched = merged.join(affected, k, "left_semi").join(mm, k)
      val untouched = stored.join(affected, k, "left_anti")
      touched.select(outCols(spec): _*).unionByName(untouched.select(outCols(spec): _*))
    }
  }
}
