package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair rows whose [start, end] date intervals
  * intersect (optionally also matching equi-keys), without the
  * nested-loop theta-join Spark would otherwise plan for
  * `l.start <= r.end AND r.start <= l.end`.
  *
  * Shape: both sides explode map-side into the fixed-width time bins
  * their interval covers — an interval of length L lands in
  * O(L/binDays + 1) rows — then a plain hash equi-join ON the bin
  * (plus any caller equi-keys) meets only temporally-close candidates
  * and a residual predicate keeps true overlaps.
  *
  * Multiplicity is preserved WITHOUT a distinct: a true pair meets in
  * every shared bin, so the join keeps only the bin containing the
  * overlap's start (`bin == floor(greatest(lStart, rStart) / binDays)`)
  * — each matching row pair survives exactly once, duplicate input
  * rows stay duplicated (SQL join semantics), and the plan has no
  * dedup exchange at all. Candidate volume tracks overlap density,
  * never |L|×|R|; the same plan at 100 TB shuffles each row a handful
  * of times regardless of table sizes.
  */
object IntervalJoin {

  /** Inner overlap join of `left` and `right` on date-typed interval
    * columns. Output columns: left.* then right.* (names must not
    * collide — prefix beforehand if they do).
    *
    * @param binDays bin width; pick ≈ the typical interval length so
    *                most intervals land in 1–2 bins
    * @param keys    extra equi-key column names present on both sides
    */
  def overlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binDays: Int = 7,
      keys: Seq[String] = Nil): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    // withColumn would silently OVERWRITE a caller column of the same
    // name (and the trailing drop would then destroy caller data) —
    // reject the collision instead of corrupting output
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "input columns must not be named __bin (internal bin column)")
    // all bin math is Column-based (never name-based expr) so the join
    // condition resolves unambiguously even when both sides share names
    def bin(c: Column): Column = floor(unix_date(c) / binDays)
    def bins(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin", explode(sequence(bin(col(s)), bin(col(e)))))
    val lb = bins(left, lStart, lEnd)
    val rb = bins(right, rStart, rEnd)
    val overlapPred =
      lb(lStart) <= rb(rEnd) && rb(rStart) <= lb(lEnd) &&
        // first-overlap-bin guard: emit each true pair exactly once
        lb("__bin") === bin(greatest(lb(lStart), rb(rStart)))
    val joined = lb.join(rb, lb("__bin") === rb("__bin") &&
        keys.map(k => lb(k) === rb(k)).foldLeft(overlapPred)(_ && _))
      .drop("__bin")
    keys.foldLeft(joined)((df, k) => df.drop(rb(k)))
  }
}
