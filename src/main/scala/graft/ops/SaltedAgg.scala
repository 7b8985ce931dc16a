package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation — the skew-safe GROUP BY for hot keys
  * (one boilerplate domain, one null-ish bucket) that would otherwise
  * pin a single reducer at 100 TB.
  *
  * Phase 1 aggregates per (keys, salt): a hot key's rows spread over
  * `salts` reducers and map-side combine still applies. Phase 2 merges
  * the ≤`salts` partials per key, so the second shuffle carries
  * O(keys·salts) rows, not O(rows). Only MERGEABLE aggregates qualify
  * (sum/count/min/max and friends — avg must be carried as sum+count);
  * the `Spec` constructors below encode the partial/merge pair so the
  * decomposition can't drift.
  *
  * Exact decimal sums (the default for doubles) make results identical
  * to the unsalted GROUP BY regardless of how rows split across salts —
  * `a13_salted_agg` pins that equality against the DuckDB oracle.
  */
object SaltedAgg {

  /** One output column: `partial` runs over rows within (keys, salt),
    * `merge` combines the partials per key. */
  final case class Spec(out: String, partial: Column, merge: Column => Column)

  def sumLong(c: Column, out: String): Spec = Spec(out, sum(c), sum)

  /** Order-independent exact sum for fractional inputs. */
  def sumDecimal(c: Column, out: String, precision: Int = 25, scale: Int = 8): Spec =
    Spec(out, sum(c.cast(s"decimal($precision,$scale)")), sum)

  def countRows(out: String): Spec = Spec(out, count(lit(1)), sum)
  def minOf(c: Column, out: String): Spec = Spec(out, min(c), min)
  def maxOf(c: Column, out: String): Spec = Spec(out, max(c), max)

  /** @param saltKey any well-distributed column (an id, a hash); rows
    *                with equal saltKey land on the same salt, which is
    *                fine — distribution is what matters, not uniqueness
    */
  def aggregate(df: DataFrame, keys: Seq[String], saltKey: Column, salts: Int,
      specs: Seq[Spec]): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(specs.nonEmpty, "need at least one aggregate spec")
    require(specs.map(_.out).distinct.size == specs.size,
      s"duplicate output names in specs: ${specs.map(_.out).mkString(", ")} — " +
        "each Spec needs a distinct out (the partial column is derived from it)")
    val pCols = specs.map(sp => sp.partial.as(s"__p_${sp.out}"))
    val partial = df
      .withColumn("__salt", pmod(saltKey, lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(pCols.head, pCols.tail: _*)
    val mCols = specs.map(sp => sp.merge(col(s"__p_${sp.out}")).as(sp.out))
    partial
      .groupBy(keys.map(col): _*)
      .agg(mCols.head, mCols.tail: _*)
  }
}
