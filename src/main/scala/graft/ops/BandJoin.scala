package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric band join: pair rows with |left.value − right.value| <= delta
  * (optionally within equi-keys) — the 1-D numeric sibling of
  * [[IntervalJoin]], and another shape Spark would plan as a
  * nested-loop theta-join.
  *
  * Shape: both sides bucket at width delta (`floor(v / delta)`); two
  * values within delta are in the same or adjacent buckets, so the
  * LEFT side explodes into its bucket ± 1 (exactly 3 rows), the right
  * side keeps its single bucket, and a plain hash equi-join on the
  * bucket plus the exact residual predicate finishes. Each true pair
  * meets exactly once — the right row owns one bucket — so SQL join
  * multiplicity is preserved with no distinct. Candidate volume is
  * O(3·|L| + |R|) shuffle rows and pairs proportional to actual band
  * density, never |L|×|R|.
  */
object BandJoin {

  /** Inner band join on double-typed columns. Output: left.* then
    * right.* (names must not collide). */
  def band(
      left: DataFrame, right: DataFrame,
      lCol: String, rCol: String,
      delta: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(delta > 0, "delta must be positive")
    // withColumn would silently OVERWRITE a caller column of the same
    // name (and the trailing drop would then destroy caller data) —
    // reject the collision instead of corrupting output
    require(!left.columns.contains("__band") && !right.columns.contains("__band"),
      "input columns must not be named __band (internal bucket column)")
    val lb = left.withColumn("__band",
      explode(array((-1 to 1).map(off =>
        floor(col(lCol) / delta).cast("long") + off): _*)))
    val rb = right.withColumn("__band", floor(col(rCol) / delta).cast("long"))
    val residual = abs(lb(lCol) - rb(rCol)) <= delta
    val joined = lb.join(rb, lb("__band") === rb("__band") &&
        keys.map(k => lb(k) === rb(k)).foldLeft(residual)(_ && _))
      .drop("__band")
    keys.foldLeft(joined)((df, k) => df.drop(rb(k)))
  }
}
