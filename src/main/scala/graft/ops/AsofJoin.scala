package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * right.ts <= left.ts within the same key — THE time-series join Spark
  * has no native operator for (forecast-issue alignment, last-known-
  * value lookups).
  *
  * Implementation is the union-and-carry pattern, not a range join:
  * tag both sides, union, and let a single window ordered by
  * (ts, side-tag) carry the last right-side payload forward to each
  * left row. One shuffle on the key, state bounded per key, no
  * candidate-pair blowup — this is the shape that survives 100 TB,
  * unlike the naive `left.ts >= right.ts` theta-join whose intermediate
  * is O(|L|·|R|) per key.
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     rows providing the carried payload
    * @param keyCols   equi-key columns present on both sides
    * @param tsCol     event-time column present on both sides
    * @param payload   right-side columns to carry (renamed as-is onto left)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side tag 0 = right, 1 = left: at equal ts the right row sorts first,
    // so `<=` semantics (DuckDB ASOF ON left.ts >= right.ts) hold.
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(0).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(1).as("__side")) ++
        payload.map(c => lit(null).as(s"__p_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(s"asof_$c")): _*)
  }
}
