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
    // The whole right payload travels as ONE struct so a single
    // last(ignoreNulls) picks the most recent right ROW: null payload
    // fields of that row are preserved (not skipped for a staler non-null
    // value), and multiple payload columns can never mix rows — matching
    // DuckDB ASOF JOIN most-recent-row semantics.
    val payloadStruct = struct(payload.map(c => col(c).as(c)): _*)
    val payloadType = right.select(payloadStruct.as("__p")).schema.head.dataType
    // side tag 0 = right, 1 = left: at equal ts the right row sorts first,
    // so `<=` semantics (DuckDB ASOF ON left.ts >= right.ts) hold.
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(0).as("__side") :+ payloadStruct.as("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }
}
