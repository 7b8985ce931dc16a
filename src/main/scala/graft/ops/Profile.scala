package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution profiling for drift monitoring (the library form of the
  * `a19_profile_drift` query's kernel — that query pins the PSI formula
  * against the DuckDB oracle; ProfileSpec pins this op against it, and
  * the streaming gate reuses it per micro-batch).
  *
  * Scale design: a profile is a SKETCH — (segment, bin, n) with
  * ≤ |segments|×bins rows regardless of input size. Building one is a
  * single map-side-partial hash aggregate over one scan; comparing two
  * is arithmetic on sketch rows. Nothing here ever holds row-scale
  * state, so the same code paths serve a 100 TB batch profile and a
  * micro-batch admission gate.
  */
object Profile {

  /** Fixed-width histogram cells per segment: (seg, bin, n).
    * Values below `lo` clamp to bin 0, above the top to bin `bins−1` —
    * a drifting tail lands in the edge bins instead of vanishing. */
  def cells(
      df: DataFrame, segCol: String, valCol: String,
      bins: Int, lo: Double, width: Double): DataFrame = {
    require(bins > 1 && width > 0)
    df.filter(col(segCol).isNotNull && col(valCol).isNotNull)
      .select(col(segCol).as("seg"),
        least(lit(bins - 1),
          greatest(lit(0L), floor((col(valCol) - lo) / width))).cast("int").as("bin"))
      .groupBy(col("seg"), col("bin")).agg(count(lit(1)).as("n"))
  }

  /** Merge cell sketches — e.g. fold an admitted batch's profile into
    * the reference the drift gate scores against, or combine per-shard
    * profiles built independently. The sketch is mergeable by
    * construction (counts add), so reference maintenance never
    * re-reads history: union + one re-aggregate over sketch rows. */
  def mergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("seg"), col("bin")).agg(sum(col("n")).as("n"))

  /** O23b: the 100 TB table census — o23's exact multi-distinct swaps
    * for the HLL++ sketch (`approx_count_distinct`) so the one-pass
    * aggregate plans WITHOUT an Expand node: the exact multi-distinct
    * rewrite replicates every scanned row once per distinct aggregate
    * (4 columns ⇒ a 5× row blow-up through the exchange), while the
    * sketch keeps one row per input row and merges fixed-size register
    * arrays (order-independent max-merge, so the estimate is
    * deterministic for a given dataset). Same long (column, metric)
    * layout as the exact census; means ride the DECIMAL-sum + floor
    * display recipe. Accuracy is contract-gated by
    * `o23b_table_profile_approx` (the a14 pattern) — this builder is
    * the production path and never computes the exact twin. */
  def tableProfileApprox(
      df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        approx_count_distinct(col(c), rsd).as(s"${c}_distinct"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        graft.core.Parity.floorRound4(
          sum(col(c).cast("decimal(28,10)")).cast("double") / count(col(c)))
          .as(s"${c}_mean")))
    // persisted 1-row frame: the long layout fans out as one select per
    // column and must not replay the scan per branch (the o23 contract)
    val wide = df.agg(aggs.head, aggs.tail: _*).persist()
    cols.map { c =>
      wide.select(
        lit(c).as("column_name"),
        col("n_rows").cast("bigint").as("n_rows"),
        col(s"${c}_nulls").cast("bigint").as("n_nulls"),
        col(s"${c}_distinct").cast("bigint").as("n_distinct_approx"),
        col(s"${c}_min").cast("double").as("min_v"),
        col(s"${c}_max").cast("double").as("max_v"),
        col(s"${c}_mean").cast("double").as("mean_v"))
    }.reduce(_ unionAll _).orderBy(col("column_name"))
  }

  /** Population stability index of `cur` against `ref`, per segment:
    * (seg, n_ref, n_cur, psi). Proportions are additively smoothed —
    * p = (n + 0.5) / (N + bins/2) — so bins empty on one side stay
    * finite (the a19 spelling). Segments present in only one side get
    * all-zero counts on the other (maximal but finite drift). Pure
    * sketch arithmetic: inputs are cell tables, the dense seg×bin grid
    * is built from their union — no raw-data access, and the per-seg
    * windows run over ≤ bins rows per partition. */
  def psi(ref: DataFrame, cur: DataFrame, bins: Int): DataFrame = {
    require(bins > 1)
    val segs = ref.select(col("seg")).union(cur.select(col("seg"))).distinct()
    val grid = segs.crossJoin(
      ref.sparkSession.range(bins).select(col("id").cast("int").as("bin")))
    val joined = grid
      .join(ref.withColumnRenamed("n", "n_r"), Seq("seg", "bin"), "left")
      .join(cur.withColumnRenamed("n", "n_c"), Seq("seg", "bin"), "left")
      .select(col("seg"), col("bin"),
        coalesce(col("n_r"), lit(0L)).as("n_r"),
        coalesce(col("n_c"), lit(0L)).as("n_c"))
    val perSeg = Window.partitionBy(col("seg"))
    joined
      .withColumn("tot_r", sum(col("n_r")).over(perSeg))
      .withColumn("tot_c", sum(col("n_c")).over(perSeg))
      .withColumn("p_r", (col("n_r") + 0.5) / (col("tot_r") + bins / 2.0))
      .withColumn("p_c", (col("n_c") + 0.5) / (col("tot_c") + bins / 2.0))
      .groupBy(col("seg"))
      .agg(max(col("tot_r")).as("n_ref"), max(col("tot_c")).as("n_cur"),
        sum((col("p_c") - col("p_r")) * log(col("p_c") / col("p_r"))).as("psi"))
  }
}
