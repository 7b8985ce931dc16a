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
