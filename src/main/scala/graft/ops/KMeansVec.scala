package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an `array<float>`
  * embedding column — the coarse-quantizer fit that replaces
  * SimilarityQueries' deterministic vec_id<8 centroid choice at scale,
  * and a corpus-curation primitive in its own right (domain clustering
  * for training-data mixing).
  *
  * Spark shape per round: centroids are DRIVER state (k·d doubles —
  * tiny), so assignment is a pure MAP-SIDE expression over literal
  * centroid arrays (no join, no window), and the update is one
  * (cell, dim) aggregation — exactly one shuffle per round, O(k·d)
  * rows collected. Nothing else leaves the executors. At 1000
  * executors the shuffle carries k·d partial sums per partition,
  * independent of row count.
  *
  * Determinism (the oracle hash-matches a DuckDB mirror):
  *  - init = embeddings of the k smallest ids (no RNG);
  *  - distances accumulate left-to-right in double via the fused
  *    vec_l2sq expression (bit-equal with the zip_with/aggregate HOF
  *    shape it replaced), ties broken by lowest cell id;
  *  - per-dim means use exact decimal(25,8) sums before the double
  *    division, so summation order can't flip a low bit.
  */
object KMeansVec {

  /** One Lloyd round's centroids after `iters` update steps.
    * @param emb frame with `idCol` (orderable init key) and `embCol`
    * @param k cluster count (init = k smallest ids)
    * @param iters update rounds (assign → mean) after init
    * @return centroids as doubles, index = cell id
    */
  def fit(emb: DataFrame, idCol: String, embCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got k=$k, iters=$iters)")
    // every Lloyd round re-reads the input: cache the two needed columns
    // once instead of re-scanning (and re-decoding) the source per round
    val cached = emb.select(col(idCol), col(embCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = cached.orderBy(col(idCol)).limit(k).select(col(embCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      require(init.length == k, s"need at least $k rows to seed $k centroids, got ${init.length}")
      var cents = init
      var it = 0
      while (it < iters) {
        cents = updateStep(cached, embCol, cents)
        it += 1
      }
      cents
    } finally cached.unpersist(false)
  }

  /** Top-`nprobe` cell ids by (squared-L2 asc, cid asc) as an array of
    * structs — multi-probe cell assignment for IVF-style indexes built
    * on these centroids. Map-side over literal arrays; the distance is
    * the left-to-right vec_l2sq accumulation, identical to the DuckDB
    * list_reduce spelling. */
  def probeCellsExpr(embCol: String, cents: Array[Array[Double]], nprobe: Int): Column = {
    val entries = cents.zipWithIndex.map { case (c, cid) =>
      // explicit cast names the fields: aliases inside struct() are
      // dropped when the entry contains a higher-order-function lambda
      struct(dist2(embCol, c), lit(cid)).cast("struct<d2:double,cid:int>")
    }
    slice(array_sort(array(entries.toIndexedSeq: _*)), 1, nprobe)
  }

  /** Map-side nearest-cell id: argmin squared L2, ties to lowest cid. */
  def cellExpr(embCol: String, cents: Array[Array[Double]]): Column =
    element_at(probeCellsExpr(embCol, cents, 1), 1).getField("cid")

  /** Top-`nprobe` cell ids as a plain `array<int>` via the fused
    * matrix kernel ([[graft.functions.VecTopCells]]): same distances,
    * same (d2 asc, cid asc) order as [[probeCellsExpr]], but the
    * centroid matrix rides the plan as ONE reference object instead of
    * K per-centroid literal subtrees — the spelling that stays
    * codegen-sized when K is CORPUS-SCALED (K ≈ N / targetCellSize,
    * hundreds of cells and up). Use this for scaled quantizers;
    * [[probeCellsExpr]] remains for small fixed K where the per-cell
    * d2 values themselves are needed. */
  def topCellsExpr(embCol: String, cents: Array[Array[Double]],
      nprobe: Int): Column =
    graft.functions.VecTopCells.cells(col(embCol), cents, nprobe)

  /** Squared L2 distance to one literal centroid, double left-to-right —
    * the fused vec_l2sq expression (codegen loop; VecL2SqSpec pins
    * bit-equality with the HOF `aggregate(zip_with(...))` spelling this
    * replaced, so oracle results are unchanged). Built directly as an
    * expression: no function-registry dependency for library callers. */
  def dist2(embCol: String, cent: Array[Double]): Column = {
    val cArr = array(cent.toIndexedSeq.map(lit(_)): _*)
    org.apache.spark.sql.graft.PlanBridge.column(
      graft.functions.VecL2Sq(
        org.apache.spark.sql.graft.PlanBridge.expression(col(embCol)),
        org.apache.spark.sql.graft.PlanBridge.expression(cArr)))
  }

  /** One Lloyd update: assign every row map-side, then per-(cell, dim)
    * exact-decimal mean — the round's single shuffle. Cells that end up
    * empty keep their previous centroid (standard Lloyd fallback). */
  private def updateStep(emb: DataFrame, embCol: String,
      cents: Array[Array[Double]]): Array[Array[Double]] = {
    val d = cents(0).length
    // fused-matrix assignment: identical arithmetic and tie rule as
    // cellExpr (VecTopCellsSpec pins the equivalence), but one
    // reference object instead of K literal subtrees — what lets fit()
    // carry a corpus-scaled K without blowing codegen limits.
    // The assignment is materialized in its OWN projection before the
    // posexplode: spelled inside the same select, the Generate planning
    // re-evaluates the K·d kernel once per EXPLODED row — a silent d×
    // multiplier on the fit (8× wall measured at K=79, d=64)
    val means = emb
      .withColumn("__cell", element_at(topCellsExpr(embCol, cents, 1), 1))
      .select(col("__cell").as("cell"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("v").cast("decimal(25,8)")).cast("double") / count(lit(1))).as("m"))
      .collect()
    val next = cents.map(_.clone())
    means.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    // rows for a cell appear either for all d dims or none; partial
    // overwrite would mean a lost dim row, which the groupBy can't produce
    require(means.length % d == 0, s"ragged mean rows: ${means.length} not a multiple of $d")
    next
  }
}
