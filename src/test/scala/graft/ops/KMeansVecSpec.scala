package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansVecSpec extends SparkSpec {
  import spark.implicits._

  private def toF(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("two obvious clusters: centroids converge to the cluster means") {
    // cluster A around (0,0), cluster B around (10,10); ids chosen so the
    // k=2 init (smallest ids) starts one centroid in each cluster
    val rows = Seq(
      (0L, toF(0.0, 0.1)), (2L, toF(0.2, -0.1)), (4L, toF(-0.2, 0.0)),
      (1L, toF(10.0, 10.1)), (3L, toF(9.8, 9.9)), (5L, toF(10.2, 10.0)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = KMeansVec.fit(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(math.abs(cents(0)(0) - 0.0) < 1e-6 && math.abs(cents(0)(1) - 0.0) < 1e-6)
    assert(math.abs(cents(1)(0) - 10.0) < 1e-6 && math.abs(cents(1)(1) - 10.0) < 1e-6)
    // assignment expression splits the points accordingly
    val cells = df.select($"vec_id", KMeansVec.cellExpr("embedding", cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(0L, 2L, 4L).forall(cells(_) == 0))
    assert(Seq(1L, 3L, 5L).forall(cells(_) == 1))
  }

  test("inertia is non-increasing across Lloyd rounds on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def inertia(iters: Int): Double = {
      val c = KMeansVec.fit(emb, "vec_id", "embedding", k = 4, iters = iters)
      val dists = c.toIndexedSeq.map(cc => KMeansVec.dist2("embedding", cc))
      emb.select(least(dists: _*).as("d2")).agg(sum($"d2")).collect()(0).getDouble(0)
    }
    val i0 = inertia(0); val i1 = inertia(1); val i2 = inertia(2)
    assert(i1 <= i0 + 1e-9 && i2 <= i1 + 1e-9, s"inertia must not increase: $i0 -> $i1 -> $i2")
  }

  test("empty cell keeps its previous centroid") {
    // k=2 but every point sits at (5,5): the second centroid (init at
    // id 1 = same point) gets all ties broken to cell 0, so cell 1
    // empties out and must retain its init position
    val df = Seq((0L, toF(5.0, 5.0)), (1L, toF(5.0, 5.0)), (2L, toF(5.0, 5.0)))
      .toDF("vec_id", "embedding")
    val cents = KMeansVec.fit(df, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents(0).toSeq == Seq(5.0, 5.0))
    assert(cents(1).toSeq == Seq(5.0, 5.0)) // kept, not NaN/zeroed
  }
}
