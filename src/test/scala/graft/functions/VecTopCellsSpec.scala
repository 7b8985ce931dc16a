package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fused matrix quantizer kernel against the per-centroid
  * expression spelling it replaces: identical cell choices (same
  * distances, same (d2 asc, cid asc) tie rule) on a corpus large
  * enough to exercise ties and every insertion path, at a K big
  * enough that the literal spelling could not carry it — plus the
  * VecL2Sq null/mismatch contract and the K < nprobe edge. */
class VecTopCellsSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, d: Int): Array[Float] =
    Array.fill(d)(rnd.nextFloat() * 2f - 1f)

  test("top-2 cells match the array_sort(struct(d2, cid)) spelling exactly") {
    val rnd = new scala.util.Random(7)
    val d = 8
    val vecs = (0 until 500).map(i => (i.toLong, randVec(rnd, d).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Array.fill(37)(randVec(rnd, d).map(_.toDouble))
    val fused = vecs.select($"vec_id",
        graft.ops.KMeansVec.topCellsExpr("embedding", cents, 2).as("cells"))
      .select($"vec_id", element_at($"cells", 1).as("c1"),
        element_at($"cells", 2).as("c2"))
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val literal = vecs.select($"vec_id",
        graft.ops.KMeansVec.probeCellsExpr("embedding", cents, 2).as("cells"))
      .select($"vec_id",
        element_at($"cells", 1).getField("cid").as("c1"),
        element_at($"cells", 2).getField("cid").as("c2"))
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(fused == literal)
  }

  test("exact ties break to the lower cell id, like the struct sort") {
    // duplicate centroids → identical distances; the winner must be
    // the LOWER cid on both spellings
    val c = Array(1.0, 2.0, 3.0)
    val cents = Array(c.clone(), c.clone(), Array(9.0, 9.0, 9.0), c.clone())
    val vecs = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val got = vecs.select(
        graft.ops.KMeansVec.topCellsExpr("embedding", cents, 3).as("cells"))
      .as[Seq[Int]].collect().head
    assert(got == Seq(0, 1, 3), s"tie order broken: $got")
  }

  test("null element and dimension mismatch yield NULL; K < nprobe returns all K") {
    val cents2 = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val mism = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    assert(mism.select(
      graft.ops.KMeansVec.topCellsExpr("embedding", cents2, 2).as("c"))
      .filter($"c".isNull).count() == 1)
    val withNull = Seq((1L, Seq[java.lang.Float](1.0f, null))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    assert(withNull.select(
      graft.ops.KMeansVec.topCellsExpr("embedding", cents2, 2).as("c"))
      .filter($"c".isNull).count() == 1)
    val ok = Seq((1L, Seq(0.9f, 1.1f))).toDF("vec_id", "embedding")
    val all = ok.select(
        graft.ops.KMeansVec.topCellsExpr("embedding", cents2, 5).as("c"))
      .as[Seq[Int]].collect().head
    assert(all == Seq(1, 0), s"K < nprobe must return all K in order: $all")
  }

  test("interpreted eval agrees with codegen") {
    val rnd = new scala.util.Random(13)
    val cents = Array.fill(11)(randVec(rnd, 6).map(_.toDouble))
    val rows = (0 until 100).map(i => (i.toLong, randVec(rnd, 6).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val viaPlan = rows.select($"vec_id",
        graft.ops.KMeansVec.topCellsExpr("embedding", cents, 2).as("c"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    // direct kernel call = the interpreted path
    val direct = rows.select($"vec_id", $"embedding").collect().map { r =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[Float](1).toArray[Any])
      val out = VecTopCellsImpl.topCells(a, cents, 2)
      (r.getLong(0), out.toIntArray().toSeq)
    }.sortBy(_._1).toSeq
    assert(viaPlan == direct)
  }
}
