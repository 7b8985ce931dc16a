package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** vec_l2sq must be BIT-equal with the HOF spelling it replaced
  * (`aggregate(zip_with(x.cast(double[]), c, (x,c)->(x-c)*(x-c)), 0d, +)`)
  * — the k-means/IVF oracles replay that arithmetic in DuckDB, so any
  * reordering or fused-multiply difference would break hash matches. */
class VecL2SqSpec extends SparkSpec {
  import spark.implicits._

  private def hofL2Sq(embCol: String, cent: Array[Double]) = {
    val cArr = array(cent.toIndexedSeq.map(lit(_)): _*)
    aggregate(
      zip_with(col(embCol).cast("array<double>"), cArr, (x, c) => (x - c) * (x - c)),
      lit(0.0),
      (acc, v) => acc + v)
  }

  test("bit-equal with the zip_with/aggregate spelling on real embeddings") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = emb.filter($"vec_id" < 4).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    cents.zipWithIndex.foreach { case (c, i) =>
      val rows = emb.select(
        graft.ops.KMeansVec.dist2("embedding", c).as("fused"),
        hofL2Sq("embedding", c).as("hof")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"centroid $i: fused ${r.getDouble(0)} != hof ${r.getDouble(1)}")
      }
    }
  }

  test("interpreted path matches codegen; ragged and null inputs yield null") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f))),
      (2L, Some(Seq(1.0f))), // ragged vs the 2-dim centroid
      (3L, None: Option[Seq[Float]]))
      .toDF("id", "v")
    def run() = df.select($"id",
        expr("vec_l2sq(v, array(0.5D, 1.5D))").as("d"))
      .orderBy("id").collect()
    val codegen = run()
    assert(math.abs(codegen(0).getDouble(1) - (0.25 + 0.25)) < 1e-15)
    assert(codegen(1).isNullAt(1) && codegen(2).isNullAt(1))
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      codegen.zip(interp).foreach { case (c, i) =>
        assert(c.isNullAt(1) == i.isNullAt(1))
        if (!c.isNullAt(1))
          assert(java.lang.Double.doubleToLongBits(c.getDouble(1)) ==
            java.lang.Double.doubleToLongBits(i.getDouble(1)))
      }
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
