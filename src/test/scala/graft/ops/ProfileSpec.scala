package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("cells: fixed-width bins with edge clamping, null rows dropped") {
    val df = Seq(
      ("x", -5.0),  // clamps to bin 0
      ("x", 0.0), ("x", 9.9),   // bin 0
      ("x", 10.0),              // bin 1
      ("x", 999.0),             // clamps to top bin
      ("y", 25.0)               // bin 2
    ).toDF("seg", "v")
      .unionByName(Seq((null.asInstanceOf[String], 1.0)).toDF("seg", "v"))
    val cells = Profile.cells(df, "seg", "v", bins = 4, lo = 0.0, width = 10.0)
      .orderBy("seg", "bin").as[(String, Int, Long)].collect().toSeq
    assert(cells === Seq(("x", 0, 3L), ("x", 1, 1L), ("x", 3, 1L), ("y", 2, 1L)))
  }

  test("psi: identical distributions score ~0; a shifted one scores large; one-sided segments stay finite") {
    val ref = Seq(("x", 0, 50L), ("x", 1, 50L), ("z", 0, 10L)).toDF("seg", "bin", "n")
    val same = Seq(("x", 0, 500L), ("x", 1, 500L)).toDF("seg", "bin", "n")
    val shifted = Seq(("x", 0, 5L), ("x", 1, 995L), ("w", 0, 7L)).toDF("seg", "bin", "n")
    val a = Profile.psi(ref, same, bins = 2).as[(String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(math.abs(a("x")._4) < 0.01)
    assert(a("z")._2 === 10L && a("z")._3 === 0L && !a("z")._4.isNaN && !a("z")._4.isInfinite)
    val b = Profile.psi(ref, shifted, bins = 2).as[(String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(b("x")._4 > 1.0)
    assert(b("w")._2 === 0L && b("w")._3 === 7L && !b("w")._4.isInfinite)
  }

  test("mergeCells: profile of the whole == merged profiles of disjoint halves") {
    val rows = (0 until 400).map(i => (s"s${i % 3}", (i % 97).toDouble))
    val whole = Profile.cells(rows.toDF("seg", "v"), "seg", "v", 10, 0.0, 10.0)
    val h1 = Profile.cells(rows.take(150).toDF("seg", "v"), "seg", "v", 10, 0.0, 10.0)
    val h2 = Profile.cells(rows.drop(150).toDF("seg", "v"), "seg", "v", 10, 0.0, 10.0)
    val merged = Profile.mergeCells(h1, h2)
    assert(merged.orderBy("seg", "bin").collect().toSeq ===
      whole.orderBy("seg", "bin").collect().toSeq)
  }

  test("psi matches the oracle-pinned a19 spelling on the real events slices") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("slice", when(to_date($"ts") < lit("2024-01-16"), "a").otherwise("b"))
    val ref = Profile.cells(ev.filter($"slice" === "a").withColumnRenamed("event_type", "seg"),
      "seg", "value", bins = 10, lo = 0.0, width = 50.0)
    val cur = Profile.cells(ev.filter($"slice" === "b").withColumnRenamed("event_type", "seg"),
      "seg", "value", bins = 10, lo = 0.0, width = 50.0)
    // a19's psi = Σ(pa−pb)ln(pa/pb) is term-symmetric under swapping the
    // slices, so ref=a/cur=b must reproduce it exactly
    val got = Profile.psi(ref, cur, bins = 10)
      .select($"seg", $"psi").as[(String, Double)].collect().toMap
    val want = graft.queries.Registry.queries("a19_profile_drift")(spark, sf)
      .select($"event_type", $"psi").as[(String, Double)].collect().toMap
    assert(got.keySet === want.keySet)
    for ((k, w) <- want) assert(math.abs(got(k) - w) < 1e-6, s"seg $k: got ${got(k)} want $w")
  }
}
