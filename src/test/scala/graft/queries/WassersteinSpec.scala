package graft.queries

import graft.SparkSpec

/** Pins a67_wasserstein against a brute-force reference on constructed
  * corpora, plus the metric identities that make W₁ trustworthy as a
  * drift score: zero on identical samples, |c| under translation of an
  * identical sample, symmetry. The reference evaluates the definition
  * directly — ∫|F₁−F₂|dx over the merged support — with no shared code
  * or algebra with the query's cross-multiplied integer spelling.  */
class WassersteinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force W₁ between two empirical samples (cent-quantized the
    * way the query quantizes), straight from the definition. */
  private def w1Ref(a: Seq[Double], b: Seq[Double]): Double = {
    val qa = a.map(v => math.round(v * 100))
    val qb = b.map(v => math.round(v * 100))
    val xs = (qa ++ qb).distinct.sorted
    xs.zip(xs.drop(1)).map { case (x0, x1) =>
      val f1 = qa.count(_ <= x0).toDouble / qa.size
      val f2 = qb.count(_ <= x0).toDouble / qb.size
      (x1 - x0) * math.abs(f1 - f2) / 100.0
    }.sum
  }

  /** Runs the registry query over a fabricated events table whose
    * clicks carry sample `a` and errors carry sample `b`. */
  private def w1Query(a: Seq[Double], b: Seq[Double]): Double = {
    val d = java.nio.file.Files.createTempDirectory("graft_w1").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows =
      a.zipWithIndex.map { case (v, i) => (i.toLong, ts, 1L, "click", v, "{}") } ++
        b.zipWithIndex.map { case (v, i) => (1000L + i, ts, 2L, "error", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Registry.queries("a67_wasserstein")(spark, d).collect()
    assert(out.length == 1)
    out.head.getAs[Double]("w1_dollars")
  }

  private def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  test("matches the brute-force definition on hand-picked and seeded samples") {
    val cases = Seq(
      (Seq(1.00, 2.00, 3.00), Seq(2.00, 4.00)),
      (Seq(0.01, 0.02), Seq(490.02, 0.01)),
      (Seq(5.0, 5.0, 5.0), Seq(5.0, 7.5)))
    val rng = new scala.util.Random(42)
    val seeded = (1 to 4).map { _ =>
      def sample(n: Int) =
        Seq.fill(n)(math.floor(rng.nextDouble() * 10000) / 100.0)
      (sample(3 + rng.nextInt(40)), sample(3 + rng.nextInt(40)))
    }
    for ((a, b) <- cases ++ seeded) {
      val got = w1Query(a, b)
      val want = round4(w1Ref(a, b))
      assert(math.abs(got - want) < 1.5e-4, s"a=$a b=$b got=$got want=$want")
    }
  }

  test("metric identities: zero on identical samples, |c| under translation, symmetric") {
    val a = Seq(1.25, 3.50, 9.75, 3.50)
    assert(w1Query(a, a) == 0.0)
    // translating an identical sample by c moves W1 to exactly |c|
    assert(w1Query(a, a.map(_ + 2.0)) == 2.0)
    // symmetry: swapping which side is clicks vs errors changes nothing
    val b = Seq(0.50, 7.25)
    assert(w1Query(a, b) == w1Query(b, a))
  }
}
