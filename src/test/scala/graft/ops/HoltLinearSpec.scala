package graft.ops

import graft.SparkSpec

class HoltLinearSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, java.lang.Double)]) = {
    import spark.implicits._
    rows.map { case (k, o, v) => (k, o, Option(v).map(_.doubleValue)) }
      .toDF("k", "o", "v")
  }

  private def replay(ys: Seq[Double], a: Double, b0: Double): Seq[(Double, Double)] = {
    var l = ys.head; var b = 0.0
    (l, b) +: ys.tail.map { y =>
      val lN = a * y + (1 - a) * (l + b)
      val bN = b0 * (lN - l) + (1 - b0) * b
      l = lN; b = bN
      (l, b)
    }
  }

  test("Holt fold matches the hand recursion per key, trend tracks a ramp") {
    val df = frame(Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 4L, 40.0),
      (2L, 1L, 5.0), (2L, 2L, 5.0)))
    val got = HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.5, beta = 0.4)
      .orderBy("k", "o").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    val k1 = replay(Seq(10.0, 20.0, 30.0, 40.0), 0.5, 0.4)
    val k2 = replay(Seq(5.0, 5.0), 0.5, 0.4)
    val want = k1.map { case (l, b) => (1L, l, b) } ++ k2.map { case (l, b) => (2L, l, b) }
    assert(got.toSeq == want, s"got=${got.toSeq}")
    // on a clean ramp the trend estimate must be strictly positive and growing
    val trends = got.filter(_._1 == 1L).map(_._3)
    assert(trends.last > trends.head && trends.last > 0.0)
    // flat series: trend stays exactly 0
    got.filter(_._1 == 2L).foreach(t => assert(t._3 == 0.0))
  }

  test("state resets at key boundaries within one partition; nulls pass through untouched") {
    val df = frame(Seq(
      (5L, 1L, 100.0), (5L, 2L, 110.0),
      (6L, 1L, 1.0), (6L, 2L, null), (6L, 3L, 1.0)))
      .coalesce(1)
    val got = HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.3, beta = 0.2)
      .orderBy("k", "o").collect()
    assert(got(2).getDouble(3) == 1.0 && got(2).getDouble(4) == 0.0,
      "key 6 must not inherit key 5's state")
    assert(got(3).isNullAt(3) && got(3).isNullAt(4))
    assert(got(4).getDouble(3) == 1.0 && got(4).getDouble(4) == 0.0,
      "null must not perturb the fold")
  }

  test("adversarially shuffled multi-partition input still folds in order") {
    val n = 400
    val rows = (1 to n).reverse.map(i =>
      (i % 3L, i.toLong, java.lang.Double.valueOf(i.toDouble + (i % 11))))
    val df = frame(rows).repartition(7)
    val got = HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.4, beta = 0.3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4))))
      .toMap
    for (k <- 0L until 3L) {
      val ys = (1 to n).filter(_ % 3 == k).map(i => i.toDouble + (i % 11))
      val os = (1 to n).filter(_ % 3 == k).map(_.toLong)
      val want = replay(ys.map(_.toDouble), 0.4, 0.3)
      os.zip(want).foreach { case (o, lb) =>
        assert(got((k, o)) == lb, s"key $k order $o")
      }
    }
  }

  test("blocked decomposition matches the sequential fold, any bucket count") {
    val n = 600
    val rows = (1 to n).map(i =>
      (i % 4L, i.toLong, java.lang.Double.valueOf(math.sin(i * 0.37) * 50 + i % 13)))
    val df = frame(rows).repartition(5)
    val seq = HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.35, beta = 0.15)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    for (b <- Seq(1, 3, 16)) {
      val blk = HoltLinear.perKeyBlocked(df, "k", Seq("o"), "v",
          alpha = 0.35, beta = 0.15, buckets = b, sampleTarget = 50)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4)))).toMap
      assert(blk.keySet == seq.keySet)
      blk.foreach { case (key, (l, t)) =>
        val (ls, ts) = seq(key)
        assert(math.abs(l - ls) < 1e-7 * (1 + math.abs(ls)), s"$key level $l vs $ls (b=$b)")
        assert(math.abs(t - ts) < 1e-6 * (1 + math.abs(ts)), s"$key trend $t vs $ts (b=$b)")
      }
    }
  }

  test("blocked fold handles a single giant key and nulls across block boundaries") {
    val n = 500
    val rows = (1 to n).map(i =>
      (7L, i.toLong,
        if (i % 9 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(i.toDouble)))
    val df = frame(rows).repartition(6)
    val seq = HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.5, beta = 0.3)
      .orderBy("o").collect()
    val blk = HoltLinear.perKeyBlocked(df, "k", Seq("o"), "v",
        alpha = 0.5, beta = 0.3, buckets = 8, sampleTarget = 40)
      .orderBy("o").collect()
    seq.zip(blk).foreach { case (a, b) =>
      assert(a.isNullAt(3) == b.isNullAt(3))
      if (!a.isNullAt(3)) {
        assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-6 * (1 + math.abs(a.getDouble(3))))
        assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-5 * (1 + math.abs(a.getDouble(4))))
      }
    }
  }

  test("w23 backtest: Holt beats seasonal naive on every key of the testdata; replay of one key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = graft.queries.Registry.queries("w23_holt_backtest")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) > 0.0)
      assert(r.getDouble(4) < 1.0,
        s"${r.getString(0)}: Holt should beat lag-7 copying here, ratio ${r.getDouble(4)}")
    }
    // driver replay of one key's holt MAE
    val key = out.head.getString(0)
    val ys = graft.core.Tables.events(spark, sf)
      .filter($"event_type" === key)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum($"value").as("y"))
      .orderBy($"day").as[(java.sql.Timestamp, Double)].collect().map(_._2)
    var l = ys.head; var b = 0.0
    val fc = scala.collection.mutable.ArrayBuffer.empty[Double]
    ys.tail.foreach { y =>
      fc += l + b
      val lN = 0.3 * y + (1 - 0.3) * (l + b)
      val bN = 0.1 * (lN - l) + (1 - 0.1) * b
      l = lN; b = bN
    }
    // evaluation span: both lag-1 holt and lag-7 snaive defined → days 8..n
    val errs = (7 until ys.length).map(t => math.abs(ys(t) - fc(t - 1)))
    val mae = errs.sum / errs.length
    assert(math.abs(out.head.getDouble(2) - mae) < 0.01 * mae,
      s"replay mae $mae vs ${out.head.getDouble(2)}")
  }

  test("invalid arguments are rejected") {
    val df = frame(Seq((1L, 1L, 1.0)))
    intercept[IllegalArgumentException](
      HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.0, beta = 0.5))
    intercept[IllegalArgumentException](
      HoltLinear.perKey(df, "k", Seq("o"), "v", alpha = 0.5, beta = 1.5))
    intercept[IllegalArgumentException](
      HoltLinear.perKey(df, "k", Seq.empty, "v", alpha = 0.5, beta = 0.5))
    intercept[IllegalArgumentException](
      HoltLinear.perKey(df, "k", Seq("o"), "nope", alpha = 0.5, beta = 0.5))
  }
}
