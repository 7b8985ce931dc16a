package graft.props

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.ops.{CleanHourly, DailyTmax, Splits}
import graft.functions.RollingHash

/** Property-based invariants over the core operators (small random
  * frames; 10 cases per property to keep Spark-job count bounded). */
object InvariantProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val tempGen = Gen.chooseNum(-120.0, 120.0) // includes out-of-range
  private val obsGen = for {
    n <- Gen.chooseNum(1, 40)
    temps <- Gen.listOfN(n, tempGen)
    dups <- Gen.chooseNum(0, 3)
  } yield {
    val base = temps.zipWithIndex.map { case (t, i) =>
      (new Timestamp(1720000000000L + i * 3600000L), "KLGA",
        Option(40.78), Option(-73.87), Option(t), "isd", 0L)
    }
    base ++ base.take(dups) // inject duplicate keys
  }

  property("dedup yields unique keys and never grows the frame") = forAll(obsGen) { rows =>
    val df = rows.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val out = CleanHourly.dedup(df)
    val n = out.count()
    n <= rows.size &&
      out.select("station_id", "ts_utc").distinct().count() == n
  }

  property("daily tmax = max of in-range temps per local day; coverage ≤ 24") = forAll(obsGen) { rows =>
    val df = rows.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val cleaned = CleanHourly.flagOutOfRange(CleanHourly.dedup(df))
    val daily = DailyTmax(cleaned, "America/New_York",
      clock = () => Timestamp.valueOf("2024-07-15 00:00:00")).collect()
    val inRange = rows.map(_._5.get).filter(t => t >= -90 && t <= 60)
    daily.forall { r =>
      val c = r.getAs[Int]("coverage_hours")
      c >= 0 && c <= 24
    } && (daily.isEmpty == inRange.isEmpty) &&
      (daily.isEmpty || math.abs(daily.map(_.getAs[Double]("tmax_c")).max - inRange.max) < 1e-9)
  }

  private val splitGen = for {
    n <- Gen.chooseNum(3, 60)
  } yield (0 until n).map(i => (i.toLong, new Timestamp(1720000000000L + i * 60000L)))

  property("positional split: exhaustive, disjoint, time-ordered") = forAll(splitGen) { rows =>
    val df = rows.toDF("id", "ts")
    val out = Splits.positional(df, "ts", "id").collect()
    val byLabel = out.groupBy(_.getAs[String]("split"))
    val n = rows.size
    val trainN = byLabel.getOrElse("train", Array.empty).length
    val sum = byLabel.values.map(_.length).sum
    val maxTrainTs = byLabel.getOrElse("train", Array.empty)
      .map(_.getAs[Timestamp]("ts").getTime).maxOption.getOrElse(Long.MinValue)
    val minTestTs = byLabel.getOrElse("test", Array.empty)
      .map(_.getAs[Timestamp]("ts").getTime).minOption.getOrElse(Long.MaxValue)
    sum == n && trainN == math.floor(n * 0.7).toInt && maxTrainTs < minTestTs
  }

  property("bitset coverage = exact distinct valid local hours per day") = forAll(obsGen) { rows =>
    val df = rows.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val daily = DailyTmax(df, "America/New_York",
      clock = () => Timestamp.valueOf("2024-07-15 00:00:00")).collect()
    val zone = java.time.ZoneId.of("America/New_York")
    // independent reference: distinct local hours per local date (all rows
    // here are flag-clean, so validity = temp present)
    val expected = rows
      .map(r => r._1.toInstant.atZone(zone))
      .groupBy(_.toLocalDate)
      .map { case (d, zs) => d.toString -> zs.map(_.getHour).distinct.size }
    daily.forall { r =>
      expected(r.getAs[java.sql.Date]("date_local").toString) ==
        r.getAs[Int]("coverage_hours")
    } && daily.length == expected.size
  }

  private val asofGen = for {
    nl <- Gen.chooseNum(1, 15)
    nr <- Gen.chooseNum(0, 15)
    lrows <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0, 50)))
    rkeys <- Gen.listOfN(nr, Gen.chooseNum(1L, 3L))
  } yield {
    val left = lrows.zipWithIndex.map { case ((k, t), i) =>
      (k, new Timestamp(1720000000000L + t * 60000L), i.toLong)
    }
    // right (key, ts) pairs made unique: equal-ts duplicates within a key
    // would make "the most recent row" ill-defined
    val right = rkeys.zipWithIndex.map { case (k, i) =>
      (k, new Timestamp(1720000000000L + (i * 7 % 50) * 60000L), i * 1.5)
    }.distinctBy(r => (r._1, r._2))
    (left, right)
  }

  property("asof join carries exactly the most recent right row per key") = forAll(asofGen) {
    case (lrows, rrows) =>
      val left = lrows.toDF("k", "ts", "event_id")
      val right = rrows.toDF("k", "ts", "v")
      val out = graft.ops.AsofJoin(left, right, Seq("k"), "ts", Seq("v"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
      lrows.forall { case (k, lts, id) =>
        val expected = rrows.filter(r => r._1 == k && !r._2.after(lts))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        out(id) == expected
      }
  }

  private val docGen = for {
    n <- Gen.chooseNum(2, 12)
    texts <- Gen.listOfN(n, Gen.oneOf(
      "a b c d e f g h", "a b c d e f g h", // frequent exact dup
      "a b c d e f g z", "p q r s t u v w", "x y z 1 2 3 4 5"))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("dedup groups: same-text docs merge, disjoint-vocab docs never merge") =
    forAll(docGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val starComps = graft.ops.DedupDocs(docs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // under-merge bound: exact duplicates of one text share a component
      // (near-dup banding can only MERGE groups, never split them)
      val noSplit = rows.groupBy(_._2).values.forall { group =>
        group.map(g => starComps(g._1)).distinct.size == 1
      }
      // over-merge bound: the generator's vocabularies "a b c …" /
      // "p q r …" / "x y z …" share NO trigrams, so docs from different
      // pools must stay in different components (a bucket-collision bug
      // gluing unrelated docs together fails here)
      def pool(t: String): Char = t.head
      val byPool = rows.groupBy(r => pool(r._2)).view.mapValues(_.map(r => starComps(r._1)).toSet)
      val noGlue = byPool.keys.toSeq.combinations(2).forall { case Seq(p1, p2) =>
        byPool(p1).intersect(byPool(p2)).isEmpty
      }
      noSplit && noGlue
    }

  private val mixGen = for {
    nDomains <- Gen.chooseNum(1, 5)
    nRows <- Gen.chooseNum(1, 60)
    weights <- Gen.listOfN(nDomains, Gen.chooseNum(0.05, 1.5))
    total <- Gen.chooseNum(1L, 80L)
  } yield {
    val rows = (0L until nRows).map(i => (i, s"d${i % nDomains}"))
    val ws = weights.zipWithIndex.map { case (w, i) => s"d$i" -> w }.toMap
    (rows, ws, total)
  }

  property("mix sampler: per-domain size = min(floor(w*total), domain size), exactly") =
    forAll(mixGen) { case (rows, weights, total) =>
      val df = rows.toDF("id", "dom")
      val got = graft.ops.MixSampler.sample(df, "dom", "id", weights, total)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val domSizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      weights.forall { case (dom, w) =>
        val quota = math.floor(w * total).toLong
        val expected = math.min(quota, domSizes.getOrElse(dom, 0L))
        got.getOrElse(dom, 0L) == expected
      } && got.keySet.subsetOf(weights.keySet)
    }

  private val kmeansGen = for {
    d <- Gen.chooseNum(2, 6)
    k <- Gen.chooseNum(2, 4)
    n <- Gen.chooseNum(4, 20)
    vals <- Gen.listOfN(n * d, Gen.chooseNum(-8.0f, 8.0f))
  } yield (d, k, vals.grouped(d).toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) })

  property("k-means cellExpr = driver-computed argmin with the same tie rule") =
    forAll(kmeansGen) { case (d, k, rows) =>
      val cents = rows.take(k).map(_._2.map(_.toDouble))
      val df = rows.toDF("id", "emb")
      val got = df.select($"id", graft.ops.KMeansVec.cellExpr("emb", cents.toArray).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.forall { case (id, v) =>
        // same left-to-right double accumulation as the expression
        val dists = cents.map { c =>
          var acc = 0.0; var i = 0
          while (i < d) { acc += (v(i) - c(i)) * (v(i) - c(i)); i += 1 }
          acc
        }
        val want = dists.zipWithIndex.minBy { case (dist, cid) => (dist, cid) }._2
        got(id) == want
      }
    }

  private val prefixGen = for {
    n <- Gen.chooseNum(1, 80)
    groups <- Gen.chooseNum(1, 4)
    buckets <- Gen.oneOf(1, 2, 7, 64)
    vals <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
  } yield (vals.zipWithIndex.map { case (v, i) => (s"g${i % groups}", f"k$i%04d", v) }, buckets)

  property("prefix sum: bucketed two-pass == per-group window, any bucket count") =
    forAll(prefixGen) { case (rows, buckets) =>
      import org.apache.spark.sql.expressions.Window
      val df = rows.toDF("grp", "k", "v")
      val w = Window.partitionBy($"grp").orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = df.withColumn("cum", sum($"v").over(w))
        .select("grp", "k", "cum").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val got = graft.ops.PrefixSum.withCumsum(df, "grp", "k", "v", buckets = buckets)
        .select("grp", "k", "cum").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      got == ref
    }

  private val wfGen = for {
    n <- Gen.chooseNum(5, 60)
    step <- Gen.chooseNum(1, 10)
    folds <- Gen.chooseNum(1, 4)
    win <- Gen.option(Gen.chooseNum(1, 20))
  } yield (n, step, folds, win)

  property("walk-forward: quantile thresholds reproduce positional folds on unique times") =
    forAll(wfGen) { case (n, step, folds, win) =>
      // ScalaCheck shrinking ignores generator bounds; skip invalid args
      (n < 1 || step < 1 || folds < 1 || win.exists(_ < 1)) || {
      val df = (0 until n)
        .map(i => (i.toLong, new Timestamp(1720000000000L + i * 60000L)))
        .toDF("id", "ts")
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getString(2))
      val pos = Splits.walkForwardLabelsPositional(df, "ts", "id", win, step, folds)
        .select($"id", $"fold", $"role").collect().map(key).toSet
      val byTime = Splits.walkForwardLabelsByTime(df, "ts", win, step, folds,
          total = n.toLong, relErr = 1e-9)
        .select($"id", $"fold", $"role").collect().map(key).toSet
      byTime == pos
      }
    }

  private val nativeAsofGen = for {
    nL <- Gen.chooseNum(0, 30)
    nR <- Gen.chooseNum(0, 30)
    lRows <- Gen.listOfN(nL, Gen.zip(
      Gen.option(Gen.chooseNum(0L, 4L)), Gen.option(Gen.chooseNum(0, 500))))
    rKeys <- Gen.listOfN(nR, Gen.option(Gen.chooseNum(0L, 4L)))
    rTimes <- Gen.pick(nR, 0 until 1000) // unique right times: no tie ambiguity
  } yield (lRows, rKeys.zip(rTimes.map(Option(_))))

  property("native as-of matches an in-memory reference, nulls included, all directions") =
    forAll(nativeAsofGen) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex.map { case ((k, t), i) =>
        (k, t.map(m => new Timestamp(1720000000000L + m * 60000L)), i.toLong)
      }.toDF("k", "ts", "id")
      val right = rRows.zipWithIndex.map { case ((k, t), i) =>
        (k, t.map(m => new Timestamp(1720000000000L + m * 60000L)), i.toDouble)
      }.toDF("k", "ts", "v")
      def run(direction: String): Map[Long, Option[Double]] =
        graft.plans.AsofJoinNative(left, right, Seq("k"), "ts", "ts",
            direction = direction)
          .select($"id", $"v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      def expect(pick: (Long, Seq[(Long, Int)]) => Option[Int]): Map[Long, Option[Double]] =
        lRows.zipWithIndex.map { case ((k, t), i) =>
          val m = for {
            kk <- k; tt <- t
            sameKey = rRows.zipWithIndex
              .collect { case ((Some(rk), Some(rt)), j) if rk == kk => (rt.toLong, j) }
            j <- pick(tt.toLong, sameKey)
          } yield j.toDouble
          i.toLong -> m
        }.toMap
      val back = expect((lt, rs) =>
        rs.filter(_._1 <= lt).sortBy(_._1).lastOption.map(_._2))
      val fwd = expect((lt, rs) =>
        rs.filter(_._1 >= lt).sortBy(_._1).headOption.map(_._2))
      val near = expect { (lt, rs) =>
        val b = rs.filter(_._1 <= lt).sortBy(_._1).lastOption
        val f = rs.filter(_._1 >= lt).sortBy(_._1).headOption
        (b, f) match {
          case (Some((bt, bj)), Some((ft, fj))) =>
            Some(if (lt - bt <= ft - lt) bj else fj) // ties prefer backward
          case (Some((_, bj)), None) => Some(bj)
          case (None, Some((_, fj))) => Some(fj)
          case _ => None
        }
      }
      run("backward") == back && run("forward") == fwd && run("nearest") == near
    }

  property("rolling hash composes: h(a++b) = (h(a)*31^|b| + h(b)) mod p") =
    forAll(Gen.alphaStr, Gen.alphaStr) { (a, b) =>
      val p = RollingHash.Mod
      def powMod(base: Long, e: Int): Long = {
        var r = 1L; var i = 0
        while (i < e) { r = r * base % p; i += 1 }
        r
      }
      val ha = RollingHash.hash(a.getBytes)
      val hb = RollingHash.hash(b.getBytes)
      val expected = ((BigInt(ha) * BigInt(powMod(31, b.getBytes.length)) + BigInt(hb)) % BigInt(p)).toLong
      RollingHash.hash((a + b).getBytes) == expected
    }

  private val hashSetGen = for {
    nIn <- Gen.chooseNum(1, 60)
    nOut <- Gen.chooseNum(1, 60)
    mBits <- Gen.oneOf(1 << 10, 1 << 12, 1 << 14)
    members <- Gen.listOfN(nIn, Gen.chooseNum(0L, (1L << 60) - 1))
    others <- Gen.listOfN(nOut, Gen.chooseNum(0L, (1L << 60) - 1))
  } yield (members.distinct, others.distinct.filterNot(members.toSet), mBits)

  property("bloom: every member passes, whatever the hashes and size") =
    forAll(hashSetGen) { case (members, _, mBits) =>
      val df = members.toDF("h")
      val words = graft.ops.Bloom.build(df, "h", mBits)
      df.filter(!graft.ops.Bloom.mightContain(words, mBits, $"h")).count() == 0L
    }

  private val cmsGen = for {
    nDistinct <- Gen.chooseNum(1, 30)
    reps <- Gen.listOfN(nDistinct, Gen.chooseNum(1, 8))
    keys <- Gen.listOfN(nDistinct, Gen.chooseNum(0L, (1L << 60) - 1))
    w <- Gen.oneOf(1 << 8, 1 << 10)
    d <- Gen.chooseNum(1, 4)
  } yield (keys.distinct.zip(reps), w, d)

  property("count-min: estimate >= true count for every key") =
    forAll(cmsGen) { case (keyed, w, d) =>
      val items = keyed.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("h")
      val m = graft.ops.CountMin.build(items, "h", w, d)
      val est = items.groupBy($"h").agg(count(lit(1)).as("n"))
        .withColumn("e", graft.ops.CountMin.estimate(m, w, $"h"))
        .collect()
      est.forall(r => r.getLong(2) >= r.getLong(1))
    }

  private val mortonGen = Gen.listOfN(8,
    Gen.zip(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)))

  property("morton interleave: bijective (deinterleave round-trips)") =
    forAll(mortonGen) { pts =>
      val out = pts.toDF("x", "y")
        .select($"x", $"y",
          graft.ops.ZOrder.interleave16($"x".cast("long"), $"y".cast("long")).as("z"))
        .collect()
      def unspread(z: Long): Int = {
        var v = 0; var i = 0
        while (i < 16) { v |= (((z >> (2 * i)) & 1L) << i).toInt; i += 1 }
        v
      }
      out.forall(r => unspread(r.getLong(2)) == r.getInt(0) &&
        unspread(r.getLong(2) >> 1) == r.getInt(1))
    }

  private val bpeGen = for {
    n <- Gen.chooseNum(1, 12)
    words <- Gen.listOfN(n, Gen.listOfN(5, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    merges <- Gen.chooseNum(0, 8)
  } yield (words.mkString(" "), merges)

  property("bpe: tokenization is lossless and never longer than characters") =
    forAll(bpeGen) { case (text, nMerges) =>
      val docs = Seq(text).toDF("text")
      val merges = graft.ops.BpeTrain.train(docs, "text", nMerges)
      val r = docs.select(
        concat_ws("", graft.functions.BpeEncode.tokens($"text", merges)).as("glued"),
        size(graft.functions.BpeEncode.tokens($"text", merges)).as("n"))
        .head
      r.getString(0) == text.replace(" ", "") && r.getInt(1) <= text.replace(" ", "").length
    }

  // CDC upsert: folding change batches one at a time equals one merge of
  // everything — the invariant snapshotMergeStream relies on. Batch
  // index is the recency tiebreak, mirroring "later batch wins ties".
  private val upsertGen = for {
    nBatches <- Gen.chooseNum(1, 4)
    batches <- Gen.listOfN(nBatches, Gen.listOf(for {
      k <- Gen.chooseNum(0L, 6L)
      ver <- Gen.chooseNum(0L, 5L)
      payload <- Gen.alphaStr.map(_.take(4))
    } yield (k, ver, payload)))
  } yield batches
    // unique (k, ver) within a batch: a same-batch tie has no defined
    // winner in either spelling (max_by on an equal ordering tuple)
    .map(_.distinctBy(t => (t._1, t._2)))
    .filter(_.nonEmpty)

  property("upsert: incremental fold over batches == one latest-per-key pass") =
    // NoShrink: shrinking synthesizes inputs that bypass the generator's
    // per-batch (k, ver) dedup and fail for tie-nondeterminism, not for
    // a real fold defect
    org.scalacheck.Prop.forAllNoShrink(upsertGen) { batches =>
      batches.isEmpty || {
        import graft.ops.Upsert
        def df(rows: List[(Long, Long, String)], b: Int) =
          rows.map { case (k, v, p) => (k, v, p, b.toLong) }.toDF("k", "ver", "payload", "b")
        val keys = Seq("k"); val ord = Seq("ver", "b")
        val dfs = batches.zipWithIndex.map { case (r, i) => df(r, i) }
        // the snapshotMergeStream shape: seed = latestPerKey(first batch),
        // then one mergeLatest per later batch
        val folded = dfs.tail.foldLeft(Upsert.latestPerKey(dfs.head, keys, ord)) {
          (snap, batch) => Upsert.mergeLatest(snap, batch, keys, ord)
        }
        val oneShot = Upsert.latestPerKey(dfs.reduceLeft(_ unionByName _), keys, ord)
        val f = folded.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
        val o = oneShot.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
        f == o
      }
    }

  // capAdjacency (GraphQueries): the hub guard behind the link-
  // prediction wedge join. Random weighted digraphs; caps must hold,
  // kept edges must be each node's TOP-weight neighbors (id tiebreak),
  // and the wedge join through the capped adjacency must obey the
  // structural cap·|E_capped| bound no matter the degree distribution.
  private val adjGen = for {
    nEdges <- Gen.chooseNum(1, 60)
    edges <- Gen.listOfN(nEdges, for {
      u <- Gen.chooseNum(0L, 12L); v <- Gen.chooseNum(0L, 12L)
      c <- Gen.chooseNum(1, 50)
    } yield (u, v, c))
    cap <- Gen.chooseNum(1, 4)
  } yield (edges.distinct, cap)

  property("capAdjacency: per-node cap, top-weight selection, wedge bound") =
    org.scalacheck.Prop.forAllNoShrink(adjGen) { case (edges, cap) =>
      val adjW = edges.toDF("u", "v", "c")
      val capped = graft.queries.GraphQueries.capAdjacency(adjW, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val byU = capped.groupBy(_._1)
      val capHolds = byU.values.forall(_.length <= cap)
      // kept neighbors are exactly the top-cap by (weight desc, v asc)
      val want = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy { case (_, v, c) => (-c, v) }.take(cap).map(_._2).toSet
      }
      val topWeight = byU.forall { case (u, kept) =>
        kept.map(_._2).toSet == want(u)
      }
      val eCapped = capped.length.toLong
      val wedges = (for {
        (z, a) <- capped; (z2, b) <- capped if z2 == z && a < b
      } yield (a, b, z)).length
      // z-centric pairs: Σ_z C(k_z, 2) ≤ cap·|E_capped|/2
      capHolds && topWeight && wedges <= cap * eCapped / 2
    }

}
