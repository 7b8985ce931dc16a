package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall measurement for the IVF-bounded similarity queries: the
  * candidate generation is approximate (multi-probe over 8 coarse
  * cells), so this spec computes the exact brute-force answer at spec
  * scale and pins a recall floor — making the accuracy trade explicit
  * and regression-guarded rather than implied.
  *
  * Context for the floors: the synthetic embeddings are unclustered
  * (near-uniform directions), the worst case for IVF — recall
  * degenerates to roughly the probed-cell share of the corpus. On real
  * embedding corpora (which cluster strongly) the same mechanism gives
  * far higher recall at the same nprobe. The floors here guard the
  * MECHANISM (multi-probe + exact re-rank never loses a same-cell
  * neighbor, precision stays 1.0), not a claim about unclustered data.
  */
class SimilarityRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def normedEmb = {
    graft.functions.GraftFunctions.register(spark)
    graft.core.Tables.embeddings(spark, sf)
      .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  private def pairCos =
    expr("vec_dot(a.embedding, b.embedding)") / (col("a.norm") * col("b.norm"))

  private def exactPairs(threshold: Double) = {
    val emb = normedEmb
    emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), pairCos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  test("threshold mining: precision 1.0 (exact re-rank) and recall >= 0.7") {
    val mined = Registry.queries("sim_threshold_pairs")(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactPairs(0.38)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined.subsetOf(exact),
      "every mined pair must pass the exact cosine threshold (precision 1.0)")
    val recall = mined.size.toDouble / exact.size
    info(f"threshold-pair recall = $recall%.3f (${mined.size}/${exact.size})")
    assert(recall >= 0.7, f"recall $recall%.3f under floor 0.7 — candidate generation regressed")
  }

  test("kNN labeling: every scored neighbor shares a probed cell; top-5 overlap >= 0.35") {
    val emb = normedEmb
    // exact top-5 per query (brute force at spec scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("cos").desc, col("nb"))
    val exact5 = emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("nb"), pairCos.as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the query's own top-5: rebuild from the same IVF candidate path the
    // production query uses (sim_knn_label aggregates away the ids, so
    // the per-neighbor sets are reproduced here with the same helpers)
    val ivf5 = SimilarityQueries.ivfKnnTop5(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (exact5 & ivf5).size.toDouble / exact5.size
    info(f"kNN top-5 overlap = $overlap%.3f")
    // unclustered synthetic data: overlap ~= probed-cell corpus share
    // (~0.43 measured); floor guards the mechanism staying multi-probe
    assert(overlap >= 0.35, f"kNN candidate overlap $overlap%.3f under floor 0.35")
  }

  test("PQ encoding is argmin-optimal per block; ADC top-5 overlap >= 0.2") {
    import spark.implicits._
    val cbs = SimilarityQueries.pqCodebooks(spark, sf)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val coded = emb
      .select(Seq($"vec_id", $"embedding") ++ SimilarityQueries.pqCodeCols(cbs): _*)
      .collect()
    // argmin optimality: the chosen centroid's block distance is <= every
    // other centroid's, for every (vector, block) — checked exhaustively
    coded.foreach { r =>
      val e = r.getSeq[Float](1).toArray
      cbs.foreach { cb =>
        val s = e.slice(cb.m * 8, cb.m * 8 + 8)
        def d2(c: Array[Float]): Double =
          s.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
        val chosen = r.getInt(r.fieldIndex(s"code_${cb.m}"))
        val dChosen = d2(cb.cents.find(_._1 == chosen).get._2)
        cb.cents.foreach { case (_, c, _) =>
          assert(dChosen <= d2(c) + 1e-9,
            s"vec ${r.getLong(0)} block ${cb.m}: code $chosen is not the argmin")
        }
      }
    }
    // ADC ranking quality: overlap of ADC top-5 with exact L2 top-5 for
    // the query set. 16 centroids/block on UNCLUSTERED synthetic data is
    // the worst case for PQ (quantization error ~ signal); the floor
    // guards the mechanism, not a real-corpus recall claim (measured
    // 0.28 on this fixture; Q=5 queries -> 25 exact pairs).
    val adc5 = Registry.queries("sim_pq_adc_topk")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val embN = normedEmb
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("l2").asc, col("nb"))
    val exact5 = embN.as("a").filter(col("a.vec_id") < 5)
      .join(embN.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("nb"),
        (expr("vec_dot(a.embedding, a.embedding)")
          - lit(2.0) * expr("vec_dot(a.embedding, b.embedding)")
          + expr("vec_dot(b.embedding, b.embedding)")).as("l2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (adc5 & exact5).size.toDouble / exact5.size
    info(f"PQ ADC top-5 overlap = $overlap%.3f")
    assert(overlap >= 0.2, f"ADC overlap $overlap%.3f under floor 0.2")
  }

  test("learned PQ codebooks: quantization error <= deterministic init; overlap >= 0.2") {
    import spark.implicits._
    // Lloyd monotonicity made testable: the deterministic codebooks ARE
    // the k-means init, so the one update round must not increase the
    // total (argmin) reconstruction error — checked exhaustively over
    // every vector and block
    val det = SimilarityQueries.pqCodebooks(spark, sf)
    val learned = SimilarityQueries.pqKmeansCodebooks(spark, sf)
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    def blockErr(s: Array[Float], c: Array[Double]): Double =
      s.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
    var errDet = 0.0
    var errLearned = 0.0
    vecs.foreach { e =>
      (0 until 8).foreach { m =>
        val s = e.slice(m * 8, m * 8 + 8)
        errDet += det(m).cents.map(c => blockErr(s, c._2.map(_.toDouble))).min
        errLearned += learned(m).map(c => blockErr(s, c)).min
      }
    }
    info(f"PQ quantization error: learned=$errLearned%.4f det=$errDet%.4f")
    assert(errLearned <= errDet + 1e-6,
      "one Lloyd round from the deterministic init must not increase quantization error")
    // same ranking-quality floor as the deterministic variant
    val adc5 = Registry.queries("sim_pq_kmeans_topk")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val embN = normedEmb
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("l2").asc, col("nb"))
    val exact5 = embN.as("a").filter(col("a.vec_id") < 5)
      .join(embN.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("nb"),
        (expr("vec_dot(a.embedding, a.embedding)")
          - lit(2.0) * expr("vec_dot(a.embedding, b.embedding)")
          + expr("vec_dot(b.embedding, b.embedding)")).as("l2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (adc5 & exact5).size.toDouble / exact5.size
    info(f"learned-PQ ADC top-5 overlap = $overlap%.3f")
    assert(overlap >= 0.2, f"learned-PQ overlap $overlap%.3f under floor 0.2")
  }

  test("SQ8 quantization: codes in [-127,127]; top-5 recall vs exact float dot >= 0.5") {
    import spark.implicits._
    // exact float-dot top-5 baseline at sf0.01 (the entry's own scale,
    // so the measured recall matches what the oracle run exercises)
    val sf01 = "/root/testdata/sf0.01"
    val emb = graft.core.Tables.embeddings(spark, sf01)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val byId = emb.toMap
    val got = Registry.queries("sim_sq_int8_topk")(spark, sf01).collect()
    // code-range sanity rides on the scores: |score| <= 64 * 127²
    assert(got.forall(r => math.abs(r.getLong(2)) <= 64L * 127 * 127))
    val gotTop = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    var hit = 0; var tot = 0
    gotTop.foreach { case (q, approx) =>
      val qv = byId(q).map(_.toDouble)
      val exact = emb.filter(_._1 != q)
        .map { case (id, v) => (id, v.map(_.toDouble).zip(qv).map(t => t._1 * t._2).sum) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      hit += (approx & exact).size; tot += 5
    }
    val recall = hit.toDouble / tot
    info(f"SQ8 top-5 recall vs exact = $recall%.3f")
    // unclustered synthetic embeddings put many exact scores within one
    // quantization step of each other — 0.70 measured; the floor guards
    // the mechanism (coarse order preserved), not a real-corpus claim
    assert(recall >= 0.5, f"SQ8 recall $recall%.3f under floor 0.5")
  }

  test("SQ8+re-rank: two-stage recall >= 0.9 (vs single-stage 0.70) — the re-rank buys back quantization loss") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val emb = graft.core.Tables.embeddings(spark, sf01)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val byId = emb.toMap
    val got = Registry.queries("sim_sq_int8_rerank_topk")(spark, sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    var hit = 0; var tot = 0
    got.foreach { case (q, approx) =>
      val qv = byId(q).map(_.toDouble)
      val exact = emb.filter(_._1 != q)
        .map { case (id, v) => (id, v.map(_.toDouble).zip(qv).map(t => t._1 * t._2).sum) }
        .sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSet
      hit += (approx & exact).size; tot += 5
    }
    val recall = hit.toDouble / tot
    info(f"SQ8+re-rank top-5 recall vs exact = $recall%.3f")
    assert(recall >= 0.9, f"two-stage recall $recall%.3f under floor 0.9")
  }
}
