package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fixed-bucket LSH pair join is quadratic per bucket without a
  * guard: a hot bucket (one template embedded a million times) emits
  * C(k,2) pairs into one reducer. SignLsh splits regimes — clique pairs
  * for ordinary buckets, k−1 star edges for mega buckets — and scales
  * the hyperplane count with N. */
class SignLshSpec extends SparkSpec {
  import spark.implicits._

  // 100 vectors all with the same sign pattern (hot bucket) + 6 spread
  private def fixture = {
    val hot = (0 until 100).map(i => (i.toLong, Array(1.0f, 1.0f, 1.0f, 0.1f * i)))
    val spread = (100 until 106).map(i =>
      (i.toLong, Array(if (i % 2 == 0) -1.0f else 1.0f, -1.0f, 1.0f, 0.5f)))
    (hot ++ spread).toDF("vec_id", "embedding")
  }

  test("hot bucket degrades to k-1 star edges, not C(k,2) clique pairs") {
    val stats = SignLsh.withBucketStats(fixture, "embedding", "vec_id", nPlanes = 3)
    val (clique, star) = SignLsh.cappedEdges(stats, "vec_id", maxBucket = 16)
    val starEdges = star.collect()
    assert(starEdges.length == 99, s"expected 99 star edges, got ${starEdges.length}")
    assert(starEdges.forall(_.getLong(0) == 0L)) // head = min vec_id
    // the clique side never touches the mega bucket
    val cliquePairs = clique
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst")).collect()
    assert(cliquePairs.forall(_.getLong(0) >= 100L))
    assert(cliquePairs.length < 16L * 15 / 2)
  }

  test("star edges preserve connectivity: components match the clique formulation") {
    val stats = SignLsh.withBucketStats(fixture, "embedding", "vec_id", nPlanes = 3)
    // capped: mega bucket via star edges
    val (cliqueC, starC) = SignLsh.cappedEdges(stats, "vec_id", maxBucket = 16)
    val cappedEdges = cliqueC
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .unionByName(starC)
    // uncapped: full clique everywhere
    val (cliqueU, _) = SignLsh.cappedEdges(stats, "vec_id", maxBucket = 1000)
    val fullEdges = cliqueU
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
    val ids = fixture.select($"vec_id".as("id"))
    val a = ConnectedComponents(ids, cappedEdges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents(ids, fullEdges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("hyperplane count scales with N to hold bucket occupancy constant") {
    assert(SignLsh.planesFor(1000L, targetBucket = 100) == 4)        // 2^4 buckets ≥ 10 cells
    assert(SignLsh.planesFor(1000000L, targetBucket = 100) == 14)
    // 1000× the data adds ~10 planes instead of 1000× denser buckets
    assert(SignLsh.planesFor(1000000000L, targetBucket = 100) == 24)
    assert(SignLsh.planesFor(10L, targetBucket = 100) == 1)          // clamp low
  }
}
