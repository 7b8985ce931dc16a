package graft.ops

import graft.SparkSpec

/** k-core peeling: known cascade on a hand graph, the core property
  * (every surviving node has degree ≥ k IN THE CORE), and the in-band
  * fixpoint signal. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle {1,2,3} + a path 3-4-5 hanging off it:
  //   k=2 round 1 peels 5 (deg 1); round 2 peels 4 (deg dropped to 1);
  //   round 3 peels nothing — the triangle is the 2-core.
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("p1", "p2")

  test("cascade peels the path one node per round, keeps the triangle") {
    val sched = KCore.peel(edges, k = 2, rounds = 3)
    assert(sched.stats == Seq(
      (1, 1L, 4L, 4L),   // 5 gone, edge (4,5) gone
      (2, 1L, 3L, 3L),   // 4 gone (degree fell to 1), edge (3,4) gone
      (3, 0L, 3L, 3L)))  // fixpoint, triangle survives
    val core = sched.core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("core property: every node in the returned core has degree >= k") {
    val sched = KCore.peel(edges, k = 2, rounds = 3)
    val degs = sched.core.select($"p1".as("n")).union(sched.core.select($"p2".as("n")))
      .groupBy($"n").count().collect().map(_.getLong(1))
    assert(degs.nonEmpty && degs.forall(_ >= 2))
  }

  test("k above the densest subgraph empties the graph and reports it") {
    val sched = KCore.peel(edges, k = 3, rounds = 2)
    assert(sched.stats.head._4 == 0L, s"k=3 should empty this graph: ${sched.stats}")
    assert(sched.core.count() == 0)
  }
}
