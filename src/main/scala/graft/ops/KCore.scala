package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete every
  * node of degree < k until the remaining subgraph (the k-core) is
  * stable. Input is an undirected edge list (src, dst), one row per
  * unordered edge (each endpoint counted once per incident row).
  *
  * Each round is one degree aggregate over the surviving edges (a
  * shuffle of the edge frame) plus two anti joins against the weak set;
  * the edge frame is cut with an EAGER localCheckpoint per round —
  * a round's plan reads the previous round's edges three times, so an
  * uncheckpointed chain doubles the logical plan every round and merely
  * rendering the plan string OOMs the driver by round 4 (persist caches
  * execution but never truncates the plan). At cluster scale the loop
  * runs to fixpoint with reliable checkpoints every few rounds (the
  * ConnectedComponents discipline) and broadcasts the weak set while it
  * fits.
  *
  * Returns the per-round peel schedule (round, n_peeled, n_nodes,
  * n_edges — n_peeled = 0 proves the fixpoint in-band) and the
  * surviving core edge list.
  */
object KCore {

  final case class Schedule(stats: Seq[(Int, Long, Long, Long)], core: DataFrame)

  def peel(edges: DataFrame, k: Int, rounds: Int,
      src: String = "p1", dst: String = "p2"): Schedule = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cur = edges.select(col(src).as("p1"), col(dst).as("p2"))
      .localCheckpoint(true)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (i <- 1 to rounds) {
      val deg = cur.select(col("p1").as("node"))
        .unionAll(cur.select(col("p2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val weak = deg.filter(col("deg") < k).select(col("node")).localCheckpoint(true)
      val nPeeled = weak.count()
      val next = cur
        .join(weak.select(col("node").as("p1")), Seq("p1"), "left_anti")
        .join(weak.select(col("node").as("p2")), Seq("p2"), "left_anti")
        .select(col("p1"), col("p2"))
        .localCheckpoint(true)
      val nEdges = next.count()
      val nNodes = next.select(col("p1").as("n"))
        .union(next.select(col("p2").as("n")))
        .distinct().count()
      stats += ((i, nPeeled, nNodes, nEdges))
      cur = next
    }
    Schedule(stats.toSeq, cur)
  }
}
