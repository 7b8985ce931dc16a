package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete every
  * node of degree < k until the remaining subgraph (the k-core) is
  * stable. Input is an undirected edge list (src, dst), one row per
  * unordered edge (each endpoint counted once per incident row).
  *
  * Round structure: ONE degree aggregate per round (persisted — it
  * serves the weak-set count, both anti joins, AND the previous
  * round's surviving-node count, since |deg(i+1)| IS n_nodes(i); the
  * naive accounting pays a separate distinct-endpoints shuffle per
  * round for that number). The edge frame is cut with an EAGER
  * localCheckpoint per round — a round's plan reads the previous
  * round's edges three times, so an uncheckpointed chain doubles the
  * logical plan every round and merely rendering the plan string OOMs
  * the driver by round 4 (persist caches execution but never truncates
  * the plan). At cluster scale the loop runs to fixpoint with reliable
  * checkpoints every few rounds (the ConnectedComponents discipline)
  * and broadcasts the weak set while it fits.
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
    def degOf(e: DataFrame) = e.select(col("p1").as("node"))
      .unionAll(e.select(col("p2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    var cur = edges.select(col(src).as("p1"), col(dst).as("p2"))
      .localCheckpoint(true)
    var deg = degOf(cur).persist()
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (i <- 1 to rounds) {
      // the WEAK set is the frame to checkpoint, not the edges: it is
      // node-bounded and usually a sliver, so the eager cut is a
      // millisecond job — and with weak's plan severed, each round
      // adds only TWO broadcast anti joins to the edge lineage (linear
      // growth; the exponential plan blow-up needs weak's deg subtree
      // to re-embed the edge plan three times per round). The edge
      // frame itself stays a lazy in-memory persist — a per-round
      // eager disk checkpoint of the big side measured ~2× the whole
      // peel. Past ~20 rounds, re-checkpoint the edges periodically.
      val weak = deg.filter(col("deg") < k).select(col("node"))
        .localCheckpoint(true)
      val nPeeled = weak.count()
      // broadcast: the edge list — the big side — never shuffles for
      // the peel (unknown stats on the aggregated side otherwise
      // sort-merge BOTH anti joins, shuffling every surviving edge
      // twice per round). A graph whose round-1 weak set outgrows the
      // broadcast budget peels with shuffle anti joins: drop the hint,
      // same algebra.
      val next = cur
        .join(broadcast(weak.select(col("node").as("p1"))), Seq("p1"), "left_anti")
        .join(broadcast(weak.select(col("node").as("p2"))), Seq("p2"), "left_anti")
        .select(col("p1"), col("p2"))
        .persist()
      persisted += next
      val nEdges = next.count()
      val degNext = degOf(next).persist()
      val nNodes = degNext.count() // = surviving nodes after round i
      stats += ((i, nPeeled, nNodes, nEdges))
      deg.unpersist()
      deg = degNext
      cur = next
    }
    deg.unpersist()
    // intermediate rounds' caches are dead once the loop ends; the
    // returned core (the last persist) stays cached for the caller
    persisted.dropRight(1).foreach(_.unpersist())
    Schedule(stats.toSeq, cur)
  }
}
