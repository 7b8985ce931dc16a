package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) with a DETERMINISTIC tie-break: each round every node adopts
  * the most frequent label among its neighbors, ties broken by the
  * smallest label — classic LPA leaves tie resolution to arrival order,
  * which is nondeterministic on a shuffle; here the whole (count desc,
  * label asc) preference collapses into ONE exact integer key
  * `cnt·K − lbl` (labels < K), so the per-node argmax is a plain max()
  * hash aggregate and the label decodes as `K − (max % K)` — no struct
  * ordering, no window, bit-identical on any engine.
  *
  * Scale shape: each round is one hash join (directed edges ⋈ labels on
  * src — the label side is node-bounded) plus two hash aggregates; the
  * label frame is eagerly localCheckpoint'd per round (the small-frame
  * lineage recipe — the edge frame stays a lazy persist and is never
  * re-planned), so plan growth is linear in rounds. A fixed round count
  * keeps the oracle replayable; production runs to label stability with
  * the same per-round cost.
  */
object LabelPropagation {

  /** Final (node, lbl) after `rounds` synchronous updates over the
    * undirected edge list (p1, p2), one row per unordered edge. The
    * packed-key capacity `k` defaults to 0 = AUTO: the next power of
    * two above the max node id (capacity never caps the graph — the
    * only trade is count headroom, cnt < 2^63/k, still ≥ 2^36 edges
    * per label at k = 2^27). Callers replaying against a fixed oracle
    * pass the literal k the oracle spells. */
  def run(edges: DataFrame, rounds: Int, k: Long = 0L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dir = edges.select(col("p1").as("src"), col("p2").as("dst"))
      .union(edges.select(col("p2").as("src"), col("p1").as("dst")))
      .persist()
    val maxId = dir.agg(max(col("src"))).collect()(0).getLong(0)
    val cap = if (k > 0) k else java.lang.Long.highestOneBit(maxId + 1) << 1
    require(maxId < cap, s"node ids must be < $cap for the packed argmax key, max=$maxId")
    require(cap <= (1L << 40), s"packed-key capacity $cap leaves < 2^23 count headroom")
    // decode is (k − m % k) % k — the outer mod covers label 0 (part
    // keys in this corpus are 0-based), where m % k lands on 0
    var labels = dir.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = dir
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(col("cnt") * cap - col("lbl")).as("m"))
        .select(col("dst").as("node"), ((lit(cap) - col("m") % cap) % cap).as("lbl"))
        .localCheckpoint(true)
    }
    dir.unpersist()
    labels
  }
}
