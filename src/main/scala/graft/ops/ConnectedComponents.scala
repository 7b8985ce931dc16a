package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * clustering step that turns near-duplicate candidate PAIRS into
  * duplicate GROUPS (keep one doc per component).
  *
  * Each iteration is one join + aggregate (label := min(label,
  * neighbors' labels)) with a driver-side convergence check on the
  * count of changed labels — the Pregel pattern without GraphX:
  * shuffle-parallel, state is one long per vertex, iterations bounded
  * by the graph diameter (near-dup components are tiny, so 2–4 rounds).
  */
object ConnectedComponents {

  /** @param vertices single column `id`
    * @param edges columns `src`, `dst` (undirected; both orders added here)
    * @param checkpointDir when set, per-round state goes through a
    *        reliable `checkpoint` into this directory (HDFS/object
    *        store on a cluster) instead of `localCheckpoint`:
    *        localCheckpoint stores blocks on executors, so losing one
    *        executor mid-iteration kills the whole job. Local runs
    *        keep the zero-I/O localCheckpoint default.
    * @return (id, component) where component = min id reachable
    */
  def apply(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = vertices.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val both = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    // checkpoint each round: iterative plans otherwise nest the
    // whole previous lineage (exponential logical-plan growth — the
    // standard iterative-Spark pitfall; the driver OOMs just printing
    // the plan long before the data is a problem).
    var labels = pin(vertices.select(col("id"), col("id").as("component")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = both
        .join(labels, both("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("component")).as("n_comp"))
      // carry the pre-round label as `prev` so convergence is a filter
      // over the checkpointed result — no extra join+shuffle per round
      val relaxed = labels
        .join(neighborMin, labels("id") === col("id2"), "left_outer")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"))
      // path compression (pointer doubling): follow component → its
      // component, halving path lengths — convergence in O(log diameter)
      // rounds instead of O(diameter)
      val updated = relaxed.as("u")
        .join(relaxed.select(col("id").as("cid"), col("component").as("ccomp")).as("m"),
          col("u.component") === col("cid"), "left_outer")
        .select(col("u.id").as("id"), col("u.prev").as("prev"),
          least(col("u.component"), coalesce(col("ccomp"), col("u.component"))).as("component"))
      val pinned = pin(updated)
      val changed = pinned.filter(col("component") =!= col("prev")).count()
      labels = pinned.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    both.unpersist()
    labels
  }
}
