package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end document dedup — the front-door pipeline an LLM corpus
  * runs before training: exact duplicates (content hash) plus near
  * duplicates (MinHash-LSH banding over word trigrams) become candidate
  * edges, connected components turn edges into duplicate GROUPS, and
  * the smallest doc_id per group survives.
  *
  * Scale shape: per-row fused signatures (graft.functions.MinHashSig —
  * no explode, no shuffle before the band join) → star edges per
  * fingerprint/bucket (k−1 edges per k-duplicate group, never the
  * C(k,2) clique) → label propagation (bounded rounds). No driver
  * loops over data; the only driver state is the convergence counter.
  */
object DedupDocs {

  private def nSeeds = graft.functions.MinHashSigImpl.Seeds.length

  /** @param docs columns (doc_id: long, text: string)
    * @param minJaccard LSH banding yields CANDIDATE edges; a single
    *        band collision can be a false positive, and an unverified
    *        merge permanently drops a unique document. When set
    *        (default 0.5), every candidate edge is verified by EXACT
    *        trigram Jaccard before clustering — the verification join
    *        touches only candidate pairs, so its cost scales with the
    *        candidate count, not the corpus. `None` restores raw
    *        banding (recall over precision, the crawl-dedup trade).
    * @param checkpointDir forwarded to ConnectedComponents: reliable
    *        checkpoint dir for cluster runs.
    * @return (doc_id, component, is_survivor) — component is the min
    *         doc_id of the duplicate group (singletons are their own
    *         component and survive)
    */
  def apply(docs: DataFrame, rowsPerBand: Int = 4,
      minJaccard: Option[Double] = Some(0.5),
      checkpointDir: Option[String] = None): DataFrame = {
    require(rowsPerBand > 0 && nSeeds % rowsPerBand == 0,
      s"rowsPerBand must divide $nSeeds (got $rowsPerBand) — a remainder would " +
        "silently drop minhashes from the banding and weaken near-dup recall")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // Edges are STAR-shaped, not pairwise: every doc in a group (same
    // fingerprint / same LSH bucket) connects to the group's min doc_id.
    // Connected components are identical to the clique formulation, but
    // a k-duplicate boilerplate group emits k−1 edges instead of
    // C(k,2) ≈ k²/2 — the difference between a shuffle and an OOM when
    // one template appears a million times in a crawl.

    // exact-duplicate edges: same content hash
    val fps = docs.select($"doc_id", md5($"text").as("fp"))
    val exactEdges = fps
      .withColumn("head", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .filter($"doc_id" =!= $"head")
      .select($"head".as("src"), $"doc_id".as("dst"))

    // near-duplicate candidate edges: fused per-row MinHash signatures
    // (graft.functions.MinHashSig — no gram explode, no signature
    // shuffle) banded into buckets
    val sig = docs.select($"doc_id", expr("minhash_sig(text)").as("sig"))
      .filter($"sig".isNotNull)
    val nBands = nSeeds / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      md5(concat_ws(",",
        (1 to rowsPerBand).map(r => element_at($"sig", b * rowsPerBand + r)): _*))
    }
    val buckets = sig.select($"doc_id", explode(array(bandCols: _*)).as("bucket"))
    val nearEdges = buckets
      .withColumn("head", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bucket")))
      .filter($"doc_id" =!= $"head")
      .select($"head".as("src"), $"doc_id".as("dst"))
      .distinct()

    // Verify candidates: exact trigram Jaccard per candidate edge. A
    // verified-out doc can still join a group through any other band it
    // genuinely shares; exact-duplicate (content-hash) edges are certain
    // and never verified.
    val verifiedNear = minJaccard match {
      case None => nearEdges
      case Some(j) =>
        val grams = graft.queries.Shingles.wordTrigrams(docs)
          .select($"doc_id", $"gram").distinct()
        val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
        val inter = nearEdges
          .join(grams.withColumnsRenamed(Map("doc_id" -> "src")), "src")
          .join(grams.withColumnsRenamed(Map("doc_id" -> "dst")), Seq("dst", "gram"))
          .groupBy($"src", $"dst").agg(count(lit(1)).as("n_inter"))
        nearEdges
          .join(inter, Seq("src", "dst"), "left_outer")
          .join(sizes.select($"doc_id".as("src"), $"n_grams".as("n_src")), "src")
          .join(sizes.select($"doc_id".as("dst"), $"n_grams".as("n_dst")), "dst")
          .filter(
            coalesce($"n_inter", lit(0L)).cast("double") /
              ($"n_src" + $"n_dst" - coalesce($"n_inter", lit(0L))) >= j)
          .select($"src", $"dst")
    }

    val comps = ConnectedComponents(
      docs.select($"doc_id".as("id")),
      exactEdges.unionByName(verifiedNear),
      checkpointDir = checkpointDir)
    comps.select(
      $"id".as("doc_id"),
      $"component",
      ($"id" === $"component").as("is_survivor"))
  }
}
