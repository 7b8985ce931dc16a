package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted IVF (inverted-file) ANN index — the similarity-search
  * sibling of [[DedupIndex]]: the write-once derivable columns of an
  * embedding corpus stored AT INDEX TIME so that every later query
  * batch probes precomputed state instead of re-assigning (or worse,
  * re-fitting) the corpus:
  *
  *   dir/centroids  (cell, emb)                 the learned coarse quantizer
  *   dir/members    (vec_id, cell, embedding, norm)  one row per vector
  *   dir/meta       (k)                         quantizer arity
  *
  * `members` is written range-partitioned and row-group-sorted by
  * `cell` ([[graft.sources.Sinks.writeSortedBy]]), and [[topk]] pushes
  * the probed cell set into the scan as a literal In predicate — the
  * set is bounded by k BY CONSTRUCTION (there are only k cells), so
  * unlike [[DedupDocs.incrementalIndexed]]'s key pushdown it needs no
  * size cap: a probe decodes only the row groups of its nProbe cells
  * per query batch, never the other k−nProbe cells' bytes.
  *
  * The centroids are INDEX STATE, exactly like DedupIndex's banding
  * parameter: [[append]] assigns new vectors with the STORED centroids
  * (never refits — a refit would silently re-partition the cell space
  * and orphan every existing member row), so generations stay mutually
  * probeable. Re-fit = rebuild ([[write]]), an explicit offline choice.
  *
  * Cosine contract: member norms are stored (write-once derivable),
  * query norms are computed at probe time; scoring is the fused
  * vec_dot expression — identical numerics to the in-flight IVF
  * queries (sim_ivf_kmeans_topk), which is what lets the two spellings
  * share one oracle.
  */
object IvfIndex {

  /** Fit the coarse quantizer (KMeansVec: deterministic init from the k
    * lowest ids, `iters` Lloyd rounds) and write the index. Overwrites
    * `dir`. `fitOn` separates the quantizer's training frame from the
    * indexed frame (standard IVF practice at scale: train on a sample
    * or the anticipated full corpus, index what's on hand, [[refresh]]
    * the rest in as it lands) — null trains on `emb` itself. */
  def write(emb: DataFrame, dir: String, k: Int = 8, iters: Int = 1,
      fitOn: DataFrame = null): Unit = {
    val spark = emb.sparkSession
    val cents = KMeansVec.fit(
      Option(fitOn).getOrElse(emb), "vec_id", "embedding", k, iters)
    val centRows = cents.zipWithIndex.map { case (e, i) =>
      Row(i, e.toSeq)
    }
    val centSchema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("emb", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(centRows.toIndexedSeq, 1), centSchema)
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    writeMembers(emb, cents, dir, SaveMode.Overwrite)
    import spark.implicits._
    Seq(k).toDF("k")
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** Append new vectors, assigned with the STORED centroids. Existing
    * member files are untouched; appended files carry the same
    * per-file cell sort, so cell pruning holds within every
    * generation. */
  def append(emb: DataFrame, dir: String): Unit =
    writeMembers(emb, readCentroids(emb.sparkSession, dir), dir, SaveMode.Append)

  /** What [[refresh]] found and did: vectors indexed for the first
    * time, members untouched, members dropped (vanished from the
    * corpus). */
  final case class RefreshDelta(added: Long, kept: Long, removed: Long)

  /** Corpus-level incremental maintenance — Manifest.refresh's delta
    * discipline for the vector index: diff the CURRENT corpus frame
    * against the stored member ids, assign ONLY never-seen vectors with
    * the STORED centroids ([[append]]'s no-refit contract), and, when
    * members VANISHED from the corpus, rewrite the member set without
    * them through [[compact]]'s crash-safe swap (a removal cannot be an
    * append). Result: probe-identical to indexing the whole current
    * corpus under the same stored quantizer (IvfIndexSpec pins
    * assignment equality), at delta cost when the corpus only grows —
    * the overwhelmingly common case. Gate a refreshed index with
    * [[recallAt]] before serving: additions can't change existing
    * assignments, but a DRIFTED corpus can outgrow the stored
    * quantizer — a recall drop below the deployment's floor means an
    * offline refit ([[write]]) is due. Same single-writer contract as
    * [[compact]]. */
  def refresh(emb: DataFrame, dir: String): RefreshDelta = {
    val spark = emb.sparkSession
    val current = emb.select(col("vec_id")).persist()
    val stored = readMembers(spark, dir).select(col("vec_id")).persist()
    try {
      val newVecs = emb.join(stored, Seq("vec_id"), "left_anti")
      val nAdded = newVecs.count()
      val nRemoved = stored.join(current, Seq("vec_id"), "left_anti").count()
      val nKept = stored.count() - nRemoved
      if (nAdded > 0) append(newVecs, dir)
      // the id frame can be corpus-sized, so no broadcast hint — the
      // semi-join shuffles on vec_id (uniform) and AQE may still
      // broadcast a small one at runtime
      if (nRemoved > 0) compactWith(spark, dir,
        _.join(current, Seq("vec_id"), "left_semi"))
      RefreshDelta(nAdded, nKept, nRemoved)
    } finally {
      current.unpersist(false); stored.unpersist(false)
    }
  }

  /** Recall@k of the index probe against the exact brute-force ranking
    * over the SAME stored member set — the post-[[refresh]] acceptance
    * gate. Cheap by design: run it on a bounded query sample (the
    * brute-force side is |queries| × |members| fused-dot work, the
    * exact cost profile of sim_cosine_topk). */
  def recallAt(spark: SparkSession, dir: String, queries: DataFrame,
      topK: Int = 3, nProbe: Int = 2): Double = {
    val approx = topk(spark, dir, queries, topK, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      sqrt(vecDot(col("embedding"), col("embedding"))).as("q_norm"))
    val members = readMembers(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val exact = members.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        vecDot(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val nExact = exact.count()
    if (nExact == 0L) 1.0
    else exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .count().toDouble / nExact
  }

  /** One micro-batch of streaming index maintenance: assign with the
    * stored centroids and (over)write generation directory
    * `gens/<batchId>` — replaying a batch after a crash rewrites ITS
    * OWN directory and no other, so the append is idempotent per
    * batch id (the [[graft.streaming.Streams]] snapshot-merge
    * contract, minus the pointer: generations are disjoint by
    * construction, nothing needs a commit point). */
  def applyAppendBatch(batch: DataFrame, dir: String, batchId: Long): Unit =
    writeMembersInto(batch, readCentroids(batch.sparkSession, dir),
      s"$dir/gens/$batchId", SaveMode.Overwrite)

  private def writeMembers(emb: DataFrame, cents: Array[Array[Double]],
      dir: String, mode: SaveMode): Unit =
    writeMembersInto(emb, cents, s"$dir/members", mode)

  private def writeMembersInto(emb: DataFrame, cents: Array[Array[Double]],
      path: String, mode: SaveMode): Unit = {
    val rows = emb.select(
      col("vec_id"),
      KMeansVec.cellExpr("embedding", cents).as("cell"),
      col("embedding"),
      sqrt(vecDot(col("embedding"), col("embedding"))).as("norm"))
    // cache across writeSortedBy's range-sample + write pair (same
    // lifecycle containment as DedupIndex.writeFrames)
    val cached = rows.persist()
    try graft.sources.Sinks.writeSortedBy(cached, path, Seq("cell"), mode = mode)
    finally cached.unpersist(false)
  }

  /** Every member path of the index: the base `members` table plus any
    * COMMITTED streaming generations under `gens/`. A generation counts
    * only when its parquet job committed (`_SUCCESS` present) — a
    * half-written generation from a crashed micro-batch is invisible to
    * probes until its replay rewrites it; non-numeric stray directories
    * are ignored rather than fatal. Each committed generation is a
    * complete, cell-sorted parquet directory, so footer pruning holds
    * per-path. When the base table is missing (crash inside
    * [[compact]]'s swap) the staged `members_old` stands in for it —
    * together with the gens/gens_old rule below, every crash window
    * reads exactly one copy of every row. */
  private[graft] def memberPaths(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committedGens(name: String): Seq[String] = {
      val gensDir = new org.apache.hadoop.fs.Path(s"$dir/$name")
      if (!fs.exists(gensDir)) Seq.empty
      else
        fs.listStatus(gensDir).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName)
          .filter(_.forall(_.isDigit))
          .filter(g => fs.exists(new org.apache.hadoop.fs.Path(gensDir, s"$g/_SUCCESS")))
          .map(_.toLong).sorted
          .map(g => s"$dir/$name/$g")
    }
    // compact stages members→gens away before the swap. Which copies to
    // read follows from which base is live: a LIVE members next to a
    // gens_old means the swap completed (the compacted base already
    // CONTAINS the generations — reading gens_old too would double-
    // count), so staged gens are only consulted when the base itself is
    // the staged members_old (i.e. we crashed mid-swap).
    val membersLive = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/members"))
    val gens =
      if (membersLive) committedGens("gens")
      else {
        val live = committedGens("gens")
        if (live.nonEmpty) live else committedGens("gens_old")
      }
    (if (membersLive) s"$dir/members" else s"$dir/members_old") +: gens
  }

  private def readMembers(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(memberPaths(spark, dir): _*)

  /** Compact append generations: rewrite `members` fully cell-sorted so
    * footer pruning holds across the WHOLE index again (same offline
    * maintenance contract as [[DedupIndex.compact]]; centroids and meta
    * are generation-free).
    *
    * Crash-safe swap: the compacted table is fully written to a temp
    * sibling first; the live `members`/`gens` are then STAGED AWAY
    * (renamed to `members_old`/`gens_old`), the temp renamed in, and
    * the staged copies deleted last. [[memberPaths]] prefers live over
    * staged for each of the two kinds independently, so every crash
    * window — before the stage, between the stages, before the swap,
    * before the cleanup — still reads exactly one copy of every row.
    * A second compact (or a probe) after a crash heals by the same
    * preference rule; re-running compact completes the fold.
    *
    * Single-writer contract: compaction must not run concurrently with
    * [[applyAppendBatch]] — a new generation landing between the gens
    * stage and the swap would be invisible to the staged-fallback rule.
    * Pause the maintenance stream (or fence on batch ids) around
    * compaction, exactly as with [[DedupIndex.compact]]. */
  def compact(spark: SparkSession, dir: String): Unit =
    compactWith(spark, dir, identity)

  /** [[compact]] with a member filter applied inside the rewrite — the
    * removal path of [[refresh]] rides the same crash-safe swap. */
  private def compactWith(spark: SparkSession, dir: String,
      keep: DataFrame => DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // Finish a previously crashed swap before starting a new one. The
    // staged GENERATIONS are restored FIRST: a missing base means the
    // swap-in never happened, so gens_old is live data, not a stale
    // duplicate — deleting it here would lose every staged generation.
    // Restoring gens before members keeps every heal window readable by
    // [[memberPaths]] (members_old + live gens is the W2 shape).
    if (!fs.exists(p(s"$dir/members")) && fs.exists(p(s"$dir/members_old"))) {
      if (!fs.exists(p(s"$dir/gens")) && fs.exists(p(s"$dir/gens_old")))
        require(fs.rename(p(s"$dir/gens_old"), p(s"$dir/gens")),
          s"could not heal staged generations at $dir")
      require(fs.rename(p(s"$dir/members_old"), p(s"$dir/members")),
        s"could not heal staged members at $dir")
    }
    // with a live base, any remaining staged copies ARE stale duplicates
    fs.delete(p(s"$dir/members_old"), true)
    fs.delete(p(s"$dir/gens_old"), true)

    val tmp = s"$dir/.compact_members"
    fs.delete(p(tmp), true)
    graft.sources.Sinks.writeSortedBy(
      keep(readMembers(spark, dir)), tmp, Seq("cell"))
    require(fs.rename(p(s"$dir/members"), p(s"$dir/members_old")),
      s"could not stage members at $dir")
    if (fs.exists(p(s"$dir/gens")))
      require(fs.rename(p(s"$dir/gens"), p(s"$dir/gens_old")),
        s"could not stage generations at $dir")
    require(fs.rename(p(tmp), p(s"$dir/members")),
      s"compaction swap failed at $dir — staged copies left for healing")
    fs.delete(p(s"$dir/members_old"), true)
    fs.delete(p(s"$dir/gens_old"), true)
  }

  /** The stored coarse quantizer, ordered by cell id. */
  def readCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/centroids").orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  def storedK(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/meta").head.getInt(0)

  /** Exact-cosine top-k over the index for a (query_id, embedding)
    * frame: map-side probe-cell assignment against the stored centroid
    * literals, cell-set pushdown into the sorted members scan,
    * broadcast probes ⋈ members on cell, fused-vec_dot scoring, one
    * per-query window. Self-matches (a query id that is also a member
    * id) are excluded, mirroring the in-flight IVF queries. */
  def topk(spark: SparkSession, dir: String, queries: DataFrame,
      topK: Int = 3, nProbe: Int = 2): DataFrame = {
    val (scored, _) = scoredCandidates(spark, dir, queries, nProbe)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rn").cast("int").as("rn"))
  }

  /** Probe telemetry over the identical candidate path [[topk]] ranks:
    * (distinct probed cells, scored candidate rows). Wall time hides
    * probe fan-out drift behind CPU headroom at small scale factors —
    * these counts expose it directly (BENCH `sim_ivf_*` rows: members
    * grow with N, so candidates must track N·nProbe/K linearly; a
    * super-linear jump means the quantizer's cells went lopsided). */
  def probeStats(spark: SparkSession, dir: String, queries: DataFrame,
      nProbe: Int = 2): (Long, Long) = {
    val (scored, nCells) = scoredCandidates(spark, dir, queries, nProbe)
    (nCells.toLong, scored.count())
  }

  /** Shared probe path: map-side cell assignment against the stored
    * centroid literals, cell-set pushdown into the members scan,
    * broadcast probes ⋈ members on cell, fused-vec_dot scoring.
    * Self-matches excluded. Returns (scored frame, probed-cell count). */
  private def scoredCandidates(spark: SparkSession, dir: String,
      queries: DataFrame, nProbe: Int): (DataFrame, Int) = {
    val cents = readCentroids(spark, dir)
    require(cents.nonEmpty, s"no centroids at $dir")
    val probeN = math.min(nProbe, cents.length)

    val probes = queries.select(
        col("query_id"),
        col("embedding").as("q_emb"),
        sqrt(vecDot(col("embedding"), col("embedding"))).as("q_norm"),
        KMeansVec.probeCellsExpr("embedding", cents, probeN).as("__cells"))
      .withColumn("cell", explode(transform(col("__cells"), c => c.getField("cid"))))
      .drop("__cells")

    // bounded by construction: there are only |cents| distinct cells,
    // so the collect is ≤ k rows no matter how many queries probe
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val members = readMembers(spark, dir)
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))

    val scored = broadcast(probes)
      .join(members, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        vecDot(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm")))
    (scored, probedCells.length)
  }

  /** Fused dot product without a function-registry round trip. */
  private def vecDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.PlanBridge.column(
      graft.functions.VecDot(
        org.apache.spark.sql.graft.PlanBridge.expression(a),
        org.apache.spark.sql.graft.PlanBridge.expression(b)))
}
