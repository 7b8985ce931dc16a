package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the embeddings table (Array[Float], 64-dim):
  * brute-force cosine top-k as the exact baseline, sign-bit LSH bucketing
  * as the scale path, threshold pair mining, and kNN label regression.
  *
  * Cosine kernel: the native graft.functions.VecDot expression (fused
  * codegen loop, double accumulation). Norms are precomputed ONCE per
  * vector before any pairwise join — the O(N²·d) → O(N²·d/3) win that
  * matters most at scale; the oracle mirrors the same normed-CTE shape,
  * and left-to-right summation keeps results hash-comparable.
  *
  * Scale notes: brute-force is O(Q·N) — fine for a bounded query set
  * against 100 TB when Q is small and the scan is columnar; the LSH
  * variant buckets both sides first so the join only compares
  * same-bucket candidates (axis-aligned random hyperplanes = sign bits
  * of fixed dims; deterministic, no stored model).
  */
object SimilarityQueries {

  /** embeddings + precomputed L2 norm. */
  private def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  /** pairwise cosine from precomputed norms. */
  private def cosineCol: Column =
    expr("vec_dot(a.embedding, b.embedding)") / (col("a.norm") * col("b.norm"))

  private val duckDot =
    "list_reduce(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> p[1] * p[2]), (x, y) -> x + y)"

  /** DuckDB normed CTE — same precompute shape and summation order. */
  private val duckNormed =
    """normed AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], v -> v * v), (x, y) -> x + y)) AS norm
      |  FROM embeddings
      |)""".stripMargin

  private val duckCosPair = s"($duckDot / (a.norm * b.norm))"

  def all: Seq[OracleQuery] = Seq(
    // Brute-force cosine top-5 for a bounded query set (vec_id < 20).
    OracleQuery(
      "sim_cosine_topk",
      (s, d) => {
        import s.implicits._
        val emb = normed(s, d)
        val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
        emb.filter($"vec_id" < 20).as("a")
          .join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
          .select(
            col("a.vec_id").as("query_id"),
            col("b.vec_id").as("neighbor_id"),
            cosineCol.as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5)
          .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rn")
          .orderBy($"query_id", $"rn")
      },
      Some(s"""WITH $duckNormed, pairs AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    $duckCosPair AS cos
              |  FROM normed a JOIN normed b ON a.vec_id != b.vec_id
              |  WHERE a.vec_id < 20
              |), ranked AS (
              |  SELECT query_id, neighbor_id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
              |  FROM pairs
              |)
              |SELECT query_id, neighbor_id, round(cos, 4) AS cos, rn
              |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)
    ),

    // Near-duplicate pair mining above a cosine threshold (the
    // embedding-space analogue of dedup). Brute force here; the LSH
    // variant below is the scale path.
    OracleQuery(
      "sim_threshold_pairs",
      (s, d) => {
        import s.implicits._
        val emb = normed(s, d)
        emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"),
            col("b.vec_id").as("vec_b"),
            cosineCol.as("cos"))
          .filter($"cos" >= 0.38)
          .select($"vec_a", $"vec_b", round($"cos", 4).as("cos"))
          .orderBy($"vec_a", $"vec_b")
      },
      Some(s"""WITH $duckNormed
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  round($duckCosPair, 4) AS cos
              |FROM normed a JOIN normed b ON a.vec_id < b.vec_id
              |WHERE $duckCosPair >= 0.38
              |ORDER BY vec_a, vec_b""".stripMargin)
    ),

    // Sign-bit LSH bucketing: bucket = sign bits of dims 0..5 (axis-
    // aligned hyperplanes). Same-bucket candidates only — the candidate
    // join that replaces the N² compare at scale. Reports bucket sizes
    // and intra-bucket mean cosine.
    OracleQuery(
      "sim_lsh_buckets",
      (s, d) => {
        import s.implicits._
        def bucketExpr(col0: String) = (0 until 6)
          .map(j => s"(CASE WHEN CAST(element_at($col0, ${j + 1}) AS DOUBLE) >= 0 THEN ${1 << j} ELSE 0 END)")
          .mkString(" + ")
        val emb = normed(s, d)
          .withColumn("bucket", expr(bucketExpr("embedding")).cast("int"))
        val pairs = emb.as("a").join(emb.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.bucket").as("bucket"), cosineCol.as("cos"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_pairs"), round(avg($"cos"), 4).as("mean_cos"))
        val sizes = emb.groupBy($"bucket").agg(count(lit(1)).as("n_vecs"))
        sizes.join(pairs, Seq("bucket"), "left_outer")
          .select($"bucket", $"n_vecs",
            coalesce($"n_pairs", lit(0L)).as("n_pairs"),
            $"mean_cos")
          .orderBy($"bucket")
      },
      Some(s"""WITH $duckNormed, bucketed AS (
              |  SELECT vec_id, embedding, norm,
              |    CAST(${(0 until 6).map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")} AS INT) AS bucket
              |  FROM normed
              |), pairs AS (
              |  SELECT a.bucket, count(*) AS n_pairs,
              |    round(avg($duckCosPair), 4) AS mean_cos
              |  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              |  GROUP BY a.bucket
              |), sizes AS (
              |  SELECT bucket, count(*) AS n_vecs FROM bucketed GROUP BY bucket
              |)
              |SELECT s.bucket AS bucket, s.n_vecs, coalesce(p.n_pairs, 0) AS n_pairs, p.mean_cos
              |FROM sizes s LEFT JOIN pairs p ON s.bucket = p.bucket
              |ORDER BY bucket""".stripMargin)
    ),

    // IVF (inverted-file) ANN — the index-structured scale path beyond
    // flat LSH: 8 deterministic coarse centroids (vec_id 0..7; a k-means
    // fit would replace them at scale, selection kept deterministic for
    // the oracle), every vector assigned to its nearest centroid's cell,
    // queries probe only their nprobe=2 closest cells and brute-force
    // inside them. Work per query drops from O(N·d) to
    // O(K·d + N·nprobe/K·d); the candidate join is cell-partitioned, so
    // at 100 TB each cell's vectors are co-located and the probe never
    // touches the other K−nprobe cells. Centroids are broadcast.
    OracleQuery(
      "sim_ivf_topk",
      (s, d) => {
        import s.implicits._
        val emb = normed(s, d)
        val cents = emb.filter($"vec_id" < 8)
          .select($"vec_id".as("cid"), $"embedding".as("c_emb"), $"norm".as("c_norm"))
        val wAssign = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
        val assign = emb.select($"vec_id", $"embedding", $"norm")
          .crossJoin(broadcast(cents))
          .withColumn("ccos", expr("vec_dot(embedding, c_emb)") / ($"norm" * $"c_norm"))
          .withColumn("crn", row_number().over(wAssign))
        val cells = assign.filter($"crn" === 1).select($"vec_id".as("member_id"), $"cid")
        val probes = assign.filter($"vec_id" < 10 && $"crn" <= 2)
          .select($"vec_id".as("query_id"), $"cid")
        val cands = probes.join(cells, "cid")
          .filter($"member_id" =!= $"query_id")
          .select($"query_id", $"member_id".as("neighbor_id"))
        val scored = cands
          .join(emb.select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"norm".as("q_norm")), "query_id")
          .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"), $"norm".as("n_norm")), "neighbor_id")
          .withColumn("cos", expr("vec_dot(q_emb, n_emb)") / ($"q_norm" * $"n_norm"))
        val wTop = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rn", row_number().over(wTop))
          .filter($"rn" <= 3)
          .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rn")
          .orderBy($"query_id", $"rn")
      },
      Some(s"""WITH $duckNormed, cents AS (
              |  SELECT vec_id AS cid, embedding, norm FROM normed WHERE vec_id < 8
              |), assign AS (
              |  SELECT v.vec_id, c.cid,
              |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |      (list_reduce(list_transform(list_zip(v.embedding::DOUBLE[], c.embedding::DOUBLE[]), p -> p[1] * p[2]), (x, y) -> x + y)
              |       / (v.norm * c.norm)) DESC, c.cid) AS crn
              |  FROM normed v CROSS JOIN cents c
              |), cells AS (
              |  SELECT vec_id AS member_id, cid FROM assign WHERE crn = 1
              |), probes AS (
              |  SELECT vec_id AS query_id, cid FROM assign WHERE vec_id < 10 AND crn <= 2
              |), cands AS (
              |  SELECT p.query_id, m.member_id AS neighbor_id
              |  FROM probes p JOIN cells m ON p.cid = m.cid
              |  WHERE m.member_id != p.query_id
              |), scored AS (
              |  SELECT c.query_id, c.neighbor_id,
              |    (list_reduce(list_transform(list_zip(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), p -> p[1] * p[2]), (x, y) -> x + y)
              |     / (q.norm * n.norm)) AS cos
              |  FROM cands c
              |  JOIN normed q ON q.vec_id = c.query_id
              |  JOIN normed n ON n.vec_id = c.neighbor_id
              |), ranked AS (
              |  SELECT query_id, neighbor_id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
              |  FROM scored
              |)
              |SELECT query_id, neighbor_id, round(cos, 4) AS cos, rn
              |FROM ranked WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin)
    ),

    // kNN label regression (models.py:338-380 kNN shape): predicted label
    // = mean of the 5 nearest neighbors' labels by cosine, excluding self;
    // summarized as mean prediction per true label.
    OracleQuery(
      "sim_knn_label",
      (s, d) => {
        import s.implicits._
        val emb = normed(s, d)
        val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
        emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
          .select(
            col("a.vec_id").as("query_id"),
            col("a.label").as("true_label"),
            col("b.vec_id").as("neighbor_id"),
            col("b.label").as("n_label"),
            cosineCol.as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5)
          .groupBy($"query_id", $"true_label")
          .agg(round(avg($"n_label"), 4).as("pred_label"))
          .groupBy($"true_label")
          .agg(
            count(lit(1)).as("n"),
            round(avg($"pred_label"), 4).as("mean_pred"),
            round(avg(abs($"pred_label" - $"true_label")), 4).as("mae"))
          .orderBy($"true_label")
      },
      Some(s"""WITH $duckNormed, pairs AS (
              |  SELECT a.vec_id AS query_id, a.label AS true_label, b.vec_id AS neighbor_id,
              |    b.label AS n_label,
              |    $duckCosPair AS cos
              |  FROM normed a JOIN normed b ON a.vec_id != b.vec_id
              |), ranked AS (
              |  SELECT query_id, true_label, n_label,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
              |  FROM pairs
              |), preds AS (
              |  SELECT query_id, true_label, round(avg(n_label), 4) AS pred_label
              |  FROM ranked WHERE rn <= 5 GROUP BY query_id, true_label
              |)
              |SELECT true_label, count(*) AS n, round(avg(pred_label), 4) AS mean_pred,
              |  round(avg(abs(pred_label - true_label)), 4) AS mae
              |FROM preds GROUP BY true_label ORDER BY true_label""".stripMargin)
    )
  )
}
