package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sign-bit (random-hyperplane) LSH over an embedding column — the
  * bucket structure behind embedding near-dup clustering and the LSH
  * bucket report.
  *
  * Two scale controls, both required at 100 TB:
  *
  *  - `nPlanes` is a PARAMETER, not a constant: with B = 2^nPlanes
  *    buckets, per-bucket pair work grows as (N/B)² — a fixed B turns
  *    quadratic as N grows. Size it with [[planesFor]] so expected
  *    bucket occupancy stays constant (B ∝ N).
  *  - Even a well-sized B leaves skew (a million-copy template lands in
  *    ONE bucket), so pair generation is regime-split like
  *    [[DedupDocs]]: buckets ≤ `maxBucket` emit the C(k,2) clique
  *    (exact, verifiable pairs), larger buckets degrade to k−1 star
  *    edges through the bucket's min-id head — connectivity preserved,
  *    pair count linear in the bucket, never (N/B)².
  */
object SignLsh {

  /** Axis-aligned sign-bit bucket id from the first `nPlanes` dims
    * (SQL expression string — composes with expr() on both the Spark
    * side and, modulo array indexing spelling, the DuckDB oracle). */
  def bucketExpr(embCol: String, nPlanes: Int): String = {
    require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes out of range: $nPlanes")
    (0 until nPlanes)
      .map(j => s"(CASE WHEN CAST(element_at($embCol, ${j + 1}) AS DOUBLE) >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
  }

  /** Hyperplane count for ~`targetBucket` expected vectors per bucket:
    * ceil(log2(n / targetBucket)), clamped to [1, maxDim]. The caller
    * passes the corpus count (or an estimate); at 1000× the data this
    * adds ~10 planes instead of letting buckets grow 1000× denser. */
  def planesFor(n: Long, targetBucket: Int, maxDim: Int = 62): Int = {
    val want = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(maxDim, math.max(1, want))
  }

  /** Adds `bucket` (sign-bit id), `bsize` (bucket occupancy) and `head`
    * (bucket min id) in ONE window pass over the bucket partitioning. */
  def withBucketStats(df: DataFrame, embCol: String, idCol: String,
      nPlanes: Int): DataFrame = {
    val w = Window.partitionBy(col("bucket"))
    df.withColumn("bucket", expr(bucketExpr(embCol, nPlanes)).cast("long"))
      .withColumn("bsize", count(lit(1)).over(w))
      .withColumn("head", min(col(idCol)).over(w))
  }

  /** Mega-bucket star pair join with FULL columns on both sides: the
    * bucket's head row (alias "a") against every non-head member (alias
    * "b") — the linear-pair regime shared by the LSH bucket report and
    * embedding-cosine dedup; callers score/select what they need. Kept
    * here so the guard has ONE spelling (head tie-breaking, bsize
    * threshold) across every query that degrades hot buckets. */
  def megaStarJoin(stats: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val mega = stats.filter(col("bsize") > maxBucket)
    mega.filter(col(idCol) === col("head")).as("a")
      .join(mega.filter(col(idCol) =!= col("head")).as("b"),
        col("a.bucket") === col("b.bucket"))
  }

  /** Regime-split candidate edges for connected components: verified
    * clique pairs for ordinary buckets (caller applies its own pair
    * filter, e.g. a cosine floor, on the returned clique side), star
    * edges for mega buckets. Returns (src, dst, regime) with
    * regime ∈ clique | star; src < dst on the clique side, src = head
    * on the star side. */
  def cappedEdges(stats: DataFrame, idCol: String,
      maxBucket: Int): (DataFrame, DataFrame) = {
    val small = stats.filter(col("bsize") <= maxBucket)
    val clique = small.as("a")
      .join(small.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
    val star = stats.filter(col("bsize") > maxBucket)
      .filter(col(idCol) =!= col("head"))
      .select(col("head").as("src"), col(idCol).as("dst"))
    (clique, star)
  }
}
