package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance self-join via prefix filtering — the canonical
  * SSJoin/ED-Join candidate generation (see `dedup_editdist_fuzzy` for
  * the oracle-pinned query spelling; EditDistJoinSpec property-tests
  * this op against the brute-force join on random strings).
  *
  * Soundness chain for q-gram length q: multiset grams become instance
  * SETS by occurrence tagging; ed(a,b) ≤ k ⇒ instance overlap
  * ≥ max(|a|,|b|)−q+1−q·k; the prefix theorem over one rarest-first
  * global order (df, gram, j) says matching pairs must share one of
  * their q·k+1 rarest instances. Each string therefore contributes only
  * q·k+1 rows to the candidate join — corpus-hot grams never fan out —
  * and one levenshtein verifies each candidate (candidates ⊇ true
  * pairs, so the filter can only over-generate, never drop).
  *
  * Contract: strings shorter than q·k+q chars (τ ≤ 0) are excluded —
  * route them through an all-pairs short bucket, whose domain (strings
  * under 6 chars for q=2, k=2) is bounded by definition.
  */
object EditDistJoin {

  /** Pairs (name_a < name_b, dist ≤ k) among distinct values of
    * `strCol` with length ≥ q·k+q. */
  def selfJoin(df: DataFrame, strCol: String, k: Int, q: Int = 2): DataFrame = {
    require(k >= 1 && q >= 2)
    val names = df.select(col(strCol).as("s")).distinct()
      .withColumn("len", length(col("s")))
      .filter(col("len") >= q * k + q)
    val inst = names
      .select(col("s"), col("len"), explode(expr(
        s"transform(sequence(1, len - $q + 1), i -> substring(s, i, $q))")).as("gram"))
      .groupBy(col("s"), col("len"), col("gram")).agg(count(lit(1)).as("cnt"))
      .select(col("s"), col("len"), col("gram"),
        explode(expr("sequence(1, cnt)")).as("j"))
    val gramDf = inst.groupBy(col("gram"), col("j")).agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("s")).orderBy(col("df"), col("gram"), col("j"))
    val prefix = inst.join(gramDf, Seq("gram", "j"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= q * k + 1)
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.j") === col("b.j") &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= k)
  }
}
