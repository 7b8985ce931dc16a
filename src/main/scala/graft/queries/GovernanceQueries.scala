package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Parity, Tables}

/** Data-governance and release-audit operators: differentially-private
  * noisy release, k-anonymity / l-diversity audit, GDPR erasure
  * propagation, and classifier calibration (ECE / reliability).
  *
  * These are the queries a data platform runs AROUND a training corpus:
  * before sharing aggregate statistics (a62), before releasing a table
  * containing quasi-identifiers (a63), when a deletion request must
  * cascade through every derived table (o31), and when a model's
  * confidence scores gate downstream use (a64).
  *
  * Determinism discipline: all "randomness" is a seeded hash of the
  * release key (the md5-h60 spelling shared with the samplers), so the
  * noise an engine draws is a pure function of the data — reproducible
  * releases, and oracle-checkable. A production deployment would swap
  * the per-release seed for a cryptographic PRF key; the PLAN — noise
  * applied post-aggregation on the tiny group frame, never per row —
  * is unchanged.
  */
object GovernanceQueries {

  /** PAV (pool-adjacent-violators) isotonic fit over binned counts —
    * EXACT integer arithmetic throughout: blocks merge while the
    * previous block's rate exceeds the next's, compared by
    * cross-multiplication (pos_a·n_b > pos_b·n_a — no float ever), and
    * each block's calibrated rate stays the exact rational
    * (pooled pos, pooled n). Returns the full step function over bins
    * 0..nBins−1 (empty calibration bins inherit the covering block —
    * carry-forward, bins before the first observation take the first
    * block). Driver state is ≤ nBins rows — the bounded-model-state
    * class, like Ridge's coefficients. */
  private[queries] def pavFit(
      binned: Seq[(Int, Long, Long)], nBins: Int): IndexedSeq[(Long, Long)] = {
    final case class Block(lo: Int, pos: Long, n: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    for ((bin, n, pos) <- binned.sortBy(_._1) if n > 0) {
      var b = Block(bin, pos, n)
      while (stack.nonEmpty &&
          stack.last.pos * b.n > b.pos * stack.last.n) {
        val t = stack.remove(stack.length - 1)
        b = Block(t.lo, t.pos + b.pos, t.n + b.n)
      }
      stack += b
    }
    require(stack.nonEmpty, "isotonic fit needs at least one non-empty bin")
    val out = Array.fill[(Long, Long)](nBins)(null)
    var bi = 0
    for (i <- 0 until nBins) {
      if (bi + 1 < stack.length && i >= stack(bi + 1).lo) bi += 1
      out(i) = (stack(bi).pos, stack(bi).n)
    }
    out.toIndexedSeq
  }

  /** Shared spellings for pipe_isotonic_calibration: the quantized
    * confidence, the 20-way bin, the calibration/eval split. */
  private def isoScoredSql: String =
    """scored AS (
      |  SELECT CAST(floor((1.0 / (1.0 + exp(-(o_totalprice / 100000.0 - 1.5))))
      |      * 10000 + 0.5) AS BIGINT) AS pq,
      |    CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y,
      |    o_orderkey % 2 AS split
      |  FROM orders
      |)""".stripMargin

  private def isoFit(s: org.apache.spark.sql.SparkSession, d: String)
      : IndexedSeq[(Long, Long)] = {
    import org.apache.spark.sql.functions._
    val praw = lit(1.0) / (lit(1.0) + exp(lit(0.0) - (col("o_totalprice") / 100000.0 - 1.5)))
    val cal = Tables.orders(s, d)
      .withColumn("pq", floor(praw * 10000 + 0.5).cast("long"))
      .filter(pmod(col("o_orderkey"), lit(2L)) === 0)
      .withColumn("bin", least(floor(col("pq") / 500.0), lit(19.0)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("pos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    pavFit(cal, 20)
  }

  def all: Seq[OracleQuery] = Seq(

    // Isotonic (PAV) calibration — a64 MEASURES miscalibration; this
    // FIXES it: fit a monotone step function on the calibration split
    // (even order keys), apply it to the eval split (odd keys), and
    // report per-bin calibrated-vs-empirical rates plus pre/post ECE.
    // The fit is driver state (≤20 binned counts — the Ridge-
    // coefficient class) computed in EXACT integer arithmetic
    // (cross-multiplied rate comparisons, rational pooled rates); the
    // application is one broadcastable literal map. Post-ECE rides the
    // same integer-exact recipe as a64: per bin the gap is
    // |pp·n_e − pos_e·pn| exactly, scaled once at display. The oracle
    // embeds the fitted (pp, pn) table as literals (the BPE-merge
    // oracleGen pattern: learned state is deterministic for a given
    // corpus) and replays the application + both ECEs in DuckDB.
    OracleQuery(
      "pipe_isotonic_calibration",
      (s, d) => {
        import s.implicits._
        val fit = isoFit(s, d)
        val ppArr = array(fit.map(t => lit(t._1)): _*)
        val pnArr = array(fit.map(t => lit(t._2)): _*)
        val praw = lit(1.0) / (lit(1.0) + exp(lit(0.0) - ($"o_totalprice" / 100000.0 - 1.5)))
        val ev = Tables.orders(s, d)
          .withColumn("pq", floor(praw * 10000 + 0.5).cast("long"))
          .filter(pmod($"o_orderkey", lit(2L)) === 1)
          .withColumn("bin", least(floor($"pq" / 500.0), lit(19.0)).cast("long"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"pq").as("sum_pq"),
            sum(($"o_orderpriority" === "1-URGENT").cast("long")).as("pos"))
          .withColumn("pp", element_at(ppArr, ($"bin" + 1).cast("int")))
          .withColumn("pn", element_at(pnArr, ($"bin" + 1).cast("int")))
          // post-calibration gap: n_e·|p̂−emp|·1e6 as an exact-derived
          // long (one double division by the literal pn, then floor)
          .withColumn("gap_post_q",
            floor(abs($"pp" * $"n" - $"pos" * $"pn").cast("double")
              / $"pn" * 1000000.0 + 0.5).cast("long"))
          .withColumn("gap_pre_q", abs($"sum_pq" - lit(10000L) * $"pos"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        ev
          .withColumn("n_all", sum($"n").over(w))
          .withColumn("ece_pre", Parity.floorRound4(
            sum($"gap_pre_q").over(w).cast("double") / 10000.0 / $"n_all"))
          .withColumn("ece_post", Parity.floorRound4(
            sum($"gap_post_q").over(w).cast("double") / 1000000.0 / $"n_all"))
          .select(
            $"bin", $"n",
            Parity.floorRound4($"pp".cast("double") / $"pn").as("cal_p"),
            Parity.floorRound4($"pos".cast("double") / $"n").as("emp_rate"),
            $"ece_pre", $"ece_post")
          .orderBy($"bin")
      },
      None,
      oracleGen = Some { (s, d) =>
        val fit = isoFit(s, d)
        val mapRows = fit.zipWithIndex
          .map { case ((pp, pn), i) => s"($i, $pp, $pn)" }.mkString(", ")
        s"""WITH $isoScoredSql, ev AS (
           |  SELECT CAST(least(floor(pq / 500.0), 19.0) AS BIGINT) AS bin,
           |    count(*) AS n, sum(pq) AS sum_pq, sum(y) AS pos
           |  FROM scored WHERE split = 1 GROUP BY 1
           |), m AS (
           |  SELECT * FROM (VALUES $mapRows) AS t(bin, pp, pn)
           |), j AS (
           |  SELECT e.bin, e.n, e.sum_pq, e.pos, m.pp, m.pn,
           |    CAST(floor(CAST(abs(m.pp * e.n - e.pos * m.pn) AS DOUBLE)
           |      / m.pn * 1000000.0 + 0.5) AS BIGINT) AS gap_post_q,
           |    abs(e.sum_pq - 10000 * e.pos) AS gap_pre_q
           |  FROM ev e JOIN m ON m.bin = e.bin
           |), g AS (
           |  SELECT *, sum(n) OVER () AS n_all,
           |    sum(gap_pre_q) OVER () AS pre_all,
           |    sum(gap_post_q) OVER () AS post_all
           |  FROM j
           |)
           |SELECT bin, n,
           |  floor((CAST(pp AS DOUBLE) / pn) * 10000 + 0.5) / 10000 AS cal_p,
           |  floor((CAST(pos AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS emp_rate,
           |  floor((CAST(pre_all AS DOUBLE) / 10000.0 / n_all) * 10000 + 0.5) / 10000 AS ece_pre,
           |  floor((CAST(post_all AS DOUBLE) / 1000000.0 / n_all) * 10000 + 0.5) / 10000 AS ece_post
           |FROM g ORDER BY bin""".stripMargin
      }
    ),


    // ε-differentially-private noisy counts + clipped noisy sums per
    // market segment (the "release aggregate stats about the corpus"
    // op). Two-sided geometric (discrete-Laplace) noise via inverse
    // CDF on a seeded uniform: u = h60(seed|key)%2^20 / 2^20, magnitude
    // m = floor(-ln(1-u)/ε′). Count query: sensitivity 1, ε=0.5 →
    // scale 2. Sum query: contributions CLIPPED to [0, 10000] dollars
    // (clipping is what bounds sensitivity — without it a single
    // outlier row makes the release non-private), Δ=10000, ε=0.5 →
    // noise drawn in integer CENTS (scale 2e6) so the noisy sum stays
    // exact-integer until the final display division.
    //
    // Scale shape: ONE hash aggregate over the fact (count + one
    // quantized-cents long sum); noise is a map-side expression on the
    // 5-row group frame. The sums use the quantized-long recipe so
    // parallel summation order cannot move a cent. At 100 TB nothing
    // changes: the group frame is |segments| rows regardless of input
    // size. ln() is libm-rounded on both engines (≤1 ulp); a flip of
    // floor at an exact integer boundary is the accepted measure-zero
    // class (same acceptance as a50/a55's quantized statistics).
    OracleQuery(
      "a62_dp_noisy_release",
      (s, d) => {
        import s.implicits._
        val cents = floor(least(greatest($"c_acctbal", lit(0.0)), lit(10000.0)) * 100 + 0.5)
          .cast("long")
        val h1 = expr(Shingles.h60("concat('dpn|', c_mktsegment)"))
        val h2 = expr(Shingles.h60("concat('dps|', c_mktsegment)"))
        Tables.customer(s, d)
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), sum(cents).as("s_cents"))
          .withColumn("u1", (pmod(h1, lit(1048576L))).cast("double") / 1048576.0)
          .withColumn("sg1", when(pmod(h1, lit(2L)) === 0, lit(-1L)).otherwise(lit(1L)))
          .withColumn("u2", (pmod(h2, lit(1048576L))).cast("double") / 1048576.0)
          .withColumn("sg2", when(pmod(h2, lit(2L)) === 0, lit(-1L)).otherwise(lit(1L)))
          // ε=0.5: scale 1/ε = 2 for counts; Δ/ε = 2e4 dollars = 2e6 cents
          .withColumn("noisy_n",
            $"n" + $"sg1" * floor(lit(-2.0) * log(lit(1.0) - $"u1")).cast("long"))
          .withColumn("noisy_cents",
            $"s_cents" + $"sg2" * floor(lit(-2000000.0) * log(lit(1.0) - $"u2")).cast("long"))
          .select(
            $"c_mktsegment",
            $"noisy_n",
            Parity.floorRound4($"noisy_cents".cast("double") / 100.0).as("noisy_sum"),
            lit(0.5).as("eps"))
          .orderBy($"c_mktsegment")
      },
      Some("""WITH g AS (
             |  SELECT c_mktsegment, count(*) AS n,
             |    sum(CAST(floor(least(greatest(c_acctbal, 0.0), 10000.0) * 100 + 0.5)
             |      AS BIGINT)) AS s_cents,
             |    ('0x' || substr(md5('dpn|' || c_mktsegment), 1, 15))::BIGINT AS h1,
             |    ('0x' || substr(md5('dps|' || c_mktsegment), 1, 15))::BIGINT AS h2
             |  FROM customer GROUP BY 1
             |), z AS (
             |  SELECT c_mktsegment, n, s_cents,
             |    (h1 % 1048576) / 1048576.0 AS u1,
             |    CASE WHEN h1 % 2 = 0 THEN -1 ELSE 1 END AS sg1,
             |    (h2 % 1048576) / 1048576.0 AS u2,
             |    CASE WHEN h2 % 2 = 0 THEN -1 ELSE 1 END AS sg2
             |  FROM g
             |)
             |SELECT c_mktsegment,
             |  n + sg1 * CAST(floor(-2.0 * ln(1.0 - u1)) AS BIGINT) AS noisy_n,
             |  floor((CAST(s_cents + sg2 * CAST(floor(-2000000.0 * ln(1.0 - u2)) AS BIGINT)
             |    AS DOUBLE) / 100.0) * 10000 + 0.5) / 10000 AS noisy_sum,
             |  0.5 AS eps
             |FROM z ORDER BY c_mktsegment""".stripMargin)
    ),

    // k-anonymity / l-diversity audit over the quasi-identifier tuple
    // (nation, market segment, account-balance band): for every QI
    // equivalence class, its size n (k-anonymity: every class must
    // reach k — a class of 1 re-identifies its member), and the number
    // of DISTINCT sensitive values inside it (l-diversity: a class
    // where everyone shares the sensitive value leaks it even at
    // n ≥ k; sensitive here = "account in debt"). The release decision
    // is the flag pair, not a mutation — suppression/generalization is
    // a filter on top of exactly this frame.
    //
    // Scale shape: one hash aggregate on the QI tuple; distinct-count
    // of a 2-value sensitive column is a partial-aggregatable
    // count(distinct) with a 2-row-per-class cap. The class frame is
    // |nations|×|segments|×|bands| regardless of table size.
    OracleQuery(
      "a63_k_anonymity",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .withColumn("bal_band", floor($"c_acctbal" / 2000.0).cast("long"))
          .withColumn("in_debt", ($"c_acctbal" < 0).cast("int"))
          .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
          .agg(
            count(lit(1)).as("n"),
            countDistinct($"in_debt").cast("long").as("l_div"))
          .withColumn("k_anon_5", ($"n" >= 5).cast("int"))
          .withColumn("l_div_2", ($"l_div" >= 2).cast("int"))
          .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      },
      Some("""SELECT c_nationkey,
             |  c_mktsegment,
             |  CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
             |  count(*) AS n,
             |  CAST(count(DISTINCT CAST(c_acctbal < 0 AS INT)) AS BIGINT) AS l_div,
             |  CAST(count(*) >= 5 AS INT) AS k_anon_5,
             |  CAST(count(DISTINCT CAST(c_acctbal < 0 AS INT)) >= 2 AS INT) AS l_div_2
             |FROM customer
             |GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin)
    ),

    // GDPR/CCPA erasure propagation: a deletion-request set (seeded
    // hash sample of customers, ~1/29) cascades customer → orders →
    // lineitem, and the audit row per table reports total / purged /
    // kept plus the POST-DELETE orphan count (kept children whose
    // parent was erased — the referential-integrity proof an auditor
    // asks for; > 0 means the cascade missed rows).
    //
    // Scale shape: the tombstone set is a FILTER of the customer scan
    // (never a collected list); each cascade level is a semi/anti join
    // on the child's parent key — Spark picks broadcast while the
    // request set is small and falls back to a shuffle hash join when
    // it isn't, and the j18 runtime-bloom machinery applies verbatim
    // when the purge fraction is tiny. Counts are single-row
    // aggregates unioned into the 3-row audit frame.
    OracleQuery(
      "o31_erasure_cascade",
      (s, d) => {
        import s.implicits._
        val tomb = Tables.customer(s, d)
          .filter(pmod(expr(Shingles.h60("CAST(c_custkey AS STRING)")), lit(29L)) === 0)
          .select($"c_custkey")
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)

        val ordPurged = ord.join(tomb, $"o_custkey" === $"c_custkey", "left_semi")
        val ordKept = ord.join(tomb, $"o_custkey" === $"c_custkey", "left_anti")
        val purgedKeys = ordPurged.select($"o_orderkey".as("pk_orderkey"))
        val liPurged = li.join(purgedKeys, $"l_orderkey" === $"pk_orderkey", "left_semi")
        val liKept = li.join(purgedKeys, $"l_orderkey" === $"pk_orderkey", "left_anti")

        val custRow = cust.agg(count(lit(1)).as("n_total")).crossJoin(
            tomb.agg(count(lit(1)).as("n_purged")))
          .select(lit("customer").as("tbl"), $"n_total", $"n_purged",
            ($"n_total" - $"n_purged").as("n_kept"), lit(0L).as("n_orphans"))
        val ordRow = ord.agg(count(lit(1)).as("n_total"))
          .crossJoin(ordPurged.agg(count(lit(1)).as("n_purged")))
          .crossJoin(ordKept.join(tomb, $"o_custkey" === $"c_custkey", "left_semi")
            .agg(count(lit(1)).as("n_orphans")))
          .select(lit("orders").as("tbl"), $"n_total", $"n_purged",
            ($"n_total" - $"n_purged").as("n_kept"), $"n_orphans")
        val liRow = li.agg(count(lit(1)).as("n_total"))
          .crossJoin(liPurged.agg(count(lit(1)).as("n_purged")))
          .crossJoin(liKept.join(purgedKeys, $"l_orderkey" === $"pk_orderkey", "left_semi")
            .agg(count(lit(1)).as("n_orphans")))
          .select(lit("lineitem").as("tbl"), $"n_total", $"n_purged",
            ($"n_total" - $"n_purged").as("n_kept"), $"n_orphans")

        custRow.unionByName(ordRow).unionByName(liRow).orderBy($"tbl")
      },
      Some("""WITH tomb AS (
             |  SELECT c_custkey FROM customer
             |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 29 = 0
             |), op AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  WHERE o_custkey IN (SELECT c_custkey FROM tomb)
             |), ok AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  WHERE o_custkey NOT IN (SELECT c_custkey FROM tomb)
             |), lp AS (
             |  SELECT l_orderkey FROM lineitem
             |  WHERE l_orderkey IN (SELECT o_orderkey FROM op)
             |), lk AS (
             |  SELECT l_orderkey FROM lineitem
             |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM op)
             |)
             |SELECT * FROM (
             |  SELECT 'customer' AS tbl,
             |    (SELECT count(*) FROM customer) AS n_total,
             |    (SELECT count(*) FROM tomb) AS n_purged,
             |    (SELECT count(*) FROM customer) - (SELECT count(*) FROM tomb) AS n_kept,
             |    CAST(0 AS BIGINT) AS n_orphans
             |  UNION ALL
             |  SELECT 'orders',
             |    (SELECT count(*) FROM orders),
             |    (SELECT count(*) FROM op),
             |    (SELECT count(*) FROM orders) - (SELECT count(*) FROM op),
             |    (SELECT count(*) FROM ok
             |     WHERE o_custkey IN (SELECT c_custkey FROM tomb))
             |  UNION ALL
             |  SELECT 'lineitem',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(*) FROM lp),
             |    (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM lp),
             |    (SELECT count(*) FROM lk
             |     WHERE l_orderkey IN (SELECT o_orderkey FROM op))
             |) ORDER BY tbl""".stripMargin)
    ),

    // Expected Calibration Error + reliability diagram for a scored
    // binary predictor (here: P(order is URGENT) from a logistic link
    // on total price — the stand-in for any model whose confidences
    // gate downstream use). Confidence is quantized to a 1e-4 grid
    // IMMEDIATELY (killing cross-engine exp() ulp), so every later
    // number — bin id, per-bin confidence mass, ECE — is EXACT integer
    // arithmetic: per bin we carry Σpq (quantized confidence, long)
    // and Σy (positives, long); the bin's calibration gap is
    // |Σpq − 10000·Σy| exactly, and ECE = Σ_bins |Σpq − 10000·Σy| /
    // (10000·N) — one division at display time, no float accumulation
    // anywhere. The same trick makes the reliability columns
    // (avg confidence, empirical accuracy) bit-deterministic.
    //
    // Scale shape: one hash aggregate on the 10-way bin key; the ECE
    // fold runs on the 10-row frame (a window over bins, zero cost).
    OracleQuery(
      "a64_ece_reliability",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val praw = lit(1.0) / (lit(1.0) + exp(lit(0.0) - ($"o_totalprice" / 100000.0 - 1.5)))
        val binned = Tables.orders(s, d)
          .withColumn("pq", floor(praw * 10000 + 0.5).cast("long"))
          .withColumn("bin", least(floor($"pq" / 1000.0), lit(9.0)).cast("long"))
          .withColumn("y", ($"o_orderpriority" === "1-URGENT").cast("long"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"pq").as("sum_pq"), sum($"y").as("pos"))
        val w = Window.partitionBy()
        binned
          .withColumn("gap_q", abs($"sum_pq" - lit(10000L) * $"pos"))
          .withColumn("n_all", sum($"n").over(w))
          .withColumn("ece", Parity.floorRound4(
            sum($"gap_q").over(w).cast("double") / 10000.0 / $"n_all"))
          .select(
            $"bin", $"n",
            Parity.floorRound4($"sum_pq".cast("double") / 10000.0 / $"n").as("conf"),
            Parity.floorRound4($"pos".cast("double") / $"n").as("acc"),
            Parity.floorRound4($"gap_q".cast("double") / 10000.0 / $"n").as("gap"),
            $"ece")
          .orderBy($"bin")
      },
      Some("""WITH scored AS (
             |  SELECT CAST(floor((1.0 / (1.0 + exp(-(o_totalprice / 100000.0 - 1.5))))
             |      * 10000 + 0.5) AS BIGINT) AS pq,
             |    CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y
             |  FROM orders
             |), b AS (
             |  SELECT CAST(least(floor(pq / 1000.0), 9.0) AS BIGINT) AS bin,
             |    count(*) AS n, sum(pq) AS sum_pq, sum(y) AS pos
             |  FROM scored GROUP BY 1
             |), g AS (
             |  SELECT bin, n, sum_pq, pos, abs(sum_pq - 10000 * pos) AS gap_q,
             |    sum(n) OVER () AS n_all, sum(abs(sum_pq - 10000 * pos)) OVER () AS gq_all
             |  FROM b
             |)
             |SELECT bin, n,
             |  floor((CAST(sum_pq AS DOUBLE) / 10000.0 / n) * 10000 + 0.5) / 10000 AS conf,
             |  floor((CAST(pos AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS acc,
             |  floor((CAST(gap_q AS DOUBLE) / 10000.0 / n) * 10000 + 0.5) / 10000 AS gap,
             |  floor((CAST(gq_all AS DOUBLE) / 10000.0 / n_all) * 10000 + 0.5) / 10000 AS ece
             |FROM g ORDER BY bin""".stripMargin)
    ),

    // Murphy (1973) BRIER-SCORE DECOMPOSITION — the diagnosis behind
    // a64's ECE number: reliability (how miscalibrated), resolution
    // (how much the forecast actually separates outcomes — a perfectly
    // calibrated but useless predictor has zero), uncertainty (the
    // base-rate floor no model can beat), plus the EXPLICIT within-bin
    // term that makes the identity exact (BS = UNC + REL − RES +
    // WITHIN holds only when forecasts are constant inside bins; real
    // forecasts aren't, and silently pretending the 3-term identity
    // closes is the textbook misuse). Same a64 machinery: confidence
    // quantized to the 1e-4 grid immediately, one hash aggregate to
    // the 10-bin frame carrying exact longs (n, Σpq, Σpq², Σy, Σpq·y),
    // every metric then assembled from those integers in identically
    // spelled double arithmetic over 10 rows — bit-deterministic, no
    // float accumulation at row grain anywhere.
    OracleQuery(
      "a68_brier_decomposition",
      (s, d) => {
        import s.implicits._
        val praw = lit(1.0) / (lit(1.0) + exp(lit(0.0) - ($"o_totalprice" / 100000.0 - 1.5)))
        val bins = Tables.orders(s, d)
          .withColumn("pq", floor(praw * 10000 + 0.5).cast("long"))
          .withColumn("bin", least(floor($"pq" / 1000.0), lit(9.0)).cast("long"))
          .withColumn("y", ($"o_orderpriority" === "1-URGENT").cast("long"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"pq").as("spq"),
            sum($"pq" * $"pq").as("spq2"), sum($"y").as("sy"),
            sum($"pq" * $"y").as("spqy"))
        // 10-row fold: every Σ below is over bins; casts to double are
        // exact (all longs < 2^53) and the expressions are spelled
        // verbatim in the oracle, so the doubles agree bitwise
        bins.agg(
            sum($"n").as("nn"), sum($"sy").as("syall"),
            sum($"spq2" - lit(20000L) * $"spqy" + lit(100000000L) * $"sy")
              .cast("double").as("bsq"),
            sum(($"spq" - lit(10000L) * $"sy").cast("double")
              * ($"spq" - lit(10000L) * $"sy").cast("double") / $"n").as("relq"),
            sum($"sy".cast("double") * $"sy" / $"n").as("resq0"))
          .select(
            $"nn".cast("long").as("n"),
            graft.core.Parity.floorRound4(
              $"bsq" / 100000000.0 / $"nn").as("brier"),
            graft.core.Parity.floorRound4(
              $"relq" / 100000000.0 / $"nn").as("reliability"),
            // Σ n_k(ō_k − ō)² = Σ sy_k²/n_k − syall²/N (the moment identity)
            graft.core.Parity.floorRound4(
              ($"resq0" - $"syall".cast("double") * $"syall" / $"nn") / $"nn")
              .as("resolution"),
            graft.core.Parity.floorRound4(
              $"syall".cast("double") * ($"nn" - $"syall") / $"nn" / $"nn")
              .as("uncertainty"),
            graft.core.Parity.floorRound4(
              $"bsq" / 100000000.0 / $"nn"
                - $"relq" / 100000000.0 / $"nn"
                + ($"resq0" - $"syall".cast("double") * $"syall" / $"nn") / $"nn"
                - $"syall".cast("double") * ($"nn" - $"syall") / $"nn" / $"nn")
              .as("within_bin"))
      },
      Some("""WITH scored AS (
             |  SELECT CAST(floor((1.0 / (1.0 + exp(-(o_totalprice / 100000.0 - 1.5))))
             |      * 10000 + 0.5) AS BIGINT) AS pq,
             |    CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y
             |  FROM orders
             |), b AS (
             |  SELECT CAST(least(floor(pq / 1000.0), 9.0) AS BIGINT) AS bin,
             |    count(*) AS n, sum(pq) AS spq, sum(pq * pq) AS spq2,
             |    sum(y) AS sy, sum(pq * y) AS spqy
             |  FROM scored GROUP BY 1
             |), f AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS syall,
             |    CAST(sum(spq2 - 20000 * spqy + 100000000 * sy) AS DOUBLE) AS bsq,
             |    sum(CAST(spq - 10000 * sy AS DOUBLE)
             |      * CAST(spq - 10000 * sy AS DOUBLE) / n) AS relq,
             |    sum(CAST(sy AS DOUBLE) * sy / n) AS resq0
             |  FROM b
             |)
             |SELECT nn AS n,
             |  floor(bsq / 100000000.0 / nn * 10000 + 0.5) / 10000 AS brier,
             |  floor(relq / 100000000.0 / nn * 10000 + 0.5) / 10000 AS reliability,
             |  floor((resq0 - CAST(syall AS DOUBLE) * syall / nn) / nn
             |    * 10000 + 0.5) / 10000 AS resolution,
             |  floor(CAST(syall AS DOUBLE) * (nn - syall) / nn / nn
             |    * 10000 + 0.5) / 10000 AS uncertainty,
             |  floor((bsq / 100000000.0 / nn
             |      - relq / 100000000.0 / nn
             |      + (resq0 - CAST(syall AS DOUBLE) * syall / nn) / nn
             |      - CAST(syall AS DOUBLE) * (nn - syall) / nn / nn)
             |    * 10000 + 0.5) / 10000 AS within_bin
             |FROM f""".stripMargin)
    )
  )
}
