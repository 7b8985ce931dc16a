package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Per-key Holt double exponential smoothing (level + linear trend):
  *
  *   l_0 = y_0, b_0 = 0
  *   l_i = α·y_i + (1−α)·(l_{i−1} + b_{i−1})
  *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
  *
  * The 2-STATE generalization of [[Ewma.perKey]]: a coupled linear
  * recurrence with no window spelling (CUSUM's reset-at-zero admits a
  * prefix-min trick, EWMA's scalar decay a power-weighted sum — a
  * coupled vector recurrence admits neither), so SURVEY's escape hatch
  * (d) applies: ONE hash exchange on the key, ONE local sort (the same
  * cost as any window over that spec), then a forward pass holding two
  * doubles of state per key run.
  *
  * Giant single keys: the recurrence is AFFINE in its carry state —
  * (l, b) ↦ M·(l, b) + c with M = [[1−α, 1−α], [−αβ, 1−β+β(1−α)]]
  * constant — and affine maps compose associatively, so the
  * [[Ewma.perKeyBlocked]] block decomposition generalizes verbatim:
  * per-block composed (M^k, Σ M^j c) summaries, a per-key carry
  * resolve over ≤ buckets summaries, one map to finish — implemented
  * as [[perKeyBlocked]], which changes the carry algebra from scalar
  * multiply to 2×2 matrix compose.
  *
  * Null values pass through with null level/trend and leave the state
  * untouched (the Ewma ignore-nulls contract).
  */
object HoltLinear {

  /** @param orderCols total per-key order (include a unique tiebreak) */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      alpha: Double, beta: Double,
      outLevel: String = "level", outTrend: String = "trend"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outLevel, DoubleType, nullable = true),
      StructField(outTrend, DoubleType, nullable = true)))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // .rdd on purpose: Catalyst's EliminateSorts would delete the
    // sortWithinPartitions under an object consumer (the Ewma lesson);
    // the RDD boundary makes the sort terminal and order-preserving.
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var stStarted = false // explicit, so NaN inputs poison, not restart
      var l = 0.0
      var b = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; stStarted = false; l = 0.0; b = 0.0
        }
        val (lv, bv) =
          if (r.isNullAt(valIdx)) (null, null)
          else {
            val y = r.getAs[Number](valIdx).doubleValue()
            if (!stStarted) { stStarted = true; l = y; b = 0.0 }
            else {
              // spelled exactly as the oracle's recursive CTE: the new
              // level expression is shared, then the trend reads it
              val lNew = alpha * y + (1 - alpha) * (l + b)
              val bNew = beta * (lNew - l) + (1 - beta) * b
              l = lNew; b = bNew
            }
            (java.lang.Double.valueOf(l), java.lang.Double.valueOf(b))
          }
        Row.fromSeq(r.toSeq :+ lv :+ bv)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }

  /** [[perKey]] for the regime where single keys are enormous — the
    * 2-STATE generalization of [[Ewma.perKeyBlocked]]. The Holt step is
    * affine in its state: s' = M·s + c(y) with
    *
    *   M = [[1−α, 1−α], [−αβ, 1−αβ]],  c(y) = (α·y, αβ·y)
    *
    * and affine maps compose associatively, so each range-bucketed
    * block folds independently, emitting per row the zero-carry fold L,
    * the block-starts-the-series fold Lf, and the cumulative matrix D =
    * ∏M; the true state is then s = L + D·carry (Lf before any carry).
    * Phase 2 resolves carries per key over ≤ `buckets` block summaries
    * (the PrefixSum bounded-driver-state contract); phase 3 is one map.
    *
    * Exactly equal to [[perKey]] up to float round-off of the algebraic
    * regrouping (the Ewma.perKeyBlocked caveat, now in 2 dimensions —
    * HoltLinearSpec pins near-equality on randomized frames). Use
    * [[perKey]] for many ordinary keys. */
  def perKeyBlocked(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      alpha: Double, beta: Double,
      outLevel: String = "level", outTrend: String = "trend",
      buckets: Int = 64, sampleTarget: Int = 20000,
      knownCount: Option[Long] = None): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    val spark = df.sparkSession

    // the constant step matrix
    val m11 = 1 - alpha; val m12 = 1 - alpha
    val m21 = -alpha * beta; val m22 = 1 - alpha * beta

    // range-bucket the leading order column (Ewma.perKeyBlocked shape)
    val ord = orderCols.head
    val n = knownCount.getOrElse(df.count())
    val mod = math.max(1L, n / math.max(1, sampleTarget))
    val h = expr(graft.queries.Shingles.h60(s"CAST($ord AS STRING)"))
    val sampled = df.filter(col(ord).isNotNull && pmod(h, lit(mod)) === 0)
      .select(col(ord)).distinct().orderBy(col(ord))
      .collect().map(_.get(0))
    val k = math.min(buckets, math.max(1, sampled.length))
    val bounds = (1 until k).map(i => sampled(i * sampled.length / k)).distinct
    val bucketCol =
      if (bounds.isEmpty) when(col(ord).isNull, lit(-1L)).otherwise(lit(0L))
      else when(col(ord).isNull, lit(-1L)).otherwise(
        bounds.map(b => (col(ord) >= lit(b)).cast("long")).reduce(_ + _))

    // phase 1: per-(key, block) local fold of (L, Lf, D)
    val tagged = df.withColumn("__hb", bucketCol)
    val tSchema = tagged.schema
    val extra = Seq("__l1", "__l2", "__lf1", "__lf2",
      "__d11", "__d12", "__d21", "__d22")
    val foldSchema = StructType(tSchema.fields ++
      extra.map(c => StructField(c, DoubleType, nullable = true)))
    val kIdx = tSchema.fieldIndex(key)
    val bIdx = tSchema.fieldIndex("__hb")
    val vIdx = tSchema.fieldIndex(valueCol)
    val clustered = tagged
      .repartition(col(key), col("__hb"))
      .sortWithinPartitions((key +: "__hb" +: orderCols).map(col): _*)
    val local = spark.createDataFrame(
      clustered.rdd.mapPartitions { rows =>
        var curKey: Any = null; var curB = Long.MinValue; var started = false
        var l1 = 0.0; var l2 = 0.0
        var lf1 = 0.0; var lf2 = 0.0; var lfStarted = false
        var d11 = 1.0; var d12 = 0.0; var d21 = 0.0; var d22 = 1.0
        rows.map { r =>
          val rk = r.get(kIdx); val rb = r.getLong(bIdx)
          if (!started || rk != curKey || rb != curB) {
            curKey = rk; curB = rb; started = true
            l1 = 0.0; l2 = 0.0; lf1 = 0.0; lf2 = 0.0; lfStarted = false
            d11 = 1.0; d12 = 0.0; d21 = 0.0; d22 = 1.0
          }
          val outVals: Seq[Any] =
            if (r.isNullAt(vIdx)) Seq(null, null, null, null, null, null, null, null)
            else {
              val y = r.getAs[Number](vIdx).doubleValue()
              val c1 = alpha * y; val c2 = alpha * beta * y
              // zero-carry fold: affine step on (l1, l2)
              val nl1 = m11 * l1 + m12 * l2 + c1
              val nl2 = m21 * l1 + m22 * l2 + c2
              l1 = nl1; l2 = nl2
              // block-starts-series fold: reset on first non-null
              if (!lfStarted) { lfStarted = true; lf1 = y; lf2 = 0.0 }
              else {
                val nf1 = m11 * lf1 + m12 * lf2 + c1
                val nf2 = m21 * lf1 + m22 * lf2 + c2
                lf1 = nf1; lf2 = nf2
              }
              // D' = M · D
              val nd11 = m11 * d11 + m12 * d21; val nd12 = m11 * d12 + m12 * d22
              val nd21 = m21 * d11 + m22 * d21; val nd22 = m21 * d12 + m22 * d22
              d11 = nd11; d12 = nd12; d21 = nd21; d22 = nd22
              Seq(l1, l2, lf1, lf2, d11, d12, d21, d22)
                .map(java.lang.Double.valueOf)
            }
          Row.fromSeq(r.toSeq ++ outVals)
        }
      }, foldSchema).localCheckpoint(true)

    // phase 2: block-end summaries → per-key sequential carry resolve
    val ordStruct = struct(orderCols.map(col): _*)
    val summaries = local
      .filter(col("__l1").isNotNull)
      .groupBy(col(key).as("hs_k"), col("__hb").as("hs_b"))
      .agg(max_by(struct(extra.map(col): _*), ordStruct).as("e"))
      .select((col("hs_k") +: col("hs_b") +:
        extra.map(c => col(s"e.$c").as(c.stripPrefix("__")))): _*)
      .collect()
    val carryRows = summaries
      .groupBy(_.get(0)).toSeq.flatMap { case (_, rs) =>
        var carry: Option[(Double, Double)] = None
        rs.sortBy(_.getLong(1)).map { r =>
          val cIn = carry
          val (el1, el2) = (r.getDouble(2), r.getDouble(3))
          val (ef1, ef2) = (r.getDouble(4), r.getDouble(5))
          val (e11, e12, e21, e22) =
            (r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9))
          val sEnd = cIn match {
            case Some((c1, c2)) =>
              (el1 + e11 * c1 + e12 * c2, el2 + e21 * c1 + e22 * c2)
            case None => (ef1, ef2)
          }
          carry = Some(sEnd)
          Row(r.get(0), r.getLong(1),
            cIn.map(c => java.lang.Double.valueOf(c._1)).orNull,
            cIn.map(c => java.lang.Double.valueOf(c._2)).orNull)
        }
      }
    val cSchema = StructType(Seq(
      StructField("hs_k", tSchema(key).dataType),
      StructField("hs_b", LongType),
      StructField("hs_c1", DoubleType, nullable = true),
      StructField("hs_c2", DoubleType, nullable = true)))
    val carries = spark.createDataFrame(
      spark.sparkContext.parallelize(carryRows, 1), cSchema)

    // phase 3: finish s = L + D·carry (Lf before any carry)
    local
      .join(broadcast(carries),
        col(key) <=> col("hs_k") && col("__hb") === col("hs_b"), "left_outer")
      .withColumn(outLevel,
        when(col("__l1").isNull, lit(null).cast("double"))
          .when(col("hs_c1").isNull, col("__lf1"))
          .otherwise(col("__l1") + col("__d11") * col("hs_c1") + col("__d12") * col("hs_c2")))
      .withColumn(outTrend,
        when(col("__l1").isNull, lit(null).cast("double"))
          .when(col("hs_c1").isNull, col("__lf2"))
          .otherwise(col("__l2") + col("__d21") * col("hs_c1") + col("__d22") * col("hs_c2")))
      .drop((Seq("__hb", "hs_k", "hs_b", "hs_c1", "hs_c2") ++ extra): _*)
  }
}
