package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Per-key exponentially-weighted moving average — the recursive
  * smoother (pandas `ewm(alpha).mean()` with `adjust=false`):
  *
  *   y_0 = x_0;  y_i = α·x_i + (1−α)·y_{i−1}
  *
  * A linear recurrence has no native DataFrame spelling: a window sum
  * can't weight by distance, and unrolling to lag() terms explodes
  * codegen. This is the one shape where SURVEY's escape hatch (d) —
  * `mapPartitions` over key-clustered, locally-sorted partitions — is
  * the genuinely right plan: ONE hash exchange on the key, ONE local
  * sort (exactly what a window over the same spec would cost), then a
  * single forward pass holding one double of state per key run. No
  * driver involvement, no state beyond the current accumulator, keys
  * never split across partitions — at 100 TB this is a shuffle + linear
  * scan, the same cost as any per-key window aggregate.
  *
  * Null values pass through as null EWMA and leave the accumulator
  * untouched (pandas ignore-nulls semantics).
  */
object Ewma {

  /** @param orderCols total per-key order (include a unique tiebreak)
    * @param out       appended double column with the running EWMA
    */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, out: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // The fold crosses an RDD boundary ON PURPOSE: Catalyst's
    // EliminateSorts treats an object consumer (Dataset.mapPartitions)
    // as order-agnostic and deletes the sortWithinPartitions right out
    // from under it — silently wrong results on any unsorted input.
    // Taking .rdd makes the sort the terminal operator of its plan, so
    // it cannot be eliminated, and RDD mapPartitions preserves the
    // partition-local order the fold depends on. EwmaSpec pins this
    // with adversarially shuffled input.
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      // started-ness is an explicit flag, NOT a NaN sentinel: a genuine
      // NaN input must set acc=NaN and poison the rest of the series
      // (α·x + (1−α)·NaN = NaN), never restart it
      var accStarted = false
      var acc = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) { curKey = k; started = true; accStarted = false; acc = 0.0 }
        val vs = if (r.isNullAt(valIdx)) null
        else {
          val x = r.getAs[Number](valIdx).doubleValue()
          acc = if (!accStarted) { accStarted = true; x } else alpha * x + (1 - alpha) * acc
          java.lang.Double.valueOf(acc)
        }
        Row.fromSeq(r.toSeq :+ vs)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }

  /** [[perKey]] for the regime where single keys are enormous (few
    * giant sensor/entity series): [[perKey]] clusters each key into ONE
    * partition, so a 10-billion-row key serializes through one task.
    * This spelling block-decomposes the recurrence instead — EWMA is
    * affine in its carry, `y_i = l_i + d_i·c`, where `l_i` is the fold
    * from zero carry and `d_i = (1−α)^(#non-null so far)` the carry
    * multiplier, both computable locally per block:
    *
    *  1. rows bucket by range of the leading order column (hash-sampled
    *     boundaries, PrefixSum-style) → (key, bucket) partitions fold in
    *     parallel, emitting per-row `l`, `lFirst` (variant where the
    *     block starts the series: leading non-null kept as-is) and `d`;
    *  2. per-(key, bucket) END summaries — a tiny |keys|×buckets table,
    *     the same driver-state class as PrefixSum's histogram — resolve
    *     each block's incoming carry by a sequential driver fold over ≤
    *     `buckets` summaries per key;
    *  3. carries broadcast-join back and one map finishes
    *     `y = l + d·carry` (or `lFirst` for blocks before any carry).
    *
    * Exactly equal to [[perKey]] (EwmaSpec pins equality on randomized
    * frames) up to float round-off of the algebraic regrouping — the
    * carry distributes over the fold instead of threading through it,
    * so ulp-level drift is possible; boundaries affect parallelism, not
    * semantics. Use [[perKey]] for many ordinary keys. */
  def perKeyBlocked(
      df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, out: String = "ewma",
      buckets: Int = 64, sampleTarget: Int = 20000,
      knownCount: Option[Long] = None): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    val spark = df.sparkSession

    // range-bucket the leading order column (monotone bucket id: ties
    // share a bucket, nulls take -1 and sort first, matching the plain
    // sort's nulls-first order)
    val ord = orderCols.head
    // the count only picks the sampling modulus — callers that already
    // know the size skip the extra pass (PrefixSum.globalIndex pattern)
    val n = knownCount.getOrElse(df.count())
    val mod = math.max(1L, n / math.max(1, sampleTarget))
    val h = expr(graft.queries.Shingles.h60(s"CAST($ord AS STRING)"))
    val sampled = df.filter(col(ord).isNotNull && pmod(h, lit(mod)) === 0)
      .select(col(ord)).distinct().orderBy(col(ord))
      .collect().map(_.get(0))
    val k = math.min(buckets, math.max(1, sampled.length))
    val bounds = (1 until k).map(i => sampled(i * sampled.length / k)).distinct
    val bucketCol: Column =
      if (bounds.isEmpty) when(col(ord).isNull, lit(-1L)).otherwise(lit(0L))
      else when(col(ord).isNull, lit(-1L)).otherwise(
        bounds.map(b => (col(ord) >= lit(b)).cast("long")).reduce(_ + _))

    // phase 1: local fold per (key, bucket) — l (fold from carry 0),
    // lFirst (fold where the block's leading non-null starts the
    // series), d (carry multiplier)
    val tagged = df.withColumn("__eb", bucketCol)
    val tSchema = tagged.schema
    val foldSchema = StructType(tSchema.fields ++ Seq(
      StructField("__l", DoubleType, nullable = true),
      StructField("__lf", DoubleType, nullable = true),
      StructField("__d", DoubleType, nullable = false)))
    val kIdx = tSchema.fieldIndex(key)
    val bIdx = tSchema.fieldIndex("__eb")
    val vIdx = tSchema.fieldIndex(valueCol)
    val clustered = tagged
      .repartition(col(key), col("__eb"))
      .sortWithinPartitions((key +: "__eb" +: orderCols).map(col): _*)
    // localCheckpoint (eager) pins the expensive repartition+sort+fold
    // lineage: phase 2's summaries collect and phase 3's join both read
    // it, and without the pin the whole fold would execute twice (the
    // DedupDocs lesson); blocks are freed by the ContextCleaner when
    // the returned frame is dropped
    val local = spark.createDataFrame(
      clustered.rdd.mapPartitions { rows =>
        var curKey: Any = null; var curB = Long.MinValue; var started = false
        // explicit started-ness for lf, like perKey's accStarted: a NaN
        // input must poison the block fold, not restart it
        var l = 0.0; var lf = 0.0; var lfStarted = false; var d = 1.0
        rows.map { r =>
          val rk = r.get(kIdx); val rb = r.getLong(bIdx)
          if (!started || rk != curKey || rb != curB) {
            curKey = rk; curB = rb; started = true; l = 0.0; lf = 0.0; lfStarted = false; d = 1.0
          }
          var lo: java.lang.Double = null
          var lfo: java.lang.Double = null
          if (!r.isNullAt(vIdx)) { // nulls emit null and leave state untouched
            val x = r.getAs[Number](vIdx).doubleValue()
            l = alpha * x + (1 - alpha) * l
            lf = if (!lfStarted) { lfStarted = true; x } else alpha * x + (1 - alpha) * lf
            d = (1 - alpha) * d
            lo = java.lang.Double.valueOf(l)
            lfo = java.lang.Double.valueOf(lf)
          }
          Row.fromSeq(r.toSeq ++ Seq(lo, lfo, java.lang.Double.valueOf(d)))
        }
      }, foldSchema).localCheckpoint(true)

    // phase 2: block-end summaries → per-key sequential carry resolution
    // (≤ buckets steps per key, |keys|×buckets driver rows — the same
    // bounded-driver-state contract as PrefixSum's offset histogram)
    val ordStruct = struct(orderCols.map(col): _*)
    val summaries = local
      .filter(col("__l").isNotNull)
      .groupBy(col(key).as("es_k"), col("__eb").as("es_b"))
      .agg(
        max_by(struct(col("__l"), col("__lf"), col("__d")), ordStruct).as("end"))
      .select(col("es_k"), col("es_b"),
        col("end.__l").as("el"), col("end.__lf").as("elf"), col("end.__d").as("ed"))
      .collect()
    val carryRows = summaries
      .groupBy(_.get(0)).toSeq.flatMap { case (_, rs) =>
        var carry: Option[Double] = None
        rs.sortBy(_.getLong(1)).map { r =>
          val cIn = carry
          val yEnd = carry match {
            case Some(c) => r.getDouble(2) + r.getDouble(4) * c
            case None => r.getDouble(3)
          }
          carry = Some(yEnd)
          Row(r.get(0), r.getLong(1),
            cIn.map(java.lang.Double.valueOf).orNull)
        }
      }
    val cSchema = StructType(Seq(
      StructField("es_k", tSchema(key).dataType),
      StructField("es_b", LongType),
      StructField("es_c", DoubleType, nullable = true)))
    val carries = spark.createDataFrame(
      spark.sparkContext.parallelize(carryRows, 1), cSchema)

    // phase 3: finish y = l + d·carry (lFirst when no carry yet)
    local
      .join(broadcast(carries),
        col(key) <=> col("es_k") && col("__eb") === col("es_b"), "left_outer")
      .withColumn(out,
        when(col("__l").isNull, lit(null).cast("double"))
          .when(col("es_c").isNull, col("__lf"))
          .otherwise(col("__l") + col("__d") * col("es_c")))
      .drop("__eb", "__l", "__lf", "__d", "es_k", "es_b", "es_c")
  }
}
