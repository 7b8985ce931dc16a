package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed prefix sums over (partition, order) — the running
  * total behind sequence packing, budget cuts and fold assignment —
  * WITHOUT a window partitioned by the grouping column alone (one
  * reducer per group: a single "web" source at 100 TB would serialize
  * through one task's sort).
  *
  * Shape: deterministically hash-sample the order column, pick up to
  * `buckets` range boundaries driver-side, and tag every row with a
  * bucket id that is monotone in the order column. A per-(part, bucket)
  * sum histogram (tiny — |parts| × buckets rows) is collected and
  * turned into cumulative "sum below this bucket" offsets that re-enter
  * the plan via a broadcast join; the only window over the data is then
  * partitioned by (part, bucket) — `buckets`-way parallel inside every
  * group. Monotone bucket + within-bucket running sum + below-offset is
  * EXACTLY the global per-group prefix sum (boundaries affect only
  * parallelism, never values — pinned in PrefixSumSpec).
  */
object PrefixSum {

  /** Adds `outCol` = running sum of `valueCol` per `partCol` in
    * `orderCol` order (rows between unbounded preceding and current).
    * Ties on `orderCol` follow window semantics (caller should make the
    * order key unique per group for full determinism, as with any
    * running-sum window).
    *
    * `knownCount`: the row count is used ONLY to pick the sampling
    * modulus for boundary selection — pass it when the caller already
    * knows it (a prior stage counted, or the sink's commit metadata
    * has it) and the separate count pass disappears; the boundaries it
    * tunes affect parallelism, never values, so a stale or approximate
    * count is safe. */
  def withCumsum(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String = "cum", buckets: Int = 64,
      sampleTarget: Int = 20000, knownCount: Option[Long] = None): DataFrame =
    cumsumImpl(df, partCol, orderCol, valueCol, outCol, buckets,
      sampleTarget, knownCount, decimal = false)

  /** [[withCumsum]] with the running total carried as DECIMAL(38,0) —
    * for value columns whose PREFIX SUM outgrows a long even though
    * every element fits one (the a74 ln-factorial table: elements are
    * ≤ ln(N)·10¹², but Σln(i) ≈ N(ln N − 1)·10¹² crosses 2⁶³ already
    * at N ≈ 6.9×10⁵ — a silent wrap under non-ANSI, a job-killing
    * overflow under ANSI, while DuckDB's BIGINT sum promotes to
    * HUGEINT; decimal keeps the two engines exact together to 10³⁸). */
  def withCumsumDecimal(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String = "cum", buckets: Int = 64,
      sampleTarget: Int = 20000, knownCount: Option[Long] = None): DataFrame =
    cumsumImpl(df, partCol, orderCol, valueCol, outCol, buckets,
      sampleTarget, knownCount, decimal = true)

  /** One shared spelling of the sample → bucket → histogram → offset →
    * broadcast-rejoin machinery; `decimal` switches only the
    * accumulator representation (long vs DECIMAL(38,0)). The
    * driver-side below-offset fold always runs in BigDecimal — exact
    * for both paths — and narrows to long at the end for the long
    * path (longValueExact: a silent driver-side wrap would be the
    * very bug the decimal variant exists to prevent). */
  private def cumsumImpl(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String, buckets: Int, sampleTarget: Int,
      knownCount: Option[Long], decimal: Boolean): DataFrame = {
    val spark = df.sparkSession
    val n = knownCount.getOrElse(df.count())
    val mod = math.max(1L, n / math.max(1, sampleTarget))
    val h = expr(graft.queries.Shingles.h60(s"CAST($orderCol AS STRING)"))
    // deterministic hash sample of order values; Spark sorts them so the
    // boundary order is the engine's own type ordering, not the JVM's
    val sampled = df.filter(col(orderCol).isNotNull && pmod(h, lit(mod)) === 0)
      .select(col(orderCol)).distinct().orderBy(col(orderCol))
      .collect().map(_.get(0))
    val k = math.min(buckets, math.max(1, sampled.length))
    val bounds = (1 until k).map(i => sampled(i * sampled.length / k)).distinct
    // bucket id = number of boundaries <= order value: monotone in the
    // order column, so (bucket, order) sorts identically to (order)
    val bucket: Column =
      if (bounds.isEmpty) when(col(orderCol).isNull, lit(-1L)).otherwise(lit(0L))
      else when(col(orderCol).isNull, lit(-1L)).otherwise(
        bounds.map(b => (col(orderCol) >= lit(b)).cast("long")).reduce(_ + _))

    val accType = if (decimal) "decimal(38,0)" else "long"
    val hist = df
      .groupBy(col(partCol).as("ps_d"), bucket.as("ps_b"))
      .agg(sum(col(valueCol).cast(accType)).as("ps_c"))
      .collect()
    def cellOf(r: Row): java.math.BigDecimal =
      if (r.isNullAt(2)) java.math.BigDecimal.ZERO
      else if (decimal) r.getDecimal(2)
      else java.math.BigDecimal.valueOf(r.getLong(2))
    val offsetRows = hist
      .map(r => (r.get(0), r.getLong(1), cellOf(r)))
      .groupBy(_._1).toSeq.flatMap { case (_, bs) =>
        var below = java.math.BigDecimal.ZERO
        bs.sortBy(_._2).map { case (d, b, c) =>
          val cell: Any = if (decimal) below else below.longValueExact()
          val row = Row(d, b, cell); below = below.add(c); row
        }
      }
    val belowType: DataType = if (decimal) DecimalType(38, 0) else LongType
    val schema = StructType(Seq(
      StructField("ps_d", df.schema(partCol).dataType),
      StructField("ps_b", LongType), StructField("ps_below", belowType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), schema)

    val w = Window.partitionBy(col(partCol), col("ps_b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val running =
      if (decimal)
        (col("ps_below") + sum(col(valueCol).cast(accType)).over(w))
          .cast("decimal(38,0)")
      else col("ps_below") + sum(col(valueCol)).over(w)
    // null-safe on the group key: PrefixSum must keep EVERY input row,
    // including a null group (unlike MixSampler, where unweighted
    // domains are dropped by design)
    df.join(broadcast(offsets),
        col(partCol) <=> col("ps_d") && bucket === col("ps_b"))
      .withColumn(outCol, running)
      .drop("ps_d", "ps_b", "ps_below")
  }
}
