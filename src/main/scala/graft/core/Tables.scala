package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star-schema testdata
  * (`/root/testdata/sf*&#47;<table>.parquet`, see TESTDATA.md).
  *
  * One parquet file per table at test scale; at production scale each of
  * these would be a partitioned directory — `spark.read.parquet(dir)` is
  * unchanged, and every query below relies on Catalyst pushdown (filters,
  * column pruning, partition pruning) rather than path gymnastics.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` physical type varies by generator version:
    * parquet TIMESTAMP(NANOS) (which the Spark 4 vectorized reader only
    * accepts as a raw long under the legacy conf) or TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Normalize both
    * to a microsecond TimestampType column — lossless (the generator
    * emits µs-precision UTC values and the session zone is pinned UTC),
    * and identical to what DuckDB sees.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val norm = df.schema("ts").dataType match {
      // integer DIV, not `/`: epoch-nanos (~1.7e18) exceeds double's
      // 53-bit mantissa, so floating division would round the microsecond.
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // wall time == UTC instant under the pinned-UTC session zone
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
    norm.select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Time-range scan of events with parquet row-group pruning: the range
    * predicate is applied to the RAW nanos column BEFORE the
    * long→timestamp conversion (a filter on the converted column cannot
    * push through the expression — SURVEY §4 / ARCHITECTURE scale notes).
    */
  def eventsInRange(
      spark: SparkSession, sfDir: String,
      startUtc: String, endUtcExclusive: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // parse as UTC wall time explicitly (Timestamp.valueOf would use the
    // JVM default zone)
    def wall(s: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    df.schema("ts").dataType match {
      case LongType =>
        def epochNanos(s: String): Long =
          wall(s).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
        df.filter(col("ts") >= epochNanos(startUtc) &&
            col("ts") < epochNanos(endUtcExclusive)) // pushed: plain long predicate
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case _ =>
        // timestamp column (NTZ or TZ): a LocalDateTime literal compares as
        // wall time and pushes to footer stats directly, no conversion in
        // the way of the scan predicate
        df.filter(col("ts") >= lit(wall(startUtc)) &&
            col("ts") < lit(wall(endUtcExclusive)))
          .withColumn("ts", col("ts").cast(TimestampType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
