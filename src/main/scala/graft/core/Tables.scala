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

  /** The events table is written with parquet TIMESTAMP(NANOS), which the
    * Spark 4 vectorized reader rejects. Read `ts` as raw nanos (legacy
    * conf) and convert to a microsecond TimestampType column — lossless
    * here (generator emits µs-precision values) and matches what DuckDB
    * sees modulo sub-µs zeros.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // integer DIV, not `/`: epoch-nanos (~1.7e18) exceeds double's 53-bit
    // mantissa, so floating division would round the microsecond.
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Time-range scan of events with parquet row-group pruning: the range
    * predicate is applied to the RAW nanos column BEFORE the
    * long→timestamp conversion (a filter on the converted column cannot
    * push through the expression — SURVEY §4 / ARCHITECTURE scale notes).
    */
  def eventsInRange(
      spark: SparkSession, sfDir: String,
      startUtc: String, endUtcExclusive: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // parse as UTC wall time explicitly (Timestamp.valueOf would use the
    // JVM default zone)
    def epochNanos(s: String): Long =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
    val lo = epochNanos(startUtc)
    val hi = epochNanos(endUtcExclusive)
    df.filter(org.apache.spark.sql.functions.col("ts") >= lo &&
        org.apache.spark.sql.functions.col("ts") < hi) // pushed: plain long predicate
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
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
