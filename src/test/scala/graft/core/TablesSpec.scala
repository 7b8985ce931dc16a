package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Pins the schema-adaptive events loader against BOTH physical layouts
  * the testdata generator has shipped: parquet TIMESTAMP(NANOS) (read as
  * a raw long under `spark.sql.legacy.parquet.nanosAsLong`) and
  * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
  * A generator upgrade between rounds changed the layout mid-project and
  * took down every events-based query at verify/bench time — this spec
  * makes the contract explicit: same logical rows out regardless of the
  * physical `ts` encoding.
  */
class TablesSpec extends SparkSpec {

  private val rows = Seq(
    (1L, "2024-01-10 08:30:00.123456", 10L, "click", 1.5, """{"k":1}"""),
    (2L, "2024-01-15 23:59:59.999999", 11L, "purchase", 2.5, """{"k":2}"""),
    (3L, "2024-02-01 00:00:00.000001", 12L, "view", 3.5, """{"k":3}"""))

  private def micros(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  /** events dir in the legacy layout: `ts` is a plain long of epoch nanos
    * (what the nanosAsLong conf yields for TIMESTAMP(NANOS) files). */
  private def writeNanosLayout(dir: String): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, uid, et, v, p) => (id, micros(ts) * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** events dir in the current layout: `ts` is TIMESTAMP_NTZ micros. */
  private def writeNtzLayout(dir: String): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, ts, uid, et, v, p) =>
      Row(id, java.time.LocalDateTime.parse(ts.replace(' ', 'T')), uid, et, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("eventsRaw normalizes nanos-long and micros-NTZ layouts to identical frames") {
    val nanosDir = java.nio.file.Files.createTempDirectory("tables_nanos").toString
    val ntzDir = java.nio.file.Files.createTempDirectory("tables_ntz").toString
    writeNanosLayout(nanosDir)
    writeNtzLayout(ntzDir)

    val a = Tables.events(spark, nanosDir).orderBy("event_id")
    val b = Tables.events(spark, ntzDir).orderBy("event_id")
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val av = a.collect().toSeq
    val bv = b.collect().toSeq
    assert(av === bv)
    // µs precision survives end to end (the .999999 row is the witness)
    val t2 = av.find(_.getLong(0) == 2L).get.getTimestamp(1)
    assert(t2.toInstant.getNano === 999999000)
  }

  test("eventsInRange filters identically on both layouts and keeps boundary semantics") {
    val nanosDir = java.nio.file.Files.createTempDirectory("tables_nanos_r").toString
    val ntzDir = java.nio.file.Files.createTempDirectory("tables_ntz_r").toString
    writeNanosLayout(nanosDir)
    writeNtzLayout(ntzDir)

    val lo = "2024-01-10 00:00:00"
    val hi = "2024-01-16 00:00:00" // half-open: excludes the Feb row, includes .999999
    val a = Tables.eventsInRange(spark, nanosDir, lo, hi).orderBy("event_id").collect().toSeq
    val b = Tables.eventsInRange(spark, ntzDir, lo, hi).orderBy("event_id").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(0)) === Seq(1L, 2L))
  }
}
