package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stateful gap sessionization: intra-batch gap close, cross-batch state
  * carry, event-time-timeout flush, and parity with the batch window
  * spelling on the same rows. */
class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions close on intra-batch gaps and flush via event-time timeout") {
    val ckpt = Files.createTempDirectory("graft_sess_ck").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = Streams.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"), gapSec = 1800)

    val q = sessions.writeStream
      .format("memory").queryName("sess_test")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      // batch 1: user 1 has two sessions separated by an 80-min gap
      // (closed inline within the batch); user 2 one open session
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:05:00"), 2.0),
        (1L, ts("2024-01-01 10:10:00"), 3.0),
        (1L, ts("2024-01-01 11:30:00"), 4.0),
        (2L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      val afterB1 = spark.table("sess_test").as[Streams.ClosedSession].collect()
      assert(afterB1.map(s => (s.user_id, s.n_events)).toSet == Set((1L, 3L)),
        s"only user 1's first session should have closed inline, got ${afterB1.toSeq}")
      assert(afterB1.head.sum_value == 6.0)
      assert(afterB1.head.session_start == ts("2024-01-01 10:00:00"))
      assert(afterB1.head.session_end == ts("2024-01-01 10:10:00"))

      // sentinel batches advance the watermark so the open sessions'
      // deadlines fall behind it and the timeout flushes them
      input.addData((99L, ts("2024-01-02 10:00:00"), 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-03 10:00:00"), 0.0))
      q.processAllAvailable()

      val flushed = spark.table("sess_test").as[Streams.ClosedSession]
        .collect().filter(_.user_id < 99L)
      val byUser = flushed.groupBy(_.user_id).view.mapValues(_.sortBy(_.session_start.getTime)).toMap
      assert(byUser(1L).map(_.n_events).toSeq == Seq(3L, 1L))
      assert(byUser(1L)(1).session_start == ts("2024-01-01 11:30:00"))
      assert(byUser(2L).map(s => (s.n_events, s.sum_value)).toSeq == Seq((1L, 5.0)))

      // batch parity: same session count as the window spelling
      val batch = Seq(
        (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
        (1L, ts("2024-01-01 10:10:00")), (1L, ts("2024-01-01 11:30:00")),
        (2L, ts("2024-01-01 10:00:00")))
        .toDF("user_id", "ts")
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("user_id").orderBy("ts")
      val nSessions = batch
        .withColumn("gap", unix_timestamp($"ts") - unix_timestamp(lag($"ts", 1).over(w)))
        .withColumn("new_sess", when($"gap".isNull || $"gap" > 1800, 1).otherwise(0))
        .groupBy($"user_id").agg(sum($"new_sess").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byUser.view.mapValues(_.length.toLong).toMap == nSessions)
    } finally q.stop()
  }

  test("open-session state survives a query restart on the same checkpoint") {
    val ckpt = Files.createTempDirectory("graft_sess_ck3").toString
    val sink = Files.createTempDirectory("graft_sess_sink3").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    def sessions = Streams.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"), gapSec = 1800)
    // memory sink cannot recover a checkpoint; the durable parquet sink
    // is the restart-capable path
    def start() = sessions.writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    try {
      input.addData((5L, ts("2024-05-01 08:00:00"), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: the open session must come back from the state store and
    // merge with the next event (10-min gap), then flush via sentinels
    val q2 = start()
    try {
      input.addData((5L, ts("2024-05-01 08:10:00"), 2.0))
      q2.processAllAvailable()
      input.addData((99L, ts("2024-05-02 08:00:00"), 0.0))
      q2.processAllAvailable()
      input.addData((99L, ts("2024-05-03 08:00:00"), 0.0))
      q2.processAllAvailable()
      val out = spark.read.parquet(sink).as[Streams.ClosedSession]
        .collect().filter(_.user_id == 5L)
      assert(out.map(s => (s.n_events, s.sum_value)).toSeq == Seq((2L, 3.0)),
        s"restarted session must merge pre-restart state, got ${out.toSeq}")
      assert(out.head.session_start == ts("2024-05-01 08:00:00"))
      assert(out.head.session_end == ts("2024-05-01 08:10:00"))
    } finally q2.stop()
  }

  test("a session spanning micro-batches accumulates in state before closing") {
    val ckpt = Files.createTempDirectory("graft_sess_ck2").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = Streams.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"), gapSec = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sess_test2")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      input.addData((7L, ts("2024-03-01 09:00:00"), 1.0))
      q.processAllAvailable()
      // second batch extends the same session (10-min gap)
      input.addData((7L, ts("2024-03-01 09:10:00"), 2.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-03-02 09:00:00"), 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-03-03 09:00:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_test2").as[Streams.ClosedSession]
        .collect().filter(_.user_id == 7L)
      assert(out.map(s => (s.n_events, s.sum_value)).toSeq == Seq((2L, 3.0)),
        s"cross-batch session should merge, got ${out.toSeq}")
      assert(out.head.session_end == ts("2024-03-01 09:10:00"))
    } finally q.stop()
  }
}
