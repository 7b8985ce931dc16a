package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming state-partition knob (Streams.statePartitions): a
  * stateful streaming query must open `spark.graft.stream.statePartitions`
  * state stores — not the session's data-shuffle partition count — and
  * the session conf must be restored after the stream starts. The state
  * directory layout is the observable: HDFSBackedStateStore creates one
  * numbered partition dir per store under `<ckpt>/state/0/`. */
class StreamStatePartitionsSpec extends SparkSpec {
  import spark.implicits._

  test("stateful stream runs with statePartitions stores and restores the session conf") {
    val ckpt = Files.createTempDirectory("graft_statep_ck").toString
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.graft.stream.statePartitions", "3")
    try {
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      val sessions = Streams.sessionizeStream(
        input.toDF().toDF("user_id", "ts", "value"), gapSec = 60)
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-01-01 10:00:30"), 2.0))
      val q = Streams.withStatePartitions(spark) {
        sessions.writeStream
          .format("memory").queryName("statep_test")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
      }
      try {
        // the conf must be restored the moment start() returns — the
        // stream keeps its own cloned copy
        assert(spark.conf.get("spark.sql.shuffle.partitions") == prevShuffle,
          "session shuffle partitions must be restored after start()")
        q.processAllAvailable()
      } finally q.stop()
      val stateDir = new java.io.File(s"$ckpt/state/0")
      assert(stateDir.isDirectory, s"expected state dir at $stateDir")
      val partDirs = stateDir.listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.forall(_.isDigit)).sorted.toSeq
      assert(partDirs == Seq("0", "1", "2"),
        s"expected exactly 3 state partitions, got $partDirs")
    } finally {
      spark.conf.unset("spark.graft.stream.statePartitions")
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
