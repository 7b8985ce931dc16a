package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** TTL-bounded streaming dedup (dropDuplicatesWithinWatermark): dups
  * inside the horizon are dropped across micro-batches; once the
  * watermark evicts a key's state, a later copy re-admits — the
  * documented one-sided contract that keeps state O(rate × horizon). */
class DedupHorizonStreamSpec extends SparkSpec {
  import spark.implicits._

  test("dedup-within-horizon drops close duplicates and re-admits after eviction") {
    val in = Files.createTempDirectory("graft_ttl_in").toString
    val ckpt = Files.createTempDirectory("graft_ttl_ck").toString
    val sink = Files.createTempDirectory("graft_ttl_out").toString

    def writeBatch(rows: Seq[(String, String, Long)]): Unit =
      rows.map { case (k, ts, v) => (k, Timestamp.valueOf(ts), v) }
        .toDF("k", "ts", "payload")
        .coalesce(1).write.mode("append").parquet(in)

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("k STRING, ts TIMESTAMP, payload LONG")
        .parquet(in)
      Streams.runAvailableNow(
        Streams.dedupWithinHorizonStream(stream, Seq("k"), "ts", "10 minutes"),
        ckpt, sink)
    }

    // batch 1: in-batch duplicate of k1 plus a distinct k2
    writeBatch(Seq(
      ("k1", "2024-06-01 10:00:00", 1L),
      ("k1", "2024-06-01 10:02:00", 2L),
      ("k2", "2024-06-01 10:01:00", 3L)))
    drain()
    def admitted(): Seq[(String, Long)] =
      spark.read.parquet(sink).select($"k", $"payload").as[(String, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    val after1 = admitted()
    assert(after1.map(_._1) == Seq("k1", "k2"), s"batch 1 admitted $after1")

    // batch 2: k1 again within the horizon (state still live) → dropped;
    // the k3 sentinel pushes the watermark to 10:50, past k1's
    // (event time + horizon) = 10:10, so k1's state is evicted
    writeBatch(Seq(
      ("k1", "2024-06-01 10:03:00", 4L),
      ("k3", "2024-06-01 11:00:00", 5L)))
    drain()
    val after2 = admitted()
    assert(after2.map(_._1) == Seq("k1", "k2", "k3"), s"batch 2 admitted $after2")

    // batch 3: k1 returns AFTER eviction → re-admitted (one-sided
    // contract: the horizon bounds state, not recall beyond it)
    writeBatch(Seq(("k1", "2024-06-01 10:55:00", 6L)))
    drain()
    val after3 = admitted()
    assert(after3 == Seq(("k1", 1L), ("k1", 6L), ("k2", 3L), ("k3", 5L)),
      s"batch 3 admitted $after3")
  }
}
