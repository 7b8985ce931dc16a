package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming daily aggregate: file source → watermark → windowed agg,
  * drained with AvailableNow; asserts parity with the batch operator. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming daily tmax over a file source matches the batch aggregate") {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck").toString
    val rows = Seq(
      ("2024-07-01 23:00:00", 30.0), // NY July 1 7pm
      ("2024-07-02 03:00:00", 35.0), // NY July 1 11pm
      ("2024-07-02 05:00:00", 25.0)) // NY July 2 1am
      .map { case (ts, t) =>
        (Timestamp.valueOf(ts), "KLGA", Option(40.78), Option(-73.87), Option(t), "isd", 0L)
      }
    rows.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = Streams.hourlyObsStream(spark, dir)
    assert(stream.isStreaming)
    val daily = Streams.dailyTmaxStream(stream, "America/New_York")
    Streams.runToMemory(daily, "daily_test", ckpt)

    val got = spark.table("daily_test")
      .orderBy("date_local")
      .select("date_local", "tmax_c", "coverage_hours")
      .collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("tmax_c") == 35.0) // local July 1
    assert(got(1).getAs[Double]("tmax_c") == 25.0) // local July 2
    assert(got(0).getAs[Int]("coverage_hours") == 2)
  }

  test("runAvailableNow drives the append-mode parquet sink end-to-end") {
    val dir = Files.createTempDirectory("graft_stream_in2").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck2").toString
    val sink = Files.createTempDirectory("graft_stream_out2").toString
    val rows = Seq(
      ("2024-07-01 23:00:00", 30.0), // NY July 1 7pm
      ("2024-07-02 03:00:00", 35.0), // NY July 1 11pm
      ("2024-07-02 05:00:00", 25.0), // NY July 2 1am
      ("2024-07-05 12:00:00", 20.0)) // sentinel: advances watermark past Jul 1–2
      .map { case (ts, t) =>
        (Timestamp.valueOf(ts), "KLGA", Option(40.78), Option(-73.87), Option(t), "isd", 0L)
      }
    rows.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val daily = Streams.dailyTmaxStream(
      Streams.hourlyObsStream(spark, dir), "America/New_York", watermark = "1 hour")
    // append mode fails at query start if the aggregation lost its watermark
    Streams.runAvailableNow(daily, ckpt, sink)

    // append emits only watermark-closed windows: local July 1 and July 2
    val got = spark.read.parquet(sink)
      .orderBy("date_local")
      .select("date_local", "tmax_c", "coverage_hours")
      .collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("tmax_c") == 35.0)
    assert(got(1).getAs[Double]("tmax_c") == 25.0)
  }

  test("stateful dedup stream drops duplicates across micro-batches and restarts") {
    val in = Files.createTempDirectory("graft_dedup_in").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ck").toString
    val sink = Files.createTempDirectory("graft_dedup_out").toString

    def drain(): Unit = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in)
      Streams.runAvailableNow(Streams.dedupDocsStream(docs).toDF(), ckpt, sink)
    }

    // batch 1: "aaa" twice (doc 2 and 5 — min doc_id wins), "bbb" once
    Seq((5L, "aaa"), (2L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    val first = spark.read.parquet(sink).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first == Set((2L, "aaa"), (3L, "bbb")))

    // batch 2 (separate query start, same checkpoint): "aaa" again must
    // stay dropped — the fingerprint state survived in the checkpoint —
    // and only the new "ccc" is emitted.
    Seq((7L, "aaa"), (8L, "ccc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    val all = spark.read.parquet(sink).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all == Set((2L, "aaa"), (3L, "bbb"), (8L, "ccc")))
  }

  test("doc quality stream admits exactly the batch-filtered set, once per file") {
    val in = Files.createTempDirectory("graft_dq_in").toString
    val ckpt = Files.createTempDirectory("graft_dq_ck").toString
    val sink = Files.createTempDirectory("graft_dq_out").toString
    def doc(id: Long, text: String) = (id, text, "en", "src0", text.length.toLong)
    val rows = Seq(
      doc(1L, "the cat sat on the mat and looked out of a window today"), // good
      doc(2L, "too short"),                                                // < 5 tokens → quality 0
      doc(3L, "spam spam spam spam spam spam spam spam"))                  // low diversity, no stopwords
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.coalesce(1).write.mode("append").parquet(in)

    def drain(): Unit =
      Streams.runAvailableNow(Streams.docQualityStream(spark, in), ckpt, sink)
    drain()
    val admitted = spark.read.parquet(sink).select("doc_id").collect().map(_.getLong(0)).toSet

    // parity: the batch spelling over the same data admits the same set
    val batch = graft.queries.TextFeatures.withQualityColumns(rows)
      .filter(col("quality") >= 0.5 && col("n_tokens") >= 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == batch)
    assert(admitted.contains(1L) && !admitted.contains(2L))

    // restart with the same checkpoint and no new files: nothing re-admitted
    drain()
    assert(spark.read.parquet(sink).count() == admitted.size)
    // a new file is processed exactly once
    Seq(doc(9L, "a fresh document with the usual mix of common and varied words in it"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    assert(spark.read.parquet(sink).select("doc_id").collect().map(_.getLong(0)).toSet
      == admitted + 9L)
  }

  test("decontamination stream rejects bloom-overlapping docs, stateless, batch parity") {
    val in = Files.createTempDirectory("graft_dc_in").toString
    val ckpt = Files.createTempDirectory("graft_dc_ck").toString
    val sink = Files.createTempDirectory("graft_dc_out").toString
    def doc(id: Long, text: String) = (id, text, "en", "src9", text.length.toLong)

    // benchmark set: one held-out document; its bloom is built OFFLINE
    // (batch) exactly like text_decontaminate_bloom's filter
    val benchText = (1 to 40).map(i => s"bench$i").mkString(" ")
    val mBits = 1 << 14
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val benchGrams = graft.queries.Shingles.wordTrigrams(bench)
      .select(expr(graft.queries.Shingles.h60("gram")).as("gram")).distinct()
    val words = graft.ops.Bloom.build(benchGrams, "gram", mBits)

    // contaminated = copies 20 bench trigrams; clean = disjoint vocab
    val contaminated = (5 to 27).map(i => s"bench$i").mkString(" ")
    val clean = (1 to 30).map(i => s"own$i").mkString(" ")
    // docs below trigram length have zero overlap by definition and must
    // not crash the index arithmetic (sequence(1,0) is DESCENDING)
    val rows = Seq(doc(1L, contaminated), doc(2L, clean),
        doc(3L, "two words"), doc(4L, ""))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.coalesce(1).write.mode("append").parquet(in)

    Streams.runAvailableNow(
      Streams.decontaminationStream(spark, in, words, mBits, maxOverlap = 10),
      ckpt, sink)
    val admitted = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L, 3L, 4L),
      "contaminated doc must be rejected; clean and sub-trigram docs admitted")

    // parity with the batch spelling of the same per-row expression
    val batch = rows
      .filter(Streams.bloomOverlap(col("text"), words, mBits) < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == admitted)
  }

  test("admission stream gates micro-batches against the stored dedup index, statelessly") {
    import graft.ops.{DedupDocs, DedupIndex}
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val work = Files.createTempDirectory("graft_admit_stream").toString
    DedupIndex.write(Seq((1L, base)).toDF("doc_id", "text"), s"$work/idx")
    val batch = Seq(
      (10L, base), // exact corpus dup → rejected in both modes
      (11L, near), // shares a band → passes exact-only, rejected by the band gate
      (12L, "completely different words about spark engines and parquet files here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$work/in")

    def admitted(bandGate: Boolean, tag: String): Set[Long] = {
      val out = Streams.admissionStream(spark, s"$work/in", s"$work/idx", bandGate)
      assert(out.isStreaming)
      Streams.runAvailableNow(out, s"$work/ck_$tag", s"$work/out_$tag")
      spark.read.parquet(s"$work/out_$tag").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }
    assert(admitted(bandGate = false, "exact") == Set(11L, 12L))
    assert(admitted(bandGate = true, "band") == Set(12L))
    // the band gate is exactly the batch path's minJaccard=None regime:
    // stream-admitted == docs NOT corpus-rejected by incrementalIndexed
    val batchStatuses = DedupDocs.incrementalIndexed(
        DedupIndex.read(spark, s"$work/idx"), batch, minJaccard = None)
      .filter(!col("status").startsWith("corpus"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchStatuses == Set(12L))
  }

  test("stream_daily_tmax registry entry equals pipe_daily_max row for row") {
    // the harness entry runs the REAL stream (multi-batch AvailableNow)
    // and must reproduce the batch pipeline exactly — rows, schema, and
    // values; the driver hash-checks the same equality against DuckDB
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.queries.Registry.queries("stream_daily_tmax")(spark, sf)
    val batch = graft.queries.Registry.queries("pipe_daily_max")(spark, sf)
    assert(streamed.schema.map(f => (f.name, f.dataType)) ==
      batch.schema.map(f => (f.name, f.dataType)))
    val a = streamed.collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(a.size == b.size && a.size > 0)
    assert(a == b)
  }
}
