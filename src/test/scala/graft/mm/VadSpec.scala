package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Voice-activity segmentation: exact window energies from real WAV
  * decode, island merging of adjacent voiced windows, and the fixture's
  * replayable-schedule contract (the mm_audio_vad gate's premise). */
class VadSpec extends SparkSpec {
  import spark.implicits._

  private def voicedBit(assetId: Long, s: Int): Boolean =
    ((assetId * 2654435761L + s * 40503L) % 97) < 48

  test("window energies decode to exactly 0.5 (voiced) / 0.0 (silent)") {
    val id = 7L
    val es = Multimodal.audioFrameEnergies(
      Multimodal.syntheticSpeechWav(id), frameSamples = 400).get
    assert(es.length == 12)
    for (s <- 0 until 12) {
      val want = if (voicedBit(id, s)) 0.5 else 0.0
      assert(es(s) == want, s"window $s: got ${es(s)}, want $want (exact)")
    }
  }

  test("a window misaligned with segments mixes energies (alignment is load-bearing)") {
    // 300-sample windows straddle 400-sample segments: some windows
    // cover part voiced, part silent — energies strictly between the
    // two pure levels appear, which the aligned gate would misread
    val es = Multimodal.audioFrameEnergies(
      Multimodal.syntheticSpeechWav(3L), frameSamples = 300).get
    assert(es.length == 16)
    assert(es.exists(e => e > 0.0 && e < 0.5),
      "expected at least one mixed-coverage window energy")
  }

  test("vadSegments merges adjacent voiced windows and splits on gaps") {
    val media = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val segs = Multimodal.vadSegments(Multimodal.syntheticSpeech(media))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
      .groupBy(_._1)
    for (id <- Seq(1L, 2L, 3L, 4L, 5L)) {
      // expected runs of the schedule bits
      val bits = (0 until 12).map(voicedBit(id, _))
      var runs = List.empty[(Int, Int)]
      var start = -1
      for (s <- 0 until 12) {
        if (bits(s) && start < 0) start = s
        if (!bits(s) && start >= 0) { runs ::= (start, s - 1); start = -1 }
      }
      if (start >= 0) runs ::= (start, 11)
      val got = segs.getOrElse(id, Array.empty)
        .map(t => (t._2, t._3)).toSet
      assert(got == runs.toSet, s"asset $id: got $got want ${runs.toSet}")
      // lengths consistent
      segs(id).foreach { case (_, s0, s1, nf) => assert(nf == s1 - s0 + 1) }
    }
  }

  test("undecodable payloads are absent, not silent") {
    val schema = StructType(Seq(
      StructField("asset_id", LongType), StructField("payload", BinaryType)))
    val rows = Seq(
      Row(1L, Multimodal.syntheticSpeechWav(1L)),
      Row(2L, Array.tabulate(40)(_.toByte)), // not audio
      Row(3L, null))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val ids = Multimodal.vadSegments(media)
      .select("asset_id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
