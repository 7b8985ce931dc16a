package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mm.Multimodal

/** Multimodal planning queries, oracle-checked: the decode kernels need
  * codecs the container lacks, but everything Spark actually PLANS —
  * aspect-preserving resize targets, per-frame work-item fan-out, byte-
  * budget partition sizing — is pure metadata arithmetic, so it gets the
  * same DuckDB hash-gate as every other operator. Metadata comes from
  * [[Multimodal.mediaFromDocuments]], a deterministic fixture derived
  * from the documents table (both engines rebuild it identically).
  *
  * Scale notes: all three queries are metadata-only — the payload column
  * is never in the ReadSchema (pinned in MultimodalSpec), which is the
  * property that makes planning 100 TB of media cost a few GB of scan.
  */
object MultimodalQueries {

  private val mediaCte = Multimodal.mediaFixtureSql

  def all: Seq[OracleQuery] = Seq(
    // Resize plan (maxDim=512): output dims + needs_resize flags straight
    // from Multimodal.resizePlan. Covers known dims (resize + no-op),
    // NULL dims and corrupt 0×0 dims (both flow to the probing kernel
    // with needs_resize=true — never silently dropped).
    OracleQuery(
      "mm_resize_plan",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        Multimodal.resizePlan(media, maxDim = 512)
          .select($"asset_id", $"width", $"height", $"out_w", $"out_h", $"needs_resize")
          .orderBy($"asset_id")
      },
      Some(s"""WITH $mediaCte, planned AS (
              |  SELECT asset_id, width, height,
              |    (width IS NOT NULL AND height IS NOT NULL AND width > 0 AND height > 0) AS dims_known,
              |    CASE WHEN width IS NOT NULL AND height IS NOT NULL AND width > 0 AND height > 0 THEN
              |      greatest(1, CAST(floor(width * least(1.0, 512.0 / greatest(width, height))) AS BIGINT)) END AS out_w,
              |    CASE WHEN width IS NOT NULL AND height IS NOT NULL AND width > 0 AND height > 0 THEN
              |      greatest(1, CAST(floor(height * least(1.0, 512.0 / greatest(width, height))) AS BIGINT)) END AS out_h
              |  FROM media WHERE kind = 'image'
              |)
              |SELECT asset_id, width, height, out_w, out_h,
              |  ((NOT dims_known) OR out_w != width OR out_h != height) AS needs_resize
              |FROM planned ORDER BY asset_id""".stripMargin)
    ),

    // Frame-sampling plan (one work item per 7s of video): per-asset
    // frame counts and range from Multimodal.sampleFrames ≡ DuckDB
    // generate_series (both inclusive of the stop when it lands exactly).
    OracleQuery(
      "mm_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        Multimodal.sampleFrames(media, everyMs = 7000L)
          .groupBy($"asset_id")
          .agg(
            count(lit(1)).as("n_frames"),
            min($"frame_ms").as("first_ms"),
            max($"frame_ms").as("last_ms"))
          .orderBy($"asset_id")
      },
      Some(s"""WITH $mediaCte, frames AS (
              |  SELECT asset_id, unnest(generate_series(0, duration_ms - 1, 7000)) AS frame_ms
              |  FROM media WHERE kind = 'video' AND duration_ms IS NOT NULL
              |)
              |SELECT asset_id, count(*) AS n_frames,
              |  min(frame_ms) AS first_ms, max(frame_ms) AS last_ms
              |FROM frames GROUP BY asset_id ORDER BY asset_id""".stripMargin)
    ),

    // Byte-budget partition sizing (1 MiB per decode task): the
    // per-kind partition-count arithmetic of
    // Multimodal.repartitionByByteBudget — max(1, bytes DIV budget).
    OracleQuery(
      "mm_byte_budget",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        media.groupBy($"kind")
          .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("kind_bytes"))
          .withColumn("n_parts", greatest(lit(1L), expr("kind_bytes DIV 1048576")))
          .orderBy($"kind")
      },
      Some(s"""WITH $mediaCte, sized AS (
              |  SELECT kind, count(*) AS n_assets, CAST(sum(n_bytes) AS BIGINT) AS kind_bytes
              |  FROM media GROUP BY kind
              |)
              |SELECT kind, n_assets, kind_bytes,
              |  CAST(greatest(1, kind_bytes // 1048576) AS BIGINT) AS n_parts
              |FROM sized ORDER BY kind""".stripMargin)
    ),

    // Perceptual image near-dup (dHash + banded Hamming — the image-side
    // twin of document MinHash): one REAL PNG decode per asset feeds a
    // 64-bit difference hash; candidates come from a 4×16-bit band
    // equi-join (pigeonhole: Hamming ≤ 3 ⇒ ≥1 exact band), pairs verify
    // with exact bit_count. Hash VALUES are engine-specific (JVM pixel
    // decode), so the gate rides the planted-pair fixture
    // (Multimodal.syntheticPng): assets 2k/2k+1 are near-identical BY
    // CONSTRUCTION (the perturbation is confined to one dHash cell ⇒
    // within Hamming 2), distinct bases are ~32 bits apart — so the
    // emitted pair LIST is exactly the planted list, which DuckDB
    // derives from id arithmetic alone. Recall (every planted pair
    // found) AND precision (nothing else) both sit under the hash gate;
    // MultimodalSpec pins the Hamming margins and the pigeonhole
    // property itself.
    OracleQuery(
      "mm_dedup_dhash",
      (s, d) => {
        import s.implicits._
        val sigs = Multimodal.dhashSignatures(
          Multimodal.syntheticImages(Tables.documents(s, d)))
        Multimodal.dhashNearDupPairs(sigs, maxHamming = 3)
          .select($"asset_a", $"asset_b", lit(true).as("is_near"))
          .orderBy($"asset_a", $"asset_b")
      },
      Some("""SELECT a.doc_id AS asset_a, b.doc_id AS asset_b, TRUE AS is_near
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |WHERE a.doc_id % 2 = 0
             |ORDER BY asset_a, asset_b""".stripMargin)
    ),

    // Audio near-dup (energy-delta fingerprint + the SAME banded
    // Hamming machinery as mm_dedup_dhash) — completing the modality
    // dedup family: text MinHash, image dHash, audio energy-delta. Bit
    // i compares window energies e[i+1] > e[i], so the print is
    // GAIN-INVARIANT: the fixture's odd twin plays at 5/4 the volume
    // (integer-exact scaling — every comparison and tie preserved) with
    // ONE window perturbed (≤2 bit flips by construction), so planted
    // pairs land within Hamming 2 while distinct splitmix64 profiles
    // sit ~32 bits apart. The emitted pair list must equal the
    // id-arithmetic planted list — recall AND precision under the gate,
    // through a REAL javax.sound decode.
    OracleQuery(
      "mm_dedup_audiofp",
      (s, d) => {
        import s.implicits._
        val fps = Multimodal.audioFingerprints(
          Multimodal.syntheticAudioPairs(Tables.documents(s, d)))
        Multimodal.dhashNearDupPairs(fps, maxHamming = 3)
          .select($"asset_a", $"asset_b", lit(true).as("is_near"))
          .orderBy($"asset_a", $"asset_b")
      },
      Some("""SELECT a.doc_id AS asset_a, b.doc_id AS asset_b, TRUE AS is_near
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |WHERE a.doc_id % 2 = 0
             |ORDER BY asset_a, asset_b""".stripMargin)
    ),

    // Video near-dup (luma-delta fingerprint over REAL MJPEG-AVI decode)
    // — completing modality dedup across all four kinds: text MinHash,
    // image dHash, audio energy-delta, video luma-delta. Bit i compares
    // frame lumas luma[i+1] > luma[i] — robust to re-encoding (a
    // different JPEG quality shifts absolute lumas but preserves
    // frame-to-frame order). The fixture's odd twin redraws ONE frame's
    // gray (≤2 bit flips); every other frame is BYTE-IDENTICAL between
    // twins, so its decoded luma is identical and no other bit can move
    // — recall and precision both under the planted-list hash gate,
    // through a real RIFF walk + 65 javax.imageio frame decodes/asset.
    OracleQuery(
      "mm_dedup_videofp",
      (s, d) => {
        import s.implicits._
        val fps = Multimodal.videoFingerprints(
          Multimodal.syntheticVideoPairs(Tables.documents(s, d)))
        Multimodal.dhashNearDupPairs(fps, maxHamming = 3)
          .select($"asset_a", $"asset_b", lit(true).as("is_near"))
          .orderBy($"asset_a", $"asset_b")
      },
      Some("""SELECT a.doc_id AS asset_a, b.doc_id AS asset_b, TRUE AS is_near
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |WHERE a.doc_id % 2 = 0
             |ORDER BY asset_a, asset_b""".stripMargin)
    ),

    // Voice-activity segmentation over REAL WAV decode — the speech/
    // silence cut an ASR-training pipeline makes before transcription.
    // Spark's answer comes entirely from javax.sound PCM decode of the
    // synthetic speech fixture (per-window mean-|amp| energies →
    // threshold → islands merge, Multimodal.vadSegments); the oracle
    // NEVER sees audio — it replays the fixture's integer voiced-
    // schedule predicate and runs the same islands SQL, so the hash
    // gate proves decode + windowing + segmentation end-to-end (a
    // window misaligned by one sample breaks a segment boundary, a
    // decode scale error flips every threshold boolean). Assets whose
    // schedule has no voiced segment are absent on BOTH sides.
    OracleQuery(
      "mm_audio_vad",
      (s, d) => {
        import s.implicits._
        val segs = Multimodal.vadSegments(
          Multimodal.syntheticSpeech(Tables.documents(s, d)))
        segs.groupBy($"asset_id")
          .agg(count(lit(1)).as("n_segments"),
            sum($"nf").as("n_voiced"),
            min($"s0").as("first_start"),
            max($"s1").as("last_end"))
          .orderBy($"asset_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS asset_id, s.gs AS frame_idx
             |  FROM documents,
             |    (SELECT unnest(generate_series(0, 11)) AS gs) s
             |  WHERE ((doc_id * 2654435761 + s.gs * 40503) % 97) < 48
             |), v AS (
             |  SELECT asset_id, frame_idx,
             |    frame_idx - row_number() OVER (
             |      PARTITION BY asset_id ORDER BY frame_idx) AS grp
             |  FROM f
             |), seg AS (
             |  SELECT asset_id, grp, min(frame_idx) AS s0, max(frame_idx) AS s1,
             |    count(*) AS nf
             |  FROM v GROUP BY 1, 2
             |)
             |SELECT asset_id, count(*) AS n_segments,
             |  CAST(sum(nf) AS BIGINT) AS n_voiced,
             |  min(s0) AS first_start, max(s1) AS last_end
             |FROM seg GROUP BY asset_id ORDER BY asset_id""".stripMargin)
    )
  )
}
