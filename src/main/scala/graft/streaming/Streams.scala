package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming wrappers. The reference is strictly batch
  * (SURVEY §2.11) — these are the thin incremental-ingestion analogues
  * of its per-year/per-issue-hour parquet parts: a file-source stream
  * with Trigger.AvailableNow processes whatever new files landed and
  * stops, giving idempotent incremental re-runs with checkpoint-tracked
  * progress instead of the reference's cache-and-refetch.
  *
  * Scale notes: the daily aggregate keys the watermark state by
  * (station_id, local day window) — bounded state (one row per
  * station-day in flight), late data older than the watermark dropped
  * deterministically.
  */
object Streams {

  /** State-store partition count for streaming queries. A stateful
    * operator opens `spark.sql.shuffle.partitions` state stores and
    * commits one delta file per store per micro-batch, so the session
    * default (sized for DATA shuffles — cores locally, hundreds on a
    * cluster) multiplies every micro-batch's fixed cost by a fan-out
    * the state never needs: these replays hold 10²–10³ keys in flight,
    * and at 100 TB the number should track PEAK STATE VOLUME
    * (keys-in-flight / target-keys-per-store), not cluster width —
    * state partitioning is pinned in the checkpoint at first batch, so
    * it cannot ride cluster autoscaling anyway. Locally the measured
    * effect of 32 → 8 is ~2× on every stateful stream row (the
    * per-batch store-commit + task fan-out dominates these cells).
    * Override with spark.graft.stream.statePartitions (conf) or
    * SPARK_GRAFT_STREAM_STATE_PARTITIONS (env) for a production
    * deployment whose in-flight state actually needs more shards. */
  private[graft] def statePartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS"))
      .map(_.trim.toInt)
      .getOrElse(8)

  /** Run `body` (which must START a streaming query synchronously) with
    * `spark.sql.shuffle.partitions` set to [[statePartitions]], then
    * restore the session value. Safe because StreamExecution CLONES the
    * session conf inside `start()` — the stream keeps the reduced
    * value for its whole life (including foreachBatch bodies), while
    * the caller's session is restored before this returns. */
  private[graft] def withStatePartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions(spark).toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Streaming hourly_obs file source (parquet dir, new files appended
    * by the fetcher). */
  def hourlyObsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.schemas.Schemas.hourlyObs)
      .option("maxFilesPerTrigger", 64)
      .parquet(dir)

  /** Incremental hourly→daily Tmax: same semantics as ops.DailyTmax but
    * windowed + watermarked for streaming execution. Emits one row per
    * (station, local-day) per trigger in update mode. */
  def dailyTmaxStream(
      hourly: DataFrame, stationTz: String, watermark: String = "2 days"): DataFrame = {
    val isValid = col("temp_c").isNotNull &&
      (col("qc_flags").bitwiseAND(graft.schemas.QcFlags.OutOfRange) === 0)
    hourly
      // Derive local_ts FIRST, then watermark it: the windowed aggregation
      // below groups on local_ts, and watermark metadata does not survive
      // projection onto a derived column — watermarking ts_utc here would
      // leave the aggregation unwatermarked (append mode rejected at start,
      // unbounded state in update mode).
      .withColumn("local_ts", from_utc_timestamp(col("ts_utc"), stationTz))
      .withWatermark("local_ts", watermark)
      .withColumn("temp_valid", when(isValid, col("temp_c")))
      .withColumn("hour_valid", when(isValid, hour(col("local_ts"))))
      // group by the local calendar day: a 1-day tumbling window over the
      // localized timestamp (window bounds are local-midnight aligned)
      .groupBy(
        window(col("local_ts"), "1 day").as("day"),
        col("station_id"))
      .agg(
        max(col("temp_valid")).as("tmax_c"),
        // exact distinct isn't supported in streaming aggregates, but
        // hours are bounded 0–23, so the distinct-hour count is a 24-bit
        // set: bit_or(1 << hour) merges per-batch partials exactly —
        // EXACT coverage, same value as the batch operator
        coalesce(bit_count(expr("bit_or(shiftleft(1L, hour_valid))")), lit(0))
          .cast("int").as("coverage_hours"),
        expr("bit_or(qc_flags)").as("qc_flags"))
      .select(
        to_date(col("day.start")).as("date_local"),
        col("station_id"),
        col("tmax_c"),
        round(col("tmax_c") * 9.0 / 5.0 + 32.0, 1).as("tmax_f"),
        col("coverage_hours"),
        col("qc_flags"))
  }

  /** Streaming EXACT dedup on ingest — the stateful operator an LLM-data
    * pipeline runs at the front door: emit each document the FIRST time
    * its content fingerprint is seen, drop every later copy, across
    * micro-batches and restarts (state lives in the checkpoint).
    *
    * flatMapGroupsWithState keyed by md5(text): state is one boolean per
    * fingerprint, partitioned by key — at 100 TB the state store shards
    * with the shuffle and never concentrates. Within a batch the
    * min-doc_id copy survives (deterministic; iterator order isn't).
    * No timeout: fingerprints are remembered forever, which is the
    * dedup contract (bound state with a TTL timeout if the corpus has
    * an expiry horizon). */
  def dedupDocsStream(docs: DataFrame): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col("text")).as("fp"), col("doc_id"), col("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2)
            Iterator((first._2, first._3))
          }
      }
      .toDF("doc_id", "text").as[(Long, String)]
  }

  /** Streaming dedup with a BOUNDED retention horizon — the TTL variant
    * of [[dedupDocsStream]] for feeds where duplicates only ever arrive
    * close together (retried ingests, at-least-once upstream queues):
    * a key's fingerprint is remembered only until the event-time
    * watermark passes its arrival time plus `horizon`, then evicted.
    * State is O(keys-per-horizon) instead of O(all keys ever) — the
    * difference between a state store that grows forever and one that
    * plateaus at (ingest rate × horizon).
    *
    * Spark-first: this is exactly `dropDuplicatesWithinWatermark`, the
    * built-in watermark-evicted dedup operator (its state eviction and
    * exactly-once-per-horizon guarantees come with the platform; a
    * flatMapGroupsWithState + EventTimeTimeout re-implementation would
    * carry the same semantics at more code). The contract is one-sided
    * like every gate here: duplicates WITHIN the horizon are dropped
    * with certainty; a duplicate arriving after its predecessor's state
    * was evicted re-admits — callers needing forever-dedup run the
    * admitted stream through the batch [[graft.ops.DedupIndex]] probe.
    */
  def dedupWithinHorizonStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming corpus intake with quality gating: new document files →
    * map-side quality features (the SAME expressions as the batch
    * text_quality_score query, via queries.TextFeatures — a doc scores
    * identically in stream and batch) → threshold filter. Pure
    * map-side: no watermark, no state; the checkpoint's file tracking
    * gives exactly-once admission per input file, so re-running after
    * new files land processes only the new files. */
  def docQualityStream(spark: SparkSession, dir: String,
      minQuality: Double = 0.5, minTokens: Int = 5): DataFrame = {
    val docs = spark.readStream
      .schema(graft.schemas.Schemas.documents)
      .option("maxFilesPerTrigger", 64)
      .parquet(dir)
    graft.queries.TextFeatures.withQualityColumns(docs)
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
  }

  /** Streaming intake with a DEAD-LETTER QUEUE: every document is
    * routed exactly once — passing docs to `outDir/accepted`, failing
    * docs to `outDir/quarantine` WITH their reject reason and scores
    * (the triage queue an operator actually debugs from; a gate that
    * silently drops is unauditable). Both sinks write per-batch
    * GENERATION dirs (`gen=<batchId>` — replay overwrites only itself,
    * the ivfAppendStream discipline), so at-least-once batch replay
    * cannot double-admit or double-quarantine. Scoring is the SAME
    * map-side TextFeatures expressions as the batch query — no state,
    * no watermark, no shuffle inside a batch beyond the two writes. */
  def docQualityDlqStream(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, minQuality: Double = 0.5, minTokens: Int = 5)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val docs = spark.readStream
      .schema(graft.schemas.Schemas.documents)
      .option("maxFilesPerTrigger", 64)
      .parquet(inDir)
    withStatePartitions(spark) { docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val scored = graft.queries.TextFeatures.withQualityColumns(batch.toDF())
          .persist()
        try {
          val pass = col("quality") >= minQuality && col("n_tokens") >= minTokens
          scored.filter(pass)
            .write.mode("overwrite").parquet(s"$outDir/accepted/gen=$batchId")
          scored.filter(!pass)
            .withColumn("reject_reason",
              when(col("n_tokens") < minTokens, lit("too_few_tokens"))
                .otherwise(lit("low_quality")))
            .select(col("doc_id"), col("source"), col("reject_reason"),
              col("quality"), col("n_tokens"))
            .write.mode("overwrite").parquet(s"$outDir/quarantine/gen=$batchId")
        } finally scored.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start() }
  }

  /** Streaming decontamination gate: admit only documents whose trigram
    * overlap with a benchmark Bloom filter (ops/Bloom, built offline
    * from the held-out set) stays below `maxOverlap`. Entirely
    * STATELESS — the filter words ride into the plan as a literal and
    * the overlap count is one Column expression (trigrams via a
    * transform HOF, membership via the same bit tests as the batch
    * query), so the stream needs no watermark, no state store, and no
    * shuffle; each micro-batch is a map-side pass. Bloom false
    * positives can only over-count overlap (reject a clean doc, never
    * admit a contaminated one) — the conservative direction for an
    * intake gate; route rejects to the exact batch check if recall of
    * clean docs matters.
    */
  def decontaminationStream(spark: SparkSession, dir: String,
      bloomWords: Array[Long], mBits: Int, maxOverlap: Int = 10): DataFrame = {
    val docs = spark.readStream
      .schema(graft.schemas.Schemas.documents)
      .option("maxFilesPerTrigger", 64)
      .parquet(dir)
    docs.filter(bloomOverlap(col("text"), bloomWords, mBits) < maxOverlap)
  }

  /** Per-row count of DISTINCT text trigrams that hit the Bloom filter
    * (distinct to match the batch query's per-doc gram de-dup). */
  private[graft] def bloomOverlap(text: org.apache.spark.sql.Column,
      bloomWords: Array[Long], mBits: Int): org.apache.spark.sql.Column = {
    val ws = split(text, " ")
    // guard the short-doc case explicitly: sequence(1, 0) is Spark's
    // DESCENDING [1, 0], whose i=0 would crash element_at under ANSI
    val idx = when(size(ws) >= 3, sequence(lit(1), size(ws) - 2))
      .otherwise(array().cast("array<int>"))
    val gramHashes = transform(idx,
      i => {
        val gram = concat_ws(" ",
          element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))
        conv(substring(md5(gram), 1, 15), 16, 10).cast("long")
      })
    size(filter(array_distinct(gramHashes),
      g => graft.ops.Bloom.mightContain(bloomWords, mBits, g)))
  }

  /** Streaming admission front door against the PERSISTED dedup index
    * (ops/DedupIndex): each micro-batch of incoming documents is
    * stream-static joined with the index tables — LEFT ANTI on the
    * content fingerprint (exact rejection), and with `bandGate` on,
    * one LEFT ANTI per LSH band bucket (reject on ANY shared band:
    * the `minJaccard=None` regime of the batch path — recall over
    * precision, no verification; a stateless stream cannot run the
    * exact-Jaccard aggregate cascade, and for an intake gate
    * over-rejecting is the conservative direction — route rejects to
    * the batch verifier when clean-doc recall matters).
    *
    * Entirely STATELESS: the index is a static side, every batch is
    * map-side hashing (md5 + the fused minhash_sig expression) plus
    * anti joins — no state store, no watermark; band buckets become
    * COLUMNS (one per band, from the same expressions the index
    * stores) so "any band matches" is sequential anti joins instead of
    * an explode + per-doc aggregation. Batch-internal duplicates are
    * [[dedupDocsStream]]'s job; the steady-state pipeline composes
    * admissionStream → dedupDocsStream → DedupIndex.append. */
  def admissionStream(spark: SparkSession, dir: String, indexDir: String,
      bandGate: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = graft.ops.DedupIndex.read(spark, indexDir)
    val docs = spark.readStream
      .schema(graft.schemas.Schemas.documents)
      .option("maxFilesPerTrigger", 64)
      .parquet(dir)
    val cols = docs.columns.map(col).toIndexedSeq
    val exactOk = docs.withColumn("__fp", md5(col("text")))
      .join(idx.fps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
    val out =
      if (!bandGate) exactOk
      else {
        val withSig = exactOk.withColumn("__sig", expr("minhash_sig(text)"))
        // null signature (short/null text) never matches a band — the
        // doc passes the gate, exactly like the batch path's no-bands case
        graft.ops.DedupDocs.bandCols(col("__sig"), idx.rowsPerBand)
          .zipWithIndex.foldLeft(withSig) { case (df, (bc, i)) =>
            df.withColumn(s"__band_$i", bc)
              .join(idx.bands.select(col("bucket").as(s"__band_$i")).distinct(),
                Seq(s"__band_$i"), "left_anti")
              .drop(s"__band_$i")
          }
      }
    out.select(cols: _*)
  }

  /** Open per-user session carried in the state store between
    * micro-batches (epoch millis — the state row stays 32 bytes no
    * matter how long the session runs). */
  /** Pin a chunked file replay's order: FileStreamSource consumes files
    * in modification-time order, and an ORDER-FATAL fold (the Kalman
    * stream) cannot tolerate two chunks tied on mtime from fast
    * sequential writes — give `inDir/c0..c<n-1>`'s files strictly
    * increasing mtimes. The base epoch is an arbitrary constant; only
    * relative order matters to the source. */
  def pinChunkOrder(spark: SparkSession, inDir: String, n: Int,
      prefix: String = "c"): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (i <- 0 until n) {
      hfs.listStatus(new org.apache.hadoop.fs.Path(s"$inDir/$prefix$i"))
        .filter(_.isFile)
        .foreach(st => hfs.setTimes(st.getPath, 1700000000000L + i * 60000L, -1))
    }
  }

  // lastMs = last SEEN event time (advanced by null passthrough rows
  // too — the duplicate guard must drop re-delivered nulls); seeded =
  // whether (x, p) hold a real fold yet, false when the state exists
  // only to carry the watermark past leading nulls
  final case class KalmanState(x: Double, p: Double, lastMs: Long,
      seeded: Boolean = true)
  final case class KalmanPoint(eventType: String, day: java.sql.Timestamp,
      y: Option[Double], level: Option[Double], gain: Option[Double],
      variance: Option[Double])

  /** Streaming local-level Kalman filter — the stateful-stream twin of
    * [[graft.ops.KalmanLevel.perKey]] (w25): state is TWO doubles per
    * key (filtered level x and its variance p), each micro-batch folds
    * its rows in event-time order from the saved state and emits every
    * row's (level, gain, variance) immediately — nothing is held back,
    * so no timeout/flush machinery is needed and an AvailableNow drain
    * emits exactly one output row per input row.
    *
    * Order contract: the recursion is order-SENSITIVE, so rows for a
    * key must arrive across batches in nondecreasing event time (the
    * replay feeds day-ranged files in order; production pairs this
    * with a watermark). A row older than the state's last timestamp is
    * DROPPED — visible in any parity gate as a missing row, never as a
    * silently corrupted fold. The fold spelling is byte-identical to
    * the batch kernel's, so a seam-crossing key reproduces the batch
    * output bit-for-bit (the hash gate rides on it). */
  def kalmanLevelStream(daily: DataFrame, q: Double, r: Double): Dataset[KalmanPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .select(col("event_type"), col("day"), col("y"))
      // Option decode: a null y row (possible when the upstream day
      // aggregate is not null-filtered) PASSES THROUGH with null
      // outputs and state untouched — byte-identical to the batch
      // kernel's ignore-nulls contract, so the twins agree in
      // CARDINALITY too, not just on non-null inputs
      .as[(String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KalmanState, KalmanPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Option[Double])],
         state: GroupState[KalmanState]) =>
          val sorted = rows.toIndexedSeq.sortBy(_._2.getTime)
          var cur = state.getOption
          val out = Vector.newBuilder[KalmanPoint]
          for ((_, day, yOpt) <- sorted) {
            (cur, yOpt) match {
              // late OR re-delivered row: drop. `<=` (not `<`) — the
              // gated daily aggregate guarantees strictly increasing
              // days per key, so a timestamp EQUAL to the saved state's
              // last can only be a duplicate delivery; folding it again
              // would double-apply the update and diverge from the
              // batch kernel for every subsequent row of the key.
              // lastMs is the last SEEN event time — null passthrough
              // rows advance it too (below), so a re-delivered null is
              // dropped like any other duplicate and the one-output-
              // row-per-input cardinality parity holds for nulls
              case (Some(s), _) if day.getTime <= s.lastMs => ()
              case (_, None) =>
                // null observation: passthrough, fold state untouched
                // (the batch kernel ignores nulls) — but the seen
                // watermark advances; `seeded = false` marks a state
                // that exists only to carry the watermark
                cur = Some(cur.map(s => s.copy(lastMs = day.getTime))
                  .getOrElse(KalmanState(0.0, 0.0, day.getTime, seeded = false)))
                out += KalmanPoint(key, day, None, None, None, None)
              case (Some(s), Some(y)) if s.seeded =>
                // spelled exactly as KalmanLevel.perKey
                val pPred = s.p + q
                val kg = pPred / (pPred + r)
                val x = s.x + kg * (y - s.x)
                val p = (1 - kg) * pPred
                cur = Some(KalmanState(x, p, day.getTime, seeded = true))
                out += KalmanPoint(key, day, Some(y), Some(x), Some(kg), Some(p))
              case (_, Some(y)) =>
                cur = Some(KalmanState(y, r, day.getTime, seeded = true))
                out += KalmanPoint(key, day, Some(y), Some(y), Some(1.0), Some(r))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  final case class EwmaAnomState(n: Long, m: Double, v: Double, lastMs: Long)
  final case class EwmaAnomPoint(eventType: String, day: java.sql.Timestamp,
      y: Option[Double], level: Option[Double], z: Option[Double],
      isAnomaly: Option[Boolean])

  /** Streaming EWMA control band — the stateful twin of
    * [[graft.ops.EwmaAnomaly.perKey]]: three doubles of state per key
    * (count, EW mean, EW variance), each row scored against the PRE-
    * update band and folded in, emitted immediately (no timeout/flush
    * machinery — one output row per input row under AvailableNow).
    * Same order contract and `<=`-duplicate guard as
    * [[kalmanLevelStream]]: rows must arrive per key in nondecreasing
    * event time; a row at or before the saved state's last timestamp is
    * dropped VISIBLY. The fold is spelled byte-identically to the batch
    * kernel, so a seam-crossing key reproduces it bit-for-bit. */
  def ewmaAnomalyStream(daily: DataFrame, alpha: Double, zThreshold: Double,
      warmup: Int): Dataset[EwmaAnomPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .select(col("event_type"), col("day"), col("y"))
      .as[(String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaAnomState, EwmaAnomPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Option[Double])],
         state: GroupState[EwmaAnomState]) =>
          val sorted = rows.toIndexedSeq.sortBy(_._2.getTime)
          var cur = state.getOption
          val out = Vector.newBuilder[EwmaAnomPoint]
          for ((_, day, yOpt) <- sorted) {
            (cur, yOpt) match {
              case (Some(s), _) if day.getTime <= s.lastMs => () // duplicate/late: drop
              case (_, None) =>
                // null observation: passthrough with null scores, fold
                // state untouched — but the seen watermark advances so
                // a re-delivered null is dropped by the guard above
                // (n = 0 marks a watermark-only state)
                cur = Some(cur.map(s => s.copy(lastMs = day.getTime))
                  .getOrElse(EwmaAnomState(0L, 0.0, 0.0, day.getTime)))
                out += EwmaAnomPoint(key, day, None, None, None, None)
              case (Some(s), Some(y)) if s.n > 0 =>
                // spelled exactly as EwmaAnomaly.perKey
                val z =
                  if (s.n >= warmup && s.v > 0.0) Some((y - s.m) / math.sqrt(s.v))
                  else None
                val flag = z.exists(zz => math.abs(zz) > zThreshold)
                val d = y - s.m
                val m = s.m + alpha * d
                val v = (1 - alpha) * (s.v + alpha * d * d)
                cur = Some(EwmaAnomState(s.n + 1, m, v, day.getTime))
                out += EwmaAnomPoint(key, day, Some(y), Some(m), z, Some(flag))
              case (_, Some(y)) =>
                cur = Some(EwmaAnomState(1L, y, 0.0, day.getTime))
                out += EwmaAnomPoint(key, day, Some(y), Some(y), None,
                  Some(false))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  final case class HwState(buf: Seq[Double], seeded: Boolean, l: Double,
      b: Double, sea: Seq[Double], idx: Int, lastMs: Long)
  final case class HwPoint(eventType: String, day: java.sql.Timestamp,
      y: Option[Double], yhat: Option[Double], level: Option[Double],
      trend: Option[Double])

  /** Streaming additive Holt–Winters — the stateful twin of
    * [[graft.ops.HoltWinters.perKey]]. The interesting seam property
    * this twin exists to prove: SEEDING may straddle micro-batches —
    * the first m observations can arrive across several triggers, so
    * the warmup buffer itself is part of the keyed state (buf), not
    * just the smoothed (L, B, S) — and the fold still reproduces the
    * batch kernel bit-for-bit. Same order contract and ≤-duplicate
    * guard as [[kalmanLevelStream]]; warmup rows emit null scores, one
    * output row per input row under AvailableNow. */
  def holtWintersStream(daily: DataFrame, m: Int, alpha: Double,
      beta: Double, gamma: Double): Dataset[HwPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .select(col("event_type"), col("day"), col("y"))
      .as[(String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HwState, HwPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Option[Double])],
         state: GroupState[HwState]) =>
          val sorted = rows.toIndexedSeq.sortBy(_._2.getTime)
          var cur = state.getOption
            .getOrElse(HwState(Vector.empty, seeded = false, 0.0, 0.0,
              Vector.empty, 0, Long.MinValue))
          val out = Vector.newBuilder[HwPoint]
          for ((_, day, yOpt) <- sorted) {
            if (day.getTime <= cur.lastMs) () // duplicate/late: drop
            else if (yOpt.isEmpty) {
              // null observation: passthrough, nothing enters the seed
              // buffer or the recursion — but the seen watermark
              // advances, so a re-delivered null is dropped by the
              // guard above (byte parity with the batch kernel's
              // ignore-nulls contract holds: lastMs is never read by
              // the fold, only by the duplicate guard)
              cur = cur.copy(lastMs = day.getTime)
              out += HwPoint(key, day, None, None, None, None)
            } else if (!cur.seeded) {
              val y = yOpt.get
              val buf = cur.buf :+ y
              if (buf.length == m) {
                // spelled exactly as HoltWinters.perKey: left-assoc mean
                var acc = 0.0
                var i = 0
                while (i < m) { acc += buf(i); i += 1 }
                val l = acc / m
                cur = HwState(Vector.empty, seeded = true, l, 0.0,
                  buf.map(_ - l).toVector, 0, day.getTime)
              } else cur = cur.copy(buf = buf, lastMs = day.getTime)
              out += HwPoint(key, day, Some(y), None, None, None)
            } else {
              val y = yOpt.get
              val sTm = cur.sea(cur.idx)
              val yhat = cur.l + cur.b + sTm
              val lNew = alpha * (y - sTm) + (1 - alpha) * (cur.l + cur.b)
              val bNew = beta * (lNew - cur.l) + (1 - beta) * cur.b
              val seaNew = cur.sea.updated(cur.idx,
                gamma * (y - lNew) + (1 - gamma) * sTm)
              cur = HwState(Vector.empty, seeded = true, lNew, bNew,
                seaNew, (cur.idx + 1) % m, day.getTime)
              out += HwPoint(key, day, Some(y), Some(yhat), Some(lNew), Some(bNew))
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }

  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sumValue: Double)

  /** SCD2 state: the currently-open version of one dimension key.
    * valid_from is epoch MICROS — Timestamp.getTime truncates to ms and
    * the emitted boundary must round-trip the feed's µs precision
    * exactly (the batch twin compares raw timestamps). */
  final case class OpenVersion(attr: String, validFromUs: Long, version: Int)

  private def epochMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** One emitted SCD2 version row; `valid_to` is null while the version
    * was still open when the flush deadline passed. */
  final case class Scd2Row(
      user_id: Long, version: Int, attr: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Streaming SCD2 dimension maintenance — the stateful dual of the
    * batch o18_scd2_intervals window query: a keyed change feed folds
    * into slowly-changing-dimension VERSION INTERVALS, consecutive
    * same-attribute changes deduplicated, a closed version (valid_from,
    * valid_to, version) emitted exactly once the moment its successor
    * arrives, and the final OPEN version per key emitted with a null
    * valid_to once the watermark passes `flushAt` (a FIXED event-time
    * deadline past the feed's horizon — per-key deadlines would flush a
    * quiet key early and then double-count its versions when it speaks
    * again; a fixed deadline can never fire while the feed is live).
    *
    * State is ONE OpenVersion per key — bounded, like sessionizeStream
    * — so 10⁹ dimension keys cost 10⁹ small rows sharded with the
    * shuffle, never an event history. Within a micro-batch rows fold in
    * (ts, event_id) order — the batch spelling's exact tie-break — so
    * intra-batch change detection is deterministic; across batches the
    * watermark discipline applies. Emitted intervals are append-only
    * facts (a closed version never mutates), which is what makes this
    * the streaming WRITE PATH of an SCD2 dimension table: downstream
    * as-of joins read (key, valid_from, valid_to) directly. */
  def scd2Stream(
      changes: DataFrame, flushAt: java.sql.Timestamp,
      watermark: String = "1 hour"): Dataset[Scd2Row] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val flushMs = flushAt.getTime
    changes.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenVersion, Scd2Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[OpenVersion]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Scd2Row(uid, s.version, s.attr,
              tsFromMicros(s.validFromUs), null))
          } else {
            // fold in (ts, event_id) — the o18 batch ordering at µs
            // precision — so same-timestamp changes break ties
            // identically
            val sorted = rows.toIndexedSeq.sortBy(r => (epochMicros(r._2), r._3))
            var closed = List.empty[Scd2Row]
            var cur = state.getOption
            for ((_, ts, _, attr) <- sorted) {
              cur match {
                case Some(s) if s.attr == attr => // consecutive dup: no-op
                case Some(s) =>
                  closed ::= Scd2Row(uid, s.version, s.attr,
                    tsFromMicros(s.validFromUs), ts)
                  cur = Some(OpenVersion(attr, epochMicros(ts), s.version + 1))
                case None =>
                  cur = Some(OpenVersion(attr, epochMicros(ts), 1))
              }
            }
            cur.foreach { s =>
              if (flushMs <= state.getCurrentWatermarkMs()) {
                // the flush deadline already passed in event time (rows
                // arriving after the horizon, e.g. the later sentinel):
                // a timeout this old would be rejected — flush inline
                closed ::= Scd2Row(uid, s.version, s.attr,
                  tsFromMicros(s.validFromUs), null)
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(flushMs)
              }
            }
            closed.reverse.iterator
          }
      }
  }

  /** A gap-closed session as emitted downstream. */
  final case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based streaming sessionization — the stateful dual of the batch
    * `pipe_sessionize` window query: events keyed by user, a session
    * closes when `gapSec` of EVENT time passes with nothing from that
    * user, and closed sessions are emitted exactly once (Append mode).
    *
    * flatMapGroupsWithState with EventTimeTimeout: state is ONE open
    * session per active user (bounded — not the event history), sharded
    * with the shuffle at scale; the watermark both drops late input and
    * drives the timeout that flushes a session nobody extended. Within a
    * micro-batch rows are folded in event-time order, closing and
    * emitting intermediate sessions inline, so a batch spanning several
    * gaps yields all of them at once. If a session's deadline already
    * lies behind the current watermark it is closed immediately
    * (setTimeoutTimestamp refuses past deadlines).
    *
    * The last open session per user only flushes once the watermark
    * passes its deadline IN A LATER BATCH — an AvailableNow drain of a
    * finite directory keeps the final sessions in state (correct: more
    * files may land), which is why the spec feeds sentinel batches to
    * close them. */
  def sessionizeStream(
      events: DataFrame, gapSec: Int = 1800,
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession): ClosedSession =
            ClosedSession(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n, s.sumValue)
          if (state.hasTimedOut) {
            val out = close(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // micro-batch iterator order is not defined — fold in event
            // time so intra-batch gap detection is deterministic
            val sorted = rows.toIndexedSeq.sortBy(_._2.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            for ((_, ts, v) <- sorted) {
              val t = ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sumValue + v))
                case Some(s) =>
                  closed ::= close(s)
                  Some(OpenSession(t, t, 1L, v))
                case None =>
                  Some(OpenSession(t, t, 1L, v))
              }
            }
            cur match {
              case Some(s) =>
                val deadline = s.lastMs + gapMs
                if (deadline <= state.getCurrentWatermarkMs()) {
                  // gap already elapsed in event time — close inline,
                  // a timeout this old would be rejected
                  closed ::= close(s)
                  state.remove()
                } else {
                  state.update(s)
                  state.setTimeoutTimestamp(deadline)
                }
              case None => state.remove()
            }
            closed.reverse.iterator
          }
      }
  }

  /** Streaming CDC snapshot maintenance — fold a keyed change feed into
    * a parquet snapshot, one [[graft.ops.Upsert.mergeLatest]] per
    * micro-batch (the MERGE INTO loop of a table format, on plain
    * parquet):
    *
    *  - each batch writes a NEW versioned directory `v<batchId>`, then
    *    repoints the `_CURRENT` pointer file via write-temp + atomic
    *    replace (FileContext rename-with-OVERWRITE where the FS
    *    supports it);
    *  - a reader either sees the old snapshot or the new one, never a
    *    half-written mix, and old versions stay readable (time travel /
    *    caller-driven retention);
    *  - replays are idempotent BOTH ways round the pointer commit: a
    *    batch replayed after a crash *before* commitPointer rewrites
    *    `v<batchId>` from the previous version; one replayed *after*
    *    commitPointer (pointer committed, checkpoint not) finds
    *    `_CURRENT` already at its own version and only re-asserts the
    *    pointer — it must NOT re-merge, since that would read `v<N>`
    *    while overwriting `v<N>`;
    *  - a pointer lost mid-swap (exotic FS without atomic replace)
    *    heals: [[currentVersion]] falls back to the highest version
    *    directory that carries a `_SUCCESS` marker.
    *
    * At scale each merge shuffles O(snapshot keys ∪ batch keys) — the
    * map-side max_by partial collapses batch change history before the
    * exchange; snapshot compaction/partition-pruned rewrite is the
    * caller's retention policy, not this function's job. */
  def snapshotMergeStream(
      changes: DataFrame, snapshotDir: String, checkpoint: String,
      keys: Seq[String], orderBy: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changes.sparkSession
    withStatePartitions(spark) { changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applySnapshotBatch(spark, snapshotDir, batch.toDF(), batchId, keys, orderBy)
      }
      .trigger(Trigger.AvailableNow())
      .start() }
  }

  /** Streaming maintenance of a persisted IVF ANN index
    * ([[graft.ops.IvfIndex]]): each micro-batch of new (vec_id,
    * embedding) rows is assigned with the STORED coarse quantizer and
    * written as its own generation directory — the index stays
    * probeable mid-stream, replay of a batch rewrites only its own
    * generation (idempotent, no commit pointer needed because
    * generations are disjoint by construction), and compaction folds
    * generations back into the base table offline. The quantizer is
    * never refit on-stream: the cell space is index state, exactly as
    * in batch [[graft.ops.IvfIndex.append]]. */
  def ivfAppendStream(
      newVectors: DataFrame, indexDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withStatePartitions(newVectors.sparkSession) { newVectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.IvfIndex.applyAppendBatch(batch.toDF(), indexDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start() }

  /** Streaming maintenance of the persisted BM25 search index
    * ([[graft.ops.SearchIndex]]): each micro-batch of new documents
    * writes its own postings/df/stats GENERATION (`gen=<batchId>` —
    * derived from the batch alone, so replay overwrites only itself;
    * the ivfAppendStream discipline). df and corpus stats are additive,
    * so `SearchIndex.search` over the generational layout scores
    * bit-identically to a one-shot build while ingest runs — retrieval
    * never goes offline for an index rebuild. */
  def searchIndexStream(
      newDocs: DataFrame, indexDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withStatePartitions(newDocs.sparkSession) { newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.SearchIndex.applyGenBatch(batch.toDF(), indexDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start() }

  /** Streaming maintenance of the o28 HLL sketch table: each
    * micro-batch folds its rows into per-(week, day) sketch PARTIALS
    * (hll_sketch_agg over just the batch) written to the batch's OWN
    * generation directory `gen=<batchId>` — idempotent replay, the
    * ivfAppendStream discipline; no state store, no watermark, because
    * HLL union is associative: readers union ALL stored partials, so a
    * day split across micro-batches needs no reconciliation —
    * `hll_union_agg` over its partial rows IS the day's sketch. The
    * streaming write path of the stored-sketch family: distinct-count
    * serving stays O(|sketch rows|) while ingest runs. */
  def hllSketchTableStream(
      events: DataFrame, tableDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withStatePartitions(events.sparkSession) { events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.toDF()
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
            to_date(col("ts")).as("day"))
          .groupBy(col("wk"), col("day"))
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
          .write.mode("overwrite").parquet(s"$tableDir/gen=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start() }

  /** Watermarked STREAM-STREAM inner join — click attribution: each
    * click joins the view (same user) it followed within
    * `windowMinutes`. The state-store contract is what makes this
    * 100 TB-viable: both sides carry a watermark and the join condition
    * bounds click.ts to [view.ts, view.ts + window], so Spark derives a
    * state eviction horizon for BOTH sides — a view older than
    * watermark + window can never match a future click and is dropped;
    * state is O(traffic within the window), not O(stream history).
    * Without the time-range predicate the state would grow forever —
    * that is the failure mode this operator exists to avoid, and
    * StreamJoinSpec pins result-equivalence against the batch join.
    *
    * Both inputs must carry (user_id, event_id, ts). */
  def clickAttributionStream(
      views: DataFrame, clicks: DataFrame, windowMinutes: Int = 10): DataFrame =
    attributionJoin(views, clicks, windowMinutes, "inner")

  /** Left-outer click attribution: the production shape — every view
    * row eventually emits, matched views as they pair, UNMATCHED views
    * with NULL click columns once the watermark passes view_ts +
    * window (the state store can then prove no future click can match,
    * so the row is evicted AND emitted in one step). The funnel
    * question "which impressions never converted?" needs exactly this;
    * an inner join silently drops them. Emission timing is
    * watermark-bound: a view is only reported unmatched after the
    * GLOBAL watermark (min over both inputs, minus the delay) passes
    * its expiry, so tail-of-stream views can stay in state when input
    * ends — callers comparing against a batch left join must restrict
    * to fully-expired views (StreamsSpec pins both halves). */
  def clickAttributionOuterStream(
      views: DataFrame, clicks: DataFrame, windowMinutes: Int = 10): DataFrame =
    attributionJoin(views, clicks, windowMinutes, "left_outer")

  private def attributionJoin(
      views: DataFrame, clicks: DataFrame, windowMinutes: Int,
      joinType: String): DataFrame = {
    val wm = s"$windowMinutes minutes"
    val v = views.withWatermark("ts", wm).alias("v")
    val c = clicks.withWatermark("ts", wm).alias("c")
    v.join(c, expr(
        s"""v.user_id = c.user_id AND
           |c.ts >= v.ts AND
           |c.ts <= v.ts + INTERVAL $windowMinutes MINUTES""".stripMargin),
        joinType)
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"), col("c.event_id").as("click_id"),
        col("v.ts").as("view_ts"), col("c.ts").as("click_ts"))
  }

  /** Streaming distribution-drift monitor: per micro-batch, profile the
    * batch with [[graft.ops.Profile.cells]] and score it against a
    * REFERENCE profile (built offline — e.g. from last month's admitted
    * data) with [[graft.ops.Profile.psi]], appending one row per
    * (batch, segment) to `monitorDir`: (batch_id, seg, n_ref, n_cur,
    * psi, drifted). The pipeline reads the monitor table to quarantine
    * drifted batches BEFORE admission — the streaming form of the
    * `a19_profile_drift` pre-admission check.
    *
    * Scale/correctness notes:
    *  - the reference profile is a sketch (≤ |segments|×bins rows); it
    *    rides into each micro-batch as a static side, so per batch the
    *    work is one map-side-partial hash agg over the batch plus
    *    sketch arithmetic — no state store, no watermark.
    *  - each batch writes its OWN partition directory (batch=N), so
    *    crash replay of a batch overwrites only itself — idempotent,
    *    the same generation discipline as [[ivfAppendStream]].
    *  - PSI is asymmetric-safe here: smoothing keeps empty bins
    *    finite, and a segment unseen in the reference scores maximal
    *    finite drift rather than NaN (Profile.psi contract). */
  def driftMonitorStream(
      docs: DataFrame, refCells: DataFrame, monitorDir: String,
      checkpoint: String, segCol: String, valCol: String,
      bins: Int, lo: Double, width: Double, threshold: Double = 0.2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withStatePartitions(docs.sparkSession) { docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyDriftBatch(batch.toDF(), refCells, monitorDir, batchId,
          segCol, valCol, bins, lo, width, threshold)
      }
      .trigger(Trigger.AvailableNow())
      .start() }

  /** One micro-batch of [[driftMonitorStream]], exposed so replay
    * (same batchId twice) is directly testable. */
  def applyDriftBatch(
      batch: DataFrame, refCells: DataFrame, monitorDir: String,
      batchId: Long, segCol: String, valCol: String,
      bins: Int, lo: Double, width: Double, threshold: Double): Unit = {
    val cur = graft.ops.Profile.cells(batch, segCol, valCol, bins, lo, width)
    graft.ops.Profile.psi(refCells, cur, bins)
      .withColumn("batch_id", lit(batchId))
      .withColumn("drifted", col("psi") > threshold)
      .select(col("batch_id"), col("seg"), col("n_ref"), col("n_cur"),
        col("psi"), col("drifted"))
      .write.mode("overwrite")
      .parquet(s"$monitorDir/batch=$batchId")
  }

  /** One micro-batch of [[snapshotMergeStream]], exposed so crash
    * replay (same batchId twice) is directly testable. */
  def applySnapshotBatch(
      spark: SparkSession, snapshotDir: String, batch: DataFrame,
      batchId: Long, keys: Seq[String], orderBy: Seq[String]): Unit = {
    val version = s"v$batchId"
    val cur = currentVersion(spark, snapshotDir)
    if (cur.contains(version)) {
      // crash landed between commitPointer and the streaming
      // checkpoint's own commit: the batch output is already live.
      // Re-merging would read v<N> while overwriting v<N> (Spark
      // rejects the self-overwrite and the stream would wedge on every
      // restart) — re-assert the pointer and move on
      commitPointer(spark, snapshotDir, version)
    } else {
      val merged = cur.map(v => spark.read.parquet(s"$snapshotDir/$v")) match {
        case Some(snap) => graft.ops.Upsert.mergeLatest(snap, batch, keys, orderBy)
        case None => graft.ops.Upsert.latestPerKey(batch, keys, orderBy)
      }
      merged.write.mode("overwrite").parquet(s"$snapshotDir/$version")
      commitPointer(spark, snapshotDir, version)
    }
  }

  /** Current snapshot version: the `_CURRENT` pointer, or — when the
    * pointer is missing (crash inside a non-atomic swap, or manual
    * damage) — the highest `v<N>` directory whose parquet write
    * completed (`_SUCCESS` present). None before the first commit. */
  private[streaming] def currentVersion(
      spark: SparkSession, snapshotDir: String): Option[String] = {
    val fs = hadoopFs(spark, snapshotDir)
    val ptr = new org.apache.hadoop.fs.Path(snapshotDir, "_CURRENT")
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(v)
    } else {
      val complete = completeVersions(fs, snapshotDir)
      if (complete.isEmpty) None else Some(s"v${complete.max}")
    }
  }

  /** The single definition of a COMPLETE snapshot version: a `v<N>`
    * directory whose parquet write finished (`_SUCCESS` present).
    * Shared by the pointer fallback, time travel, and the version
    * listing so the three can never disagree about what exists. */
  private def completeVersions(
      fs: org.apache.hadoop.fs.FileSystem, snapshotDir: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(snapshotDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(dir, s"$n/_SUCCESS")))
      .map(_.drop(1).toLong)
      .sorted
  }

  /** Current snapshot per [[currentVersion]]; None before the first
    * commit. */
  def readSnapshot(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    currentVersion(spark, snapshotDir)
      .map(version => spark.read.parquet(s"$snapshotDir/$version"))

  /** TIME TRAVEL: read the snapshot as of a specific version (audit,
    * incident forensics, training-data reproduction). Only COMPLETE
    * versions qualify (`_SUCCESS` present — a half-written directory
    * from a crash is not a readable point in history), and versions
    * past the current pointer are refused even if their directories
    * exist (an uncommitted merge is not history either). None when the
    * version was never written or has been vacuumed. */
  def readSnapshotAt(
      spark: SparkSession, snapshotDir: String, version: Long): Option[DataFrame] = {
    val fs = hadoopFs(spark, snapshotDir)
    val cur = currentVersion(spark, snapshotDir).map(_.drop(1).toLong)
    if (completeVersions(fs, snapshotDir).contains(version) && cur.exists(version <= _))
      Some(spark.read.parquet(s"$snapshotDir/v$version"))
    else None
  }

  /** The readable history: complete versions at or below the current
    * pointer, ascending — what time travel can actually serve after
    * crashes and vacuums. */
  def snapshotVersions(spark: SparkSession, snapshotDir: String): Seq[Long] = {
    val fs = hadoopFs(spark, snapshotDir)
    currentVersion(spark, snapshotDir).map(_.drop(1).toLong) match {
      case None => Seq.empty
      case Some(cur) => completeVersions(fs, snapshotDir).filter(_ <= cur)
    }
  }

  /** Retention for the versioned snapshot store: delete all but the
    * `keep` highest version directories — the VACUUM the
    * [[snapshotMergeStream]] layout needs once time travel has served
    * its audit window (every batch adds a full version; without
    * retention the store grows linearly in batches, not in data).
    * Safety rails: the CURRENT version (pointer target, or the
    * highest-complete fallback) is never deleted even if `keep` would
    * exclude it, `keep` ≥ 1 is enforced, and only `v<N>` directories
    * are touched (the pointer files and any foreign dirs are not the
    * vacuum's to delete). Returns the deleted version names. */
  def vacuumSnapshots(
      spark: SparkSession, snapshotDir: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = hadoopFs(spark, snapshotDir)
    val dir = new org.apache.hadoop.fs.Path(snapshotDir)
    if (!fs.exists(dir)) return Seq.empty
    val versions = fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .sortBy(_.drop(1).toLong)
    val current = currentVersion(spark, snapshotDir)
    val doomed = versions.dropRight(keep).filterNot(current.contains)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, v), true)
    }
    doomed
  }

  /** Point `_CURRENT` at `version`: write `_CURRENT.tmp`, close, then
    * atomically replace the pointer (FileContext rename with OVERWRITE
    * — atomic on HDFS and local FS). On file systems without rename
    * semantics the delete+rename fallback leaves a pointer-less window;
    * [[currentVersion]]'s highest-complete-version fallback covers a
    * crash inside it. */
  private def commitPointer(spark: SparkSession, snapshotDir: String, version: String): Unit = {
    val fs = hadoopFs(spark, snapshotDir)
    val tmp = new org.apache.hadoop.fs.Path(snapshotDir, "_CURRENT.tmp")
    val ptr = new org.apache.hadoop.fs.Path(snapshotDir, "_CURRENT")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(ptr),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(ptr)) fs.delete(ptr, false)
        if (!fs.rename(tmp, ptr))
          throw new java.io.IOException(s"pointer swap failed for $snapshotDir -> $version")
    }
  }

  private def hadoopFs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Drain-available-and-stop runner (batch-first engine; streaming is
    * incremental ingestion, not an always-on service). */
  def runAvailableNow(
      out: DataFrame, checkpoint: String, sinkDir: String): Unit = {
    val q = withStatePartitions(out.sparkSession) { out.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start() }
    q.awaitTermination()
  }

  /** In-memory sink variant for tests/inspection (update mode shows
    * in-flight daily rows before the watermark closes them). */
  def runToMemory(out: DataFrame, name: String, checkpoint: String): Unit = {
    val q = withStatePartitions(out.sparkSession) { out.writeStream
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start() }
    q.awaitTermination()
  }
}
