package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Streaming↔batch equivalence, hash-checked in the harness: the
  * watermarked streaming daily-Tmax (streaming/Streams.dailyTmaxStream)
  * run over the SAME cleaned hourly rows as the batch pipeline must
  * produce the SAME daily table — so this entry reuses pipe_daily_max's
  * DuckDB oracle verbatim. The stream executes for real inside the
  * query (file source → Trigger.AvailableNow → memory sink): batch
  * parity is not a spec-only claim, it goes through the driver's
  * rows/schema/hash gate every round.
  *
  * Scale shape: identical to the batch plan up to the stateful
  * aggregation — the streaming agg keys state by (station, local-day
  * window), bounded by days in flight; coverage merges exactly across
  * micro-batches because it is a 24-bit OR-set, not a distinct count.
  */
object StreamQueries {

  private val NY = "America/New_York"

  /** Write `daily` (event_type/flag key, `day` timestamp, `y`) as 4
    * contiguous replay chunk files under `$tmp/in/c0..c3`, with cut
    * boundaries DERIVED from the series' own [min, max] day span (UTC
    * session tz, whole days). A hard-coded cut list would silently
    * drop rows if the generated date range ever moved — the chunks
    * filter the STREAM side only, so the loss would surface as a
    * confusing stream-vs-oracle hash mismatch instead of an error.
    * `firstCutDays` pins the first seam N days after the series start
    * (the Holt–Winters warmup-straddle property needs a seam inside
    * the first m observations); remaining seams split the rest evenly.
    * Chunk positions never change OUTPUT values — the per-key folds
    * carry state across seams and replay order is pinned — only which
    * seam each row crosses. */
  private def writeDayChunks(daily: org.apache.spark.sql.DataFrame,
      tmp: String, firstCutDays: Option[Long] = None): Unit = {
    import daily.sparkSession.implicits._
    val mm = daily.agg(min($"day"), max($"day")).collect()(0)
    val lo = mm.getTimestamp(0).getTime
    val dayMs = 86400000L
    val nd = (mm.getTimestamp(1).getTime - lo) / dayMs + 1
    require(nd >= 8, s"day-chunked replay needs >= 8 days of data, got $nd")
    val o1 = firstCutDays.getOrElse(nd / 4)
    require(o1 > 0 && o1 < nd, s"first cut $o1 outside (0, $nd)")
    val offs = Seq(0L, o1, o1 + (nd - o1) / 3, o1 + 2 * (nd - o1) / 3, nd)
    // ONE write instead of four: the old per-chunk loop re-executed the
    // daily aggregate's whole lineage once per chunk file (4 filtered
    // scans + 4 write jobs). The chunk id is derivable per row from the
    // same cut offsets, so a single partitionBy write produces the same
    // four row sets; dirs are renamed to the c0..c3 layout the replay
    // (and pinChunkOrder, which every caller runs next) expects. Chunk
    // contents are byte-identical per chunk — only which JOB wrote them
    // changed, and replay order still comes from the pinned mtimes.
    val dayOff = floor(($"day".cast("long") - lit(lo / 1000)) / lit(86400L))
    val chunk = when(dayOff < offs(1), 0).when(dayOff < offs(2), 1)
      .when(dayOff < offs(3), 2).otherwise(3)
    daily.withColumn("__c", chunk)
      .repartition($"__c")
      .write.mode("overwrite").partitionBy("__c").parquet(s"$tmp/in_staged")
    val hfs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(daily.sparkSession.sparkContext.hadoopConfiguration)
    hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$tmp/in"))
    for (i <- 0 until 4) {
      val src = new org.apache.hadoop.fs.Path(s"$tmp/in_staged/__c=$i")
      val dst = new org.apache.hadoop.fs.Path(s"$tmp/in/c$i")
      // a chunk can be legitimately empty only if cuts coincide; the
      // replay needs the dir to exist either way
      if (hfs.exists(src)) hfs.rename(src, dst) else hfs.mkdirs(dst)
    }
  }

  /** Write `ev`'s view/click slices as four ascending-mtime week files
    * per side in ONE job per side — the [[writeDayChunks]] discipline
    * applied to the attribution replays (the old per-(side, week) loop
    * re-scanned the filtered events slice 8×, one job per file). Week
    * membership is derived per row from the SAME cut list the loop
    * filtered with, so each file's row set is byte-identical; replay
    * order comes from pinChunkOrder's explicit mtimes (base epoch far
    * in the past, so sentinel files written afterwards always sort
    * later). */
  private def writeWeekSides(ev: org.apache.spark.sql.DataFrame,
      tmp: String, weeks: Seq[String]): Unit = {
    import ev.sparkSession.implicits._
    def cut(i: Int) = lit(weeks(i)).cast("timestamp")
    val wk = when($"ts" < cut(1), 0).when($"ts" < cut(2), 1)
      .when($"ts" < cut(3), 2).otherwise(3)
    val hfs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(ev.sparkSession.sparkContext.hadoopConfiguration)
    for ((side, typ) <- Seq("views" -> "view", "clicks" -> "click")) {
      ev.filter($"event_type" === typ && $"ts" >= cut(0) && $"ts" < cut(4))
        .select($"user_id", $"event_id", $"ts")
        .withColumn("__w", wk)
        .repartition($"__w")
        .write.mode("overwrite").partitionBy("__w").parquet(s"$tmp/${side}_staged")
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$tmp/$side"))
      for (i <- 0 until 4) {
        val src = new org.apache.hadoop.fs.Path(s"$tmp/${side}_staged/__w=$i")
        val dst = new org.apache.hadoop.fs.Path(s"$tmp/$side/w$i")
        if (hfs.exists(src)) hfs.rename(src, dst) else hfs.mkdirs(dst)
      }
      graft.streaming.Streams.pinChunkOrder(ev.sparkSession, s"$tmp/$side", 4, "w")
    }
  }

  def all: Seq[OracleQuery] = Seq(
    OracleQuery(
      "stream_daily_tmax",
      (s, d) => {
        import s.implicits._
        // stage 1, batch side (same spelling as pipe_daily_max): dedup
        // keep-first + QC flags, shaped as hourly_obs columns
        val cleaned = Tables.events(s, d)
          .groupBy($"user_id", $"ts")
          .agg(min_by($"value", $"event_id").as("value"))
          .withColumn("qc_flags",
            when($"value".isNull, 1).otherwise(0)
              .bitwiseOR(when($"value" < 0.0 || $"value" > 180.0, 2).otherwise(0))
              .cast("long"))
          .select(
            $"ts".as("ts_utc"),
            $"user_id".cast("string").as("station_id"),
            $"value".as("temp_c"),
            $"qc_flags")
        val tmp = graft.core.Scratch.dir("stream_daily", d)
        cleaned.write.mode("overwrite").parquet(s"$tmp/hourly")
        // stage 2, the real stream: file source over the cleaned rows,
        // drained with Trigger.AvailableNow into a memory sink
        val src = s.readStream.schema(cleaned.schema)
          .option("maxFilesPerTrigger", 2) // force several micro-batches:
          // state merge across batches is part of what's being checked
          .parquet(s"$tmp/hourly")
        val name = s"stream_daily_tmax_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        graft.streaming.Streams.runToMemory(
          graft.streaming.Streams.dailyTmaxStream(src, NY), name, s"$tmp/ckpt")
        // stage 3: project the streamed table onto pipe_daily_max's
        // exact output schema (vmax_f recomputed from the ROUNDED vmax,
        // matching the batch order of operations)
        s.table(name)
          .filter($"tmax_c".isNotNull)
          .select(
            $"date_local".cast("timestamp").as("date_local"),
            $"station_id".cast("long").as("user_id"),
            round($"tmax_c", 4).as("vmax"),
            $"coverage_hours".cast("long").as("coverage_hours"),
            $"qc_flags".cast("int").as("qc_flags"))
          .withColumn("vmax_f", round($"vmax" * 9.0 / 5.0 + 32.0, 1))
          .withColumn("low_coverage", ($"coverage_hours" < 18).cast("int"))
          .orderBy($"date_local", $"user_id")
      },
      // pipe_daily_max's oracle, verbatim — THE equivalence statement
      PipelineQueries.all.find(_.name == "pipe_daily_max").get.oracle
    ),

    // Stream-stream join, oracle-gated: the watermarked click-attribution
    // join (streaming/Streams.clickAttributionStream) runs FOR REAL over
    // view/click slices of the events table (file sources, several
    // micro-batches, parquet sink) and its output must hash-match the
    // plain batch join DuckDB computes over the same slices — the
    // cross-micro-batch state handoff is exactly what's on trial. The
    // output aggregates to per-user counts + first/last click ids so the
    // checked frame stays bounded while still pinning the full match set
    // (count + min + max over click_id/view_id pairs detects any
    // missing/extra match).
    OracleQuery(
      "stream_click_attribution",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).filter($"user_id" < 200)
        val tmp = graft.core.Scratch.dir("stream_join", d)
        // Arrival order is part of stream-stream join SEMANTICS: the
        // watermark evicts views past (wm − window), so files must
        // arrive roughly in event-time order — exactly how a real
        // ingest lands hourly/daily drops. Each side is written as
        // sequential week-ranged files (ascending modification times →
        // the file source replays them in order; per-source lateness is
        // zero, so no valid match is ever evicted early, while matches
        // still span micro-batch boundaries at every week seam).
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        writeWeekSides(ev, tmp, weeks)
        def src(dir: String) = s.readStream
          .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$dir/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.clickAttributionStream(
            src(s"$tmp/views"), src(s"$tmp/clicks"), windowMinutes = 240),
          s"$tmp/ckpt", s"$tmp/out")
        s.read.parquet(s"$tmp/out")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_pairs"),
            min($"view_id").as("min_view"), max($"view_id").as("max_view"),
            min($"click_id").as("min_click"), max($"click_id").as("max_click"))
          .orderBy($"user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, ts FROM events
             |  WHERE event_type = 'view' AND user_id < 200
             |), c AS (
             |  SELECT user_id, event_id, ts FROM events
             |  WHERE event_type = 'click' AND user_id < 200
             |), pairs AS (
             |  SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
             |  FROM v JOIN c ON v.user_id = c.user_id
             |    AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE
             |)
             |SELECT user_id, count(*) AS n_pairs,
             |  min(view_id) AS min_view, max(view_id) AS max_view,
             |  min(click_id) AS min_click, max(click_id) AS max_click
             |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // LEFT-OUTER stream-stream join, oracle-gated: the production
    // attribution shape — unmatched views must EMIT (null click) once
    // the watermark proves no future click can match, which is the
    // state-eviction semantics an inner join never exercises. Same
    // week-file replay as stream_click_attribution. The gate covers the
    // FULL output — including the stream's tail, which is exactly the
    // state the eviction semantics exist for: two far-future sentinel
    // files per SIDE (the stream_sessionize two-sentinel discipline;
    // the global watermark is the MIN across sides, so both sides must
    // advance) push the watermark past every real view's expiry
    // (Jan 31 + 4 h ≪ Mar 1 − 4 h), and outer emission happens while
    // the later sentinel batches drain — no output cutoff, the batch
    // LEFT JOIN is the exact oracle over ALL views. Unmatched emission
    // rides the n_unmatched column: any view DROPPED (eviction without
    // emission) or DUPLICATED (emission without eviction) moves a count
    // and fails the hash. Sentinels use user −1 (no real user) and are
    // dropped from the gated output.
    OracleQuery(
      "stream_click_attribution_outer",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).filter($"user_id" < 200)
        val tmp = graft.core.Scratch.dir("stream_ojoin", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        writeWeekSides(ev, tmp, weeks)
        // sentinel files LAST on BOTH sides (their natural mtimes sit
        // far after the week files' pinned base epoch → replayed last):
        // after the first pair the global watermark is
        // Mar1 − 4h (past every real expiry); the second pair's batches
        // perform the eviction-and-emit
        for ((side, st) <- Seq("views", "clicks").flatMap(sd =>
            Seq("2024-03-01", "2024-03-02").zipWithIndex.map {
              case (t, i) => (s"$sd/z$i", t) })) {
          Seq((-1L, 0L, java.sql.Timestamp.valueOf(s"$st 00:00:00")))
            .toDF("user_id", "event_id", "ts")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/$side")
        }
        def src(dir: String) = s.readStream
          .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$dir/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.clickAttributionOuterStream(
            src(s"$tmp/views"), src(s"$tmp/clicks"), windowMinutes = 240),
          s"$tmp/ckpt", s"$tmp/out")
        s.read.parquet(s"$tmp/out")
          .filter($"user_id" >= 0)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_rows"),
            sum(when($"click_id".isNull, 1L).otherwise(0L)).as("n_unmatched"),
            min($"view_id").as("min_view"), max($"view_id").as("max_view"),
            min($"click_id").as("min_click"), max($"click_id").as("max_click"))
          .orderBy($"user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, ts FROM events
             |  WHERE event_type = 'view' AND user_id < 200
             |), c AS (
             |  SELECT user_id, event_id, ts FROM events
             |  WHERE event_type = 'click' AND user_id < 200
             |), pairs AS (
             |  SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
             |  FROM v LEFT JOIN c ON v.user_id = c.user_id
             |    AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE
             |)
             |SELECT user_id, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unmatched,
             |  min(view_id) AS min_view, max(view_id) AS max_view,
             |  min(click_id) AS min_click, max(click_id) AS max_click
             |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // Stateful gap sessionization AS A STREAM, oracle-gated: the
    // flatMapGroupsWithState sessionizer (streaming/Streams.
    // sessionizeStream — one OpenSession row of state per active user,
    // event-time timeout) drains the week-file replay and its closed
    // sessions must reproduce the batch lag→gap→running-sum spelling
    // DuckDB computes (pipe_sessionize's machinery, here aggregated to
    // session-level boundaries). What's on trial is the state handoff:
    // a session spanning a micro-batch seam must merge (not split), an
    // intra-batch gap must split (not merge), and a user's FINAL
    // session must flush via the watermark timeout — two sentinel
    // files (user −1, far-future ts) advance the watermark past every
    // real deadline, because the timeout fires one batch AFTER the
    // watermark passes it (the SessionizeStreamSpec two-sentinel
    // discipline). The gate then needs NO cutoff: every real session
    // provably emits, exactly once — a dropped, split, or doubled
    // session moves n_sessions/n_events/boundary columns and fails the
    // hash. All gated columns are counts and timestamps (exact algebra;
    // the fp sum_value column is spec territory, not hash territory).
    // Input ts is pre-truncated to MILLISECONDS and the oracle's gap is
    // spelled in exact ms: the state row carries epoch millis, so the
    // stream's native gap test is trunc_ms(t)−trunc_ms(prev) > 1800000
    // — a seconds-spelled oracle would flip sub-second gap boundaries.
    OracleQuery(
      "stream_sessionize",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).filter($"user_id" < 200)
          .withColumn("ts", date_trunc("MILLISECOND", $"ts"))
        val tmp = graft.core.Scratch.dir("stream_sess", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        for (i <- 0 until 4) {
          ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
              $"ts" < lit(weeks(i + 1)).cast("timestamp"))
            .select($"user_id", $"ts", $"value")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
        }
        // sentinel files LAST (ascending mod times → replayed last):
        // watermark reaches Mar1−1h after the first, timeouts for every
        // January deadline fire while processing the second
        for ((st, i) <- Seq("2024-03-01", "2024-03-02").zipWithIndex) {
          Seq((-1L, java.sql.Timestamp.valueOf(s"$st 00:00:00"), 0.0))
            .toDF("user_id", "ts", "value")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/z$i")
        }
        val src = s.readStream
          .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.sessionizeStream(
            src, gapSec = 1800, watermark = "1 hour").toDF(),
          s"$tmp/ckpt", s"$tmp/out")
        s.read.parquet(s"$tmp/out")
          .filter($"user_id" >= 0)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum($"n_events").as("n_events"),
            min($"session_start").as("first_start"),
            max($"session_end").as("last_end"),
            max($"n_events").as("max_session_events"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('ms', ts) AS ts
             |  FROM events WHERE user_id < 200
             |), seq AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |      OR date_diff('ms',
             |           lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM e
             |), sess AS (
             |  SELECT user_id, ts,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM seq
             |), agg AS (
             |  SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end,
             |    count(*) AS n_ev
             |  FROM sess GROUP BY 1, 2
             |)
             |SELECT user_id, count(*) AS n_sessions,
             |  CAST(sum(n_ev) AS BIGINT) AS n_events,
             |  min(s_start) AS first_start, max(s_end) AS last_end,
             |  CAST(max(n_ev) AS BIGINT) AS max_session_events
             |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // Streaming SCD2 dimension maintenance, oracle-gated against the
    // BATCH interval spelling (o18_scd2_intervals' window query and its
    // oracle VERBATIM): the change feed folds into version intervals AS
    // A STREAM (streaming/Streams.scd2Stream — one OpenVersion row of
    // state per key, consecutive-dup changes ignored, closed versions
    // emitted exactly once when their successor arrives), and the
    // per-user version census must reproduce the lag-dedup → lead →
    // row_number batch computation. What's on trial: intra-batch change
    // detection under the (ts, event_id) tie-break, version continuity
    // across micro-batch seams, and the open-version flush — a FIXED
    // Apr-1 flush deadline (past the January feed, so it can never fire
    // while the feed is live and double-count a quiet key) driven past
    // by two May sentinel files. A dropped, split, or re-opened version
    // moves n_versions/n_open/closed_dwell_sec and fails the hash.
    OracleQuery(
      "stream_scd2",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).filter($"user_id" < 50)
        val tmp = graft.core.Scratch.dir("stream_scd2", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        for (i <- 0 until 4) {
          ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
              $"ts" < lit(weeks(i + 1)).cast("timestamp"))
            .select($"user_id", $"ts", $"event_id", $"event_type")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
        }
        for ((st, i) <- Seq("2024-05-01", "2024-05-02").zipWithIndex) {
          Seq((-1L, java.sql.Timestamp.valueOf(s"$st 00:00:00"), 0L, "z"))
            .toDF("user_id", "ts", "event_id", "event_type")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/z$i")
        }
        val src = s.readStream
          .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.scd2Stream(
            src, java.sql.Timestamp.valueOf("2024-04-01 00:00:00")).toDF(),
          s"$tmp/ckpt", s"$tmp/out")
        s.read.parquet(s"$tmp/out")
          .filter($"user_id" >= 0)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_versions"),
            sum(when($"valid_to".isNull, 1L).otherwise(0L)).as("n_open"),
            max($"version").cast("long").as("last_version"),
            expr("sum(CASE WHEN valid_to IS NOT NULL THEN unix_micros(valid_to) - unix_micros(valid_from) END) DIV 1000000")
              .as("closed_dwell_sec"))
          .orderBy($"user_id")
      },
      // the batch o18 oracle verbatim — the stream must be its equal
      Some("""WITH ordered AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events WHERE user_id < 50
             |), changes AS (
             |  SELECT user_id, ts, event_id, event_type FROM ordered
             |  WHERE prev_type IS NULL OR prev_type <> event_type
             |), versioned AS (
             |  SELECT user_id, ts AS valid_from,
             |    lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
             |  FROM changes
             |)
             |SELECT user_id, count(*) AS n_versions,
             |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             |  CAST(max(version) AS BIGINT) AS last_version,
             |  CAST(sum(CASE WHEN valid_to IS NOT NULL
             |        THEN epoch_us(valid_to) - epoch_us(valid_from) END) // 1000000 AS BIGINT)
             |    AS closed_dwell_sec
             |FROM versioned GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // Streaming maintenance of the stored HLL sketch table
    // (o28's streaming write path): each micro-batch folds into
    // per-(week, day) sketch PARTIALS in its own generation directory
    // (idempotent replay, the ivfAppendStream discipline) — no state
    // store, no watermark, because HLL union is ASSOCIATIVE: a day
    // split across micro-batches needs no reconciliation, readers just
    // union all stored partials. The gate then answers the o28
    // question — per-week + total distinct users — from the STREAMED
    // table and must land inside the HLL bound of the exact distincts
    // (o28's oracle verbatim): a partial lost to a batch seam, a
    // double-folded replay, or a broken binary round-trip moves the
    // estimate outside the bound and fails the hash.
    OracleQuery(
      "stream_hll_sketch_table",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val tmp = graft.core.Scratch.dir("stream_hll", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        for (i <- 0 until 4) {
          ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
              $"ts" < lit(weeks(i + 1)).cast("timestamp"))
            .select($"user_id", $"ts")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
        }
        val src = s.readStream
          .schema("user_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams
          .hllSketchTableStream(src, s"$tmp/table", s"$tmp/ckpt")
          .awaitTermination()
        val sk = s.read.parquet(s"$tmp/table")
        def grained(df: org.apache.spark.sql.DataFrame) = df.select(
          (coalesce(date_format($"wk", "yyyy-MM-dd"), lit("total")).as("grain") +:
            df.columns.filter(_ != "wk").map(col)): _*)
        val est = grained(
          sk.groupBy($"wk")
            .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
            .unionByName(
              sk.agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
                .select(lit(null).cast("timestamp").as("wk"), $"est")))
        val exact = grained(
          ev.select($"user_id", date_trunc("week", $"ts").as("wk"))
            .groupBy($"wk").agg(countDistinct($"user_id").as("n_exact"))
            .unionByName(
              ev.agg(countDistinct($"user_id").as("n_exact"))
                .select(lit(null).cast("timestamp").as("wk"), $"n_exact")))
        exact.join(est, Seq("grain"))
          .select($"grain", $"n_exact",
            (abs($"est" - $"n_exact") <= $"n_exact" * 0.05).as("within_bound"))
          .orderBy($"grain")
      },
      Some("""WITH wku AS (
             |  SELECT DISTINCT date_trunc('week', ts) AS wk, user_id FROM events
             |), wks AS (
             |  SELECT strftime(wk, '%Y-%m-%d') AS grain,
             |    CAST(count(*) AS BIGINT) AS n_exact
             |  FROM wku GROUP BY 1
             |), tot AS (
             |  SELECT 'total' AS grain,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
             |  FROM events
             |)
             |SELECT grain, n_exact, TRUE AS within_bound
             |FROM (SELECT * FROM wks UNION ALL SELECT * FROM tot)
             |ORDER BY grain""".stripMargin)
    ),

    // Streaming sliding-window distinct users, oracle-gated against the
    // batch spelling: the 7-day/1-day-slide WAU series computed AS A
    // STREAM — sliding `window()` fan-out, stateful dropDuplicates on
    // (window, user), then the per-window count — over several forced
    // micro-batches must hash-match w17's day-spine oracle. What's on
    // trial is the cross-micro-batch dedup state: a user seen in batch
    // 1 must not recount in batch 3 for the same window. (Streaming
    // distinct-count aggregations don't exist in any engine; the
    // dedup-then-count decomposition is THE scalable spelling, batch or
    // stream.) Report day = window.end − 1 day; UTC session, epoch-
    // aligned slides → calendar days align with the batch spine, which
    // clamps to full windows inside the observed span.
    OracleQuery(
      "stream_wau",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"ts", $"user_id")
        val b = ev.agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1")).head()
        val (d0, d1) = (b.getDate(0), b.getDate(1))
        val tmp = graft.core.Scratch.dir("stream_wau", d)
        ev.write.mode("overwrite").parquet(s"$tmp/events")
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2) // several micro-batches: the
          // cross-batch dedup state merge is the thing being checked
          .parquet(s"$tmp/events")
        val windowed = src
          .select(window($"ts", "7 days", "1 day").as("w"), $"user_id")
          .dropDuplicates("w", "user_id")
          .groupBy($"w").agg(count(lit(1)).as("wau"))
        val name = s"stream_wau_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        graft.streaming.Streams.runToMemory(windowed, name, s"$tmp/ckpt")
        s.table(name)
          .select(date_add($"w.end".cast("date"), -1).as("rday"), $"wau")
          .filter($"rday".between(
            java.sql.Date.valueOf(d0.toLocalDate.plusDays(6)), d1))
          .select($"rday".cast("timestamp").as("rday"), $"wau")
          .orderBy($"rday")
      },
      // w17's oracle, verbatim — THE equivalence statement
      WindowQueries.all.find(_.name == "w17_rolling_distinct").get.oracle
    ),

    // Streaming CDC snapshot maintenance, oracle-gated against the
    // batch upsert: the whole event log flows through
    // snapshotMergeStream in several forced micro-batches (6 files, 2
    // per trigger), each folding into the versioned parquet snapshot
    // behind its atomic pointer; the FINAL snapshot must hash-match
    // o11_upsert_merge's DuckDB oracle. What's on trial is the
    // cross-batch merge algebra: latest-per-key is an argmax, so batch
    // boundaries and arrival order must not matter — a stale row
    // arriving in a later batch must lose to the snapshot row (the
    // SnapshotMergeStreamSpec case), and the unique (ts, event_id)
    // order makes the argmax total, so streaming and batch agree
    // exactly. The per-batch merge shuffles O(snapshot ∪ batch keys)
    // with map-side collapse of the batch's own history.
    OracleQuery(
      "stream_upsert_snapshot",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
        val tmp = graft.core.Scratch.dir("stream_snap", d)
        ev.repartition(6).write.mode("overwrite").parquet(s"$tmp/in")
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(s"$tmp/in")
        graft.streaming.Streams
          .snapshotMergeStream(src, s"$tmp/snap", s"$tmp/ckpt",
            keys = Seq("user_id", "event_type"), orderBy = Seq("ts", "event_id"))
          .awaitTermination()
        graft.streaming.Streams.readSnapshot(s, s"$tmp/snap").get
          .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
          .orderBy($"user_id", $"event_type")
      },
      // o11's oracle, verbatim — the batch/stream equivalence statement
      CoreQueries.all.find(_.name == "o11_upsert_merge").get.oracle
    ),

    // Streaming exact dedup with bounded state, oracle-gated: a corpus
    // with every 5th event RE-EMITTED (exact copies — the at-least-once
    // delivery shape) flows through dropDuplicatesWithinWatermark in
    // week-ordered micro-batches; the surviving stream, aggregated per
    // type, must hash-match the clean corpus. What's on trial is the
    // STATE-EVICTION contract: plain dropDuplicates holds every key
    // forever (OOM at 100 TB); the watermark variant keeps only keys
    // newer than watermark−horizon, so state is bounded by arrival
    // skew — and a duplicate arriving inside the horizon (here: copies
    // land in the same file as their original) must still be dropped
    // across batch boundaries. Value sums ride 1e-6 longs (order-free).
    OracleQuery(
      "stream_dedup_watermark",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        val dup = ev.unionAll(ev.filter($"event_id" % 5 === 0))
        val tmp = graft.core.Scratch.dir("stream_dedup", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        for (i <- 0 until 4) {
          val thisWeek = dup.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
            $"ts" < lit(weeks(i + 1)).cast("timestamp"))
          // CROSS-BATCH duplicates: re-emit the PREVIOUS week's final
          // hour into THIS week's file. Those copies arrive one
          // micro-batch after their originals but still inside the
          // horizon (watermark after batch i−1 = maxTs(i−1) − 1h ≤
          // their event time), so only dedup state that SURVIVES the
          // batch seam drops them — a per-batch-reset dedup would
          // re-emit every one and inflate the counts under the gate
          val withCross =
            if (i == 0) thisWeek
            else thisWeek.unionAll(ev.filter(
              $"ts" >= (lit(weeks(i)).cast("timestamp") - expr("INTERVAL 1 HOUR")) &&
                $"ts" < lit(weeks(i)).cast("timestamp")))
          withCross.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
        }
        val src = s.readStream.schema(dup.schema)
          .option("maxFilesPerTrigger", 1) // one week per micro-batch:
          // dedup state must survive batch boundaries, then evict
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.dedupWithinHorizonStream(
            src, Seq("event_id"), "ts", "1 hour"),
          s"$tmp/ckpt", s"$tmp/out")
        s.read.parquet(s"$tmp/out")
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"),
            (sum(floor($"value" * 1000000.0 + 0.5).cast("long"))
              .cast("double") / 1000000.0).as("sum_value"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             |    / 1000000.0 AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Streaming windowed top-k, oracle-gated: hourly event-type counts
    // maintained AS A STREAM (tumbling window() agg, append mode — a
    // window's row emits exactly once, when the watermark passes its
    // end), then ranked top-3 per hour in a batch pass over the sink.
    // On trial vs stream_wau (complete-mode memory sink): APPEND-mode
    // watermark-expiry emission COMPLETENESS across micro-batch seams —
    // every hourly window of the month must flush exactly once into the
    // parquet sink (drop one and its rank rows vanish; emit one twice
    // and counts double), driven by two far-future sentinel files (the
    // stream_sessionize recipe: state flushes one batch AFTER the
    // watermark passes it, so the LAST sentinel's own window never
    // emits and real windows all do). Ranking stays batch-side — no
    // engine has streaming rank; count-then-rank is THE scalable
    // decomposition, and the count state is keyed by (window, type),
    // bounded by hours-in-flight × type cardinality.
    OracleQuery(
      "stream_topk_windowed",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"ts", $"event_type")
        val tmp = graft.core.Scratch.dir("stream_topk", d)
        val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
        for (i <- 0 until 4) {
          ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
              $"ts" < lit(weeks(i + 1)).cast("timestamp"))
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
        }
        for ((st, i) <- Seq("2024-03-01", "2024-03-02").zipWithIndex) {
          Seq((java.sql.Timestamp.valueOf(s"$st 00:00:00"), "zz"))
            .toDF("ts", "event_type")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/z$i")
        }
        val src = s.readStream
          .schema("ts TIMESTAMP, event_type STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        val counts = src
          .withWatermark("ts", "1 hour")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .count()
        graft.streaming.Streams.runAvailableNow(counts, s"$tmp/ckpt", s"$tmp/out")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"wstart").orderBy($"n".desc, $"event_type")
        s.read.parquet(s"$tmp/out")
          .filter($"event_type" =!= "zz")
          .select($"window.start".as("wstart"), $"event_type", $"count".as("n"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .orderBy($"wstart", $"rn")
      },
      Some("""WITH c AS (
             |  SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2
             |), r AS (
             |  SELECT wstart, event_type, n,
             |    CAST(row_number() OVER (PARTITION BY wstart
             |      ORDER BY n DESC, event_type) AS INT) AS rn
             |  FROM c
             |)
             |SELECT wstart, event_type, n, rn
             |FROM r WHERE rn <= 3 ORDER BY wstart, rn""".stripMargin)
    ),

    // Streaming local-level Kalman filter, hash-gated against the
    // BATCH oracle verbatim (WindowQueries.kalmanLevelOracle — the w25
    // recursive CTE): the daily frame replays as four day-ranged
    // micro-batches and Streams.kalmanLevelStream folds each key's
    // recursion across the batch seams from two doubles of state. The
    // trial is the state handoff for an ORDER-SENSITIVE numeric
    // recursion — where sessionization could merge a seam-split
    // session after the fact, a Kalman fold that loses or re-orders
    // one seam row diverges on every subsequent level and fails the
    // hash. Outputs emit in the batch that consumed their input (no
    // holdback), so the finite drain needs no sentinel flush; the fold
    // spelling is byte-identical to ops/KalmanLevel, which is what
    // makes bit-level parity with the batch oracle possible at all.
    OracleQuery(
      "stream_kalman_level",
      (s, d) => {
        import s.implicits._
        // null filter upstream (the w25 oracle-parity contract) +
        // persist: the four cut writes would otherwise re-aggregate the
        // whole events table once each
        val daily = Tables.events(s, d).filter($"value".isNotNull)
          .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
          .persist()
        val tmp = graft.core.Scratch.dir("stream_kalman", d)
        writeDayChunks(daily, tmp)
        daily.unpersist()
        // the Kalman fold (unlike sessionize) is order-FATAL across
        // seams — pin the replay order against mtime ties
        graft.streaming.Streams.pinChunkOrder(s, s"$tmp/in", 4)
        val src = s.readStream
          .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.kalmanLevelStream(src, q = 0.5, r = 4.0).toDF(),
          s"$tmp/ckpt", s"$tmp/out")
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        s.read.parquet(s"$tmp/out")
          .select($"eventType".as("event_type"), $"day", round($"y", 4).as("y"),
            r4($"level").as("level"), r4($"gain").as("gain"),
            r4($"variance").as("variance"))
          .orderBy($"event_type", $"day")
      },
      Some(WindowQueries.kalmanLevelOracle)
    ),

    // Streaming Holt–Winters — the seasonal smoother as a stateful
    // stream, and the twin with the hardest seam property in the
    // family: SEEDING (the first 7 observations) deliberately straddles
    // micro-batch boundaries here (the first chunk cut leaves every
    // flag's warmup buffer partially filled), so the warmup buffer
    // itself must live in keyed state — get that wrong and every
    // subsequent forecast of the key diverges. Gated against the SAME
    // recursive-CTE oracle as the batch entry (w28): stream, batch
    // kernel and oracle share one byte-identical fold.
    OracleQuery(
      "stream_holt_winters",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("event_type"),
            date_trunc("day", $"l_shipdate").as("day"))
          .agg((sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")) / lit(100.0))
            .as("y"))
          .persist()
        val tmp = graft.core.Scratch.dir("stream_hw", d)
        // first cut 3 days in: every flag's 7-row warmup buffer is
        // mid-fill at the first seam — the property under test
        writeDayChunks(daily, tmp, firstCutDays = Some(3L))
        daily.unpersist()
        graft.streaming.Streams.pinChunkOrder(s, s"$tmp/in", 4)
        val src = s.readStream
          .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams
            .holtWintersStream(src, m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
            .toDF(),
          s"$tmp/ckpt", s"$tmp/out")
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        s.read.parquet(s"$tmp/out")
          .filter($"yhat".isNotNull)
          .select($"eventType".as("flag"), $"day", r4($"y").as("y"),
            r4($"yhat").as("yhat"), r4($"level").as("level"),
            r4($"trend").as("trend"))
          .orderBy($"flag", $"day")
      },
      Some(StatsQueries.holtWintersOracle)
    ),

    // Streaming EWMA control band — the anomaly MONITOR the platform
    // runs on live metric streams (error rates, revenue, latency):
    // each day's value is z-scored against the exponentially-weighted
    // mean AND variance of that key's own history (threshold adapts to
    // per-key volatility — the upgrade over w5's fixed spike rule),
    // then folded in. State is three doubles per key; one output row
    // per input row, nothing held back. Replayed in 4 ordered chunks
    // so every key's fold crosses micro-batch seams; gated against the
    // recursive-CTE spelling of the SAME fold (the stream, the batch
    // kernel ops/EwmaAnomaly and the oracle share one byte-identical
    // recursion — +,*,/ and IEEE-exact sqrt only, so all three agree
    // bit-for-bit and round4 merely displays).
    OracleQuery(
      "stream_ewma_anomaly",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d).filter($"value".isNotNull)
          .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
          .persist()
        val tmp = graft.core.Scratch.dir("stream_ewma", d)
        writeDayChunks(daily, tmp)
        daily.unpersist()
        // order-FATAL fold (like kalman): pin the replay order
        graft.streaming.Streams.pinChunkOrder(s, s"$tmp/in", 4)
        val src = s.readStream
          .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams
            .ewmaAnomalyStream(src, alpha = 0.25, zThreshold = 3.0, warmup = 3)
            .toDF(),
          s"$tmp/ckpt", s"$tmp/out")
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        s.read.parquet(s"$tmp/out")
          .select($"eventType".as("event_type"), $"day", round($"y", 4).as("y"),
            r4($"level").as("level"), r4($"z").as("z"),
            $"isAnomaly".as("is_anomaly"))
          .orderBy($"event_type", $"day")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT event_type, date_trunc('day', ts) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
             |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
             |), pos AS (
             |  SELECT event_type, day, y,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
             |  FROM daily
             |), rec AS (
             |  SELECT event_type, day, y, rn,
             |    CAST(1 AS BIGINT) AS n, y AS m, CAST(0.0 AS DOUBLE) AS v,
             |    CAST(NULL AS DOUBLE) AS z, FALSE AS anom
             |  FROM pos WHERE rn = 1
             |  UNION ALL
             |  SELECT p.event_type, p.day, p.y, p.rn,
             |    r.n + 1,
             |    r.m + 0.25 * (p.y - r.m),
             |    0.75 * (r.v + 0.25 * (p.y - r.m) * (p.y - r.m)),
             |    CASE WHEN r.n >= 3 AND r.v > 0 THEN (p.y - r.m) / sqrt(r.v) END,
             |    CASE WHEN r.n >= 3 AND r.v > 0
             |      THEN abs((p.y - r.m) / sqrt(r.v)) > 3.0 ELSE FALSE END
             |  FROM rec r JOIN pos p
             |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
             |)
             |SELECT event_type, day, round(y, 4) AS y,
             |  floor(m * 10000 + 0.5) / 10000 AS level,
             |  floor(z * 10000 + 0.5) / 10000 AS z,
             |  anom AS is_anomaly
             |FROM rec ORDER BY event_type, day""".stripMargin)
    ),

    // CDC snapshot maintenance WITH DELETES: the change feed carries
    // tombstones (here: an 'error' event deletes its user), and the
    // per-key contract is last-op-wins — a delete newer than every
    // update removes the key; an update newer than the delete
    // resurrects it. Tombstone rows stay IN the stored snapshot (the
    // is_delete flag rides the schema) precisely so recency survives
    // the deletion: drop them eagerly and an out-of-order OLDER update
    // arriving in a later micro-batch would find nothing to lose
    // against and resurrect the key; the read path filters them
    // (Streams.readSnapshot + !is_delete), and
    // ops/Upsert.expireTombstones bounds the dead rows by the feed's
    // out-of-order horizon — the watermark rule at the storage grain.
    // Plan per batch: the same ONE max_by aggregate as
    // stream_upsert_snapshot — deletes add zero operators, only a
    // boolean column. Gated against the batch last-op-wins oracle on
    // the FULL key space.
    OracleQuery(
      "stream_cdc_tombstones",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts", $"value",
            ($"event_type" === "error").as("is_delete"))
        val tmp = graft.core.Scratch.dir("stream_cdc_del", d)
        ev.repartition(6).write.mode("overwrite").parquet(s"$tmp/in")
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(s"$tmp/in")
        graft.streaming.Streams
          .snapshotMergeStream(src, s"$tmp/snap", s"$tmp/ckpt",
            keys = Seq("user_id"), orderBy = Seq("ts", "event_id"))
          .awaitTermination()
        val snap = graft.streaming.Streams.readSnapshot(s, s"$tmp/snap").get
        // live view: tombstoned keys filtered at read time; expiry with
        // an all-covering horizon must be a no-op on live rows
        graft.ops.Upsert
          .expireTombstones(snap, "is_delete", "ts",
            lit("2030-01-01").cast("timestamp"))
          .filter(!$"is_delete")
          .select($"user_id", $"event_id", $"ts", $"value")
          .orderBy($"user_id")
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, event_id, ts, value, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events
             |)
             |SELECT user_id, event_id, ts, value FROM ranked
             |WHERE rn = 1 AND event_type <> 'error'
             |ORDER BY user_id""".stripMargin)
    ),

    // Streaming intake with a dead-letter queue: the quality gate that
    // QUARANTINES instead of dropping — every input doc lands in
    // exactly one of accepted/quarantine (with its reject reason and
    // scores: the triage queue an operator debugs from; silent drops
    // are unauditable). Routing is the same map-side TextFeatures
    // expressions as text_quality_score; both sinks write per-batch
    // generation dirs so at-least-once replay can't double-route. The
    // gate checks CONSERVATION AND CONTENT: per (disposition, reason)
    // counts over the union of both sinks must reproduce the batch
    // spelling of the same gate — a doc lost between sinks, routed
    // twice, or mis-reasoned all break the hash.
    OracleQuery(
      "stream_quality_dlq",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val tmp = graft.core.Scratch.dir("stream_dlq", d)
        docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/in")
        // Thresholds picked to EXERCISE all three routes on the synthetic
        // corpus (quality is tightly clustered ~0.95, token counts 10-99):
        // a gate whose quarantine path never fires is untested plumbing.
        graft.streaming.Streams
          .docQualityDlqStream(s, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt",
            minQuality = 0.92, minTokens = 20)
          .awaitTermination()
        val acc = s.read.parquet(s"$tmp/out/accepted")
          .select(lit("accepted").as("disposition"), lit("-").as("reason"))
        val quar = s.read.parquet(s"$tmp/out/quarantine")
          .select(lit("quarantined").as("disposition"), $"reject_reason".as("reason"))
        acc.unionByName(quar)
          .groupBy($"disposition", $"reason")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy($"disposition", $"reason")
      },
      Some("""WITH feat AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |    round(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'of', 'and', 'to')))
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS stopword_ratio,
             |    round(len(list_distinct(string_split(text, ' ')))
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS unique_ratio
             |  FROM documents
             |), scored AS (
             |  SELECT doc_id, n_tokens,
             |    round(CASE WHEN n_tokens < 5 THEN 0.0
             |          ELSE 1.0 - abs(stopword_ratio - 0.1)
             |               - (CASE WHEN unique_ratio < 0.3 THEN 0.3 - unique_ratio ELSE 0.0 END)
             |          END, 4) AS quality
             |  FROM feat
             |), routed AS (
             |  SELECT CASE WHEN quality >= 0.92 AND n_tokens >= 20
             |      THEN 'accepted' ELSE 'quarantined' END AS disposition,
             |    CASE WHEN quality >= 0.92 AND n_tokens >= 20 THEN '-'
             |      WHEN n_tokens < 20 THEN 'too_few_tokens'
             |      ELSE 'low_quality' END AS reason
             |  FROM scored
             |)
             |SELECT disposition, reason, count(*) AS n_docs
             |FROM routed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // STREAM-STATIC enrichment — the most common production streaming
    // shape (fact stream × slowly-changing dimension) and the one
    // streaming join that needs NO watermark and NO join state: the
    // dimension is a bounded batch frame, so Spark plans a per-batch
    // BROADCAST hash join (the dim ships once per executor, the stream
    // side never shuffles — at 100 TB/day the fact stream stays
    // pipelined while the dimension rides the broadcast). The gate
    // replays events in 4 micro-batches and checks the full windowed
    // rollup (day × enriched segment) against the batch join: a row
    // joined against a missed/duplicated dim entry moves a count or a
    // cent and fails the hash. Values sum as exact integer CENTS (the
    // order-free BIGINT discipline) — double summation order across
    // micro-batches could flip the 4th decimal otherwise.
    OracleQuery(
      "stream_dim_enrich",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"ts", $"user_id", $"value")
        val tmp = graft.core.Scratch.dir("stream_enrich", d)
        ev.repartition(4).write.mode("overwrite").parquet(s"$tmp/in")
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in")
        val dim = broadcast(Tables.customer(s, d)
          .select($"c_custkey", $"c_mktsegment".as("segment")))
        val enriched = src
          .join(dim, src("user_id") === dim("c_custkey"))
          .select(window($"ts", "1 day").as("w"), $"segment",
            floor($"value" * 100 + 0.5).cast("long").as("cents"))
          .groupBy($"w", $"segment")
          .agg(count(lit(1)).as("n_events"), sum($"cents").as("value_cents"))
        val name = s"stream_enrich_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        graft.streaming.Streams.runToMemory(enriched, name, s"$tmp/ckpt")
        s.table(name)
          .select($"w.start".as("day"), $"segment", $"n_events", $"value_cents")
          .orderBy($"day", $"segment")
      },
      Some("""SELECT date_trunc('day', ts) AS day, c_mktsegment AS segment,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2
             |ORDER BY day, segment""".stripMargin)
    ),

    // INCREMENTAL record linkage — the nightly-feed shape: registry B
    // arrives in chunks and each micro-batch is blocked + FS-scored
    // against the STATIC authoritative registry A with weights fixed
    // from the full-snapshot u-estimates (production trains weights on
    // the previous snapshot; re-estimating per batch would make
    // admission decisions drift with chunk boundaries). Each batch's
    // match pairs land in a per-batch generation dir (at-least-once
    // replay overwrites only itself), and the gate is the FULL
    // pair-level match table across all generations vs the batch
    // scorer: a pair matched twice (batch-boundary dup), missed (a
    // chunk skipped), or scored differently (weights drifting with the
    // batch) all break the hash. Each B row is in exactly one batch and
    // scoring is row-local given A + the 1-row weight frame, so
    // streaming ≡ batch by construction — which is exactly what the
    // gate pins.
    OracleQuery(
      "stream_record_linkage",
      (s, d) => {
        import s.implicits._
        val (a, b) = DedupQueries.linkageRegistries(s, d)
        val consts = DedupQueries.linkageConsts(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        val tmp = graft.core.Scratch.dir("stream_linkage", d)
        b.repartition(4).write.mode("overwrite").parquet(s"$tmp/in")
        val bSchema = s.read.parquet(s"$tmp/in").schema
        val src = s.readStream.schema(bSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in")
        val q = graft.streaming.Streams.withStatePartitions(s) { src.writeStream
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            DedupQueries.blockAndScore(a, batch.toDF(), consts)
              .filter(col("score_micro") >= 10000000L)
              .select(col("akey"), col("bkey"), col("score_micro"))
              .write.mode("overwrite").parquet(s"$tmp/out/gen=$batchId")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start() }
        q.awaitTermination()
        consts.unpersist()
        s.read.parquet(s"$tmp/out")
          .select($"akey", $"bkey", $"score_micro")
          .orderBy($"akey", $"bkey")
      },
      Some(DedupQueries.linkageCtes +
          """, scored AS (
             |  SELECT akey, bkey,
             |    CAST(gn * CAST(floor(log2(0.7 / un) * 1000000 + 0.5) AS BIGINT)
             |      + (1 - gn) * CAST(floor(log2(0.3 / (1 - un)) * 1000000 + 0.5) AS BIGINT)
             |      + gs * CAST(floor(log2(0.8 / us) * 1000000 + 0.5) AS BIGINT)
             |      + (1 - gs) * CAST(floor(log2(0.2 / (1 - us)) * 1000000 + 0.5) AS BIGINT)
             |      + gb * CAST(floor(log2(0.8 / ub) * 1000000 + 0.5) AS BIGINT)
             |      + (1 - gb) * CAST(floor(log2(0.2 / (1 - ub)) * 1000000 + 0.5) AS BIGINT)
             |      AS BIGINT) AS score_micro
             |  FROM pairs, u
             |)
             |SELECT akey, bkey, score_micro
             |FROM scored WHERE score_micro >= 10000000
             |ORDER BY akey, bkey""".stripMargin)
    )
  )
}
