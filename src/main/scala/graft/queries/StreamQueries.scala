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
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_stream_daily").toString
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
    )
  )
}
