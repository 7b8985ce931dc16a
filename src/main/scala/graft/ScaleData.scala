package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up data derivation for spot-benchmarks beyond the driver's
  * largest scale factor: replicates the driver-generated sf tables
  * `factor`× with id-shifting that PRESERVES join consistency
  * (lineitem⋈orders⋈customer keys shift together; each replica gets
  * its own user/doc/vec id space), so the headline queries run
  * unchanged against a `factor`× corpus. Derives strictly from the
  * driver's parquet — no synthetic value generation; timestamps keep
  * their span (scale-up densifies time, it does not lengthen it).
  *
  *   runMain graft.ScaleData <inSfDir> <outDir> <factor>
  *
  * Used for the sf1-equivalent nonlinearity check: BENCH at 10× sf0.1
  * catches candidate-pair growth in LSH buckets and window-memory
  * effects that 6 MB tables hide.
  */
object ScaleData {

  /** id column → per-replica shift unit (far above any real id). */
  private val shifts: Map[String, Long] = Map(
    "l_orderkey" -> 10000000000L,
    "o_orderkey" -> 10000000000L,
    "o_custkey" -> 1000000000L,
    "c_custkey" -> 1000000000L,
    "event_id" -> 1000000000L,
    "user_id" -> 10000000L,
    "doc_id" -> 100000000L,
    "vec_id" -> 100000000L)

  private val replicated =
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
  private val copied = Seq("region", "nation", "supplier", "part")

  def replicate(df: DataFrame, factor: Int): DataFrame = {
    val withRep = df.withColumn("__rep",
      explode(expr(s"sequence(0L, ${factor - 1}L)")))
    val shifted = df.columns.foldLeft(withRep) { case (d, c) =>
      shifts.get(c).fold(d)(u => d.withColumn(c, col(c) + col("__rep") * u))
    }
    shifted.drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicated.foreach { t =>
      // events: go through Tables.events (nanos→µs) and write ts back
      // as a raw nanos LONG, the shape Tables.eventsRaw expects to read
      val in =
        if (t == "events")
          replicate(graft.core.Tables.events(spark, inDir), factor)
            .withColumn("ts", expr("unix_micros(ts) * 1000"))
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
        else replicate(spark.read.parquet(s"$inDir/$t.parquet"), factor)
      in.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[graft] $t ×$factor → $outDir/$t.parquet")
    }
    copied.foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[graft] $t copied → $outDir/$t.parquet")
    }
    spark.stop()
  }
}
