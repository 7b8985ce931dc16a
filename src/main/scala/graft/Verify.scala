package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_NAMES=a,b,c restricts the dump (and the oracle
    // json) to the named queries — targeted runs while iterating; the
    // driver never sets it, so its gate always covers the full registry
    val nameFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_VERIFY_NAMES")
        .map(_.split(',').map(_.trim).toSet)
        .fold((_: String) => true)(ns => ns.contains _)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracle json is written BEFORE the query dump: if the run dies
    // partway (timeout, OOM — round 8 lost 47 green entries exactly
    // this way), the driver still has oracles for every parquet that
    // finished. The oracleGen entries train tiny models (BPE merges) —
    // seconds, not the dump's minutes.
    val json = SparkEntry.oracleSqlFor(spark, sfDir)
      .filter(t => nameFilter(t._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // run queries concurrently: each is small at sf0.01, so overlapping
    // 4 jobs hides per-query scheduling latency (Spark's scheduler
    // interleaves the stages)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val done = new java.util.concurrent.atomic.AtomicInteger()
    val todo = SparkEntry.queries.toSeq.filter(t => nameFilter(t._1))
    val futures = todo.map { case (name, fn) =>
      scala.concurrent.Future {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(f"[verify] ${done.incrementAndGet()}%3d/${todo.size} $name ok " +
            f"${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          done.incrementAndGet()
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    spark.stop()
  }
}
