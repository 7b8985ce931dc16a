package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The actual inventory lives in [[graft.queries.Registry]]; each entry
  * pairs a Spark DataFrame program with the DuckDB oracle SQL the driver
  * hash-compares it against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pricing-summary aggregate — the same grouped max/sum/count shape
    * as the reference's daily-Tmax flagship (aggregate/build_daily_tmax.py).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql

  /** [[oracleSql]] plus data-dependent oracles rendered against `dir`
    * (the BPE entry embeds its learned merge table — deterministic for
    * a given corpus, so the dump-time rendering and the query-time
    * training always agree). Verify dumps THIS map. */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    Registry.oracleSqlFor(spark, dir)
}
