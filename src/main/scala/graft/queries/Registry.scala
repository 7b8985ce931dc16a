package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name and hashes values.
  *
  * Determinism rules for hash-matching:
  *  - every query ends in a total ORDER BY (stable tiebreak included);
  *  - floating-point aggregates are rounded to 4 decimals on BOTH sides
  *    so parallel-summation ulp drift cannot flip the hash.
  */
final case class OracleQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Data-dependent oracle: evaluated by Verify with the actual data
      * dir when the SQL must embed learned model state (e.g. the BPE
      * merge table, deterministic for a given corpus). Takes precedence
      * over [[oracle]] in the dumped oracle_sql.json. */
    oracleGen: Option[(SparkSession, String) => String] = None
)

object Registry {
  /** All oracle-checked queries, keyed by name. Sub-registries group the
    * SURVEY §2 operator families. */
  def all: Seq[OracleQuery] =
    CoreQueries.all ++
      ExprQueries.all ++
      JoinQueries.all ++
      AggQueries.all ++
      WindowQueries.all ++
      DedupQueries.all ++
      TextQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all ++
      PipelineQueries.all ++
      StreamQueries.all ++
      GraphQueries.all ++
      GovernanceQueries.all ++
      StatsQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Static oracles plus the data-dependent ones rendered against the
    * given dir — what Verify dumps for the driver's DuckDB compare. */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    oracleSql ++ all.flatMap(q => q.oracleGen.map(g => q.name -> g(spark, dir)))
}
