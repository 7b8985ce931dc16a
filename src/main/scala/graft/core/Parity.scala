package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine numeric-parity spellings shared by queries and ops.
  *
  * Display rounding of arbitrarily-landing doubles must NOT use
  * round(x, 4): Spark rounds the shortest-repr decimal string while
  * DuckDB rounds the exact binary, and the two disagree at …5000
  * boundaries across DuckDB builds. The floor spelling below is pure
  * IEEE arithmetic — bit-deterministic on both engines. Every oracle's
  * SQL side spells the same `floor(x * 10000 + 0.5) / 10000` literally;
  * if this helper ever changes shape or scale, every SQL twin must
  * change with it (the hash gate enforces that immediately).
  */
object Parity {

  /** `floor(c * 1e4 + 0.5) / 1e4` — the build-proof 4-dp display round. */
  def floorRound4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
}
