package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared word-shingle builder for the dedup and text-quality queries
  * and the ops-level dedup pipeline. */
private[graft] object Shingles {

  /** 60-bit integer from the md5 hex digest — same value in DuckDB via
    * ('0x' || substr(md5(x),1,15))::BIGINT. ONE spelling shared by every
    * caller: it must stay byte-identical to the oracle spelling for
    * cross-engine determinism. */
  def h60(c: String): String = s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)"

  /** Word 3-gram shingles as (doc_id, gram) rows. posexplode carries the
    * split array alongside each position, so the gram is assembled with
    * element_at(ws, pos+k) — pure codegen'd expressions, NO window and
    * therefore no shuffle+sort (a lead()-window variant pays one
    * exchange here; a transform() HOF is ~5× slower again since HOF
    * lambdas are interpreted). Docs with <3 words drop out via the pos
    * bound. Gram strings are byte-identical to the oracle's
    * list_transform formulation. */
  def wordTrigrams(docs: DataFrame): DataFrame =
    wordTrigramsWith(docs, Nil)

  /** [[wordTrigrams]] carrying extra doc-level columns through the
    * explode — one corpus scan where a gram⋈docs join-back would pay a
    * second scan plus a doc_id shuffle. */
  def wordTrigramsWith(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val carryCols = carry.map(col)
    docs
      .select((col("doc_id") +: split(col("text"), " ").as("ws") +: carryCols): _*)
      .select((col("doc_id") +: col("ws") +: posexplode(col("ws")).as(Seq("pos", "w")) +: carryCols): _*)
      .filter(col("pos") <= size(col("ws")) - 3)
      .select((col("doc_id") +: concat_ws(" ",
        col("w"),
        element_at(col("ws"), col("pos") + 2),
        element_at(col("ws"), col("pos") + 3)).as("gram") +: carryCols): _*)
  }

  /** The DuckDB spelling of the same trigrams (oracle-side CTE body). */
  val duckTrigrams: String =
    """SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 2),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
      |  )) AS gram
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3""".stripMargin
}
