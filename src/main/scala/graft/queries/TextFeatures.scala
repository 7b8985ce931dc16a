package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document quality features over a `text` column — ONE definition
  * shared by the batch `text_quality_score` query and the streaming
  * intake filter (`streaming/Streams.docQualityStream`): a document
  * must score identically in both, or a doc admitted by the stream
  * could be dropped by a batch re-score (and vice versa).
  *
  * All pure map-side Column expressions; mirrors the reference-style
  * heuristics (length, stopword ratio, lexical diversity, vowel
  * plausibility) the oracle reproduces in SQL.
  */
object TextFeatures {

  /** Adds n_tokens, stopword_ratio, unique_ratio, vowel_ratio, quality. */
  def withQualityColumns(df: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val stop = expr(
      "size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'and', 'to')))")
    val uniq = expr("size(array_distinct(split(text, ' ')))")
    val vowels = length(regexp_replace(col("text"), "[^aeiou]", ""))
    df
      .withColumn("n_tokens", size(words))
      .withColumn("stopword_ratio", round(stop / size(words).cast("double"), 4))
      .withColumn("unique_ratio", round(uniq / size(words).cast("double"), 4))
      .withColumn("vowel_ratio", round(vowels / length(col("text")).cast("double"), 4))
      .withColumn("quality",
        round(
          when(col("n_tokens") < 5, 0.0).otherwise(
            lit(1.0)
              - abs(col("stopword_ratio") - 0.1) // too few or too many stopwords
              - when(col("unique_ratio") < 0.3, lit(0.3) - col("unique_ratio")).otherwise(0.0)),
          4))
  }
}
