package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution reader — the mixed-generation problem every
  * long-lived table grows into: generation 0 was written before
  * `lang` existed, generation 3 added `quality`, generation 7 widened
  * `n_chars` int→long. A naive `spark.read.parquet(dir)` either drops
  * the new columns (first-footer schema) or NULLs the old rows
  * silently where the pipeline expects a default.
  *
  * `mergeSchema` cannot express this: parquet footer merging REFUSES
  * a type change (INT vs BIGINT doc_id fails the whole read), and it
  * nulls absent columns instead of defaulting them. [[read]] instead
  * GROUPS the files by footer schema (one group per writer
  * generation), CONFORMS each group to the target independently, and
  * unions the conformed frames: missing columns materialize with
  * their declared default (not null — a quality score absent in old
  * generations means "unscored", and the caller declares what
  * unscored means), present columns cast to the target type (widening
  * only — a narrowing cast would corrupt silently, so it throws),
  * extra on-disk columns are dropped (forward compatibility: an old
  * reader ignores what a newer writer added), and column order is the
  * target's.
  *
  * Scale note: the per-file footer read is driver-side metadata (the
  * Manifest/file-index bound; at 10⁶ files, group by generation
  * directory or carry the schema id in the manifest instead of
  * re-footering). The conform step is pure projection — map-side,
  * codegen, zero shuffle — and the union is plan-level (no exchange).
  */
object SchemaEvolve {

  /** Target column: name, Spark SQL type string, default expression.
    * The default applies when a generation lacks the column — and,
    * because parquet mergeSchema nulls absent columns WITHOUT row
    * provenance, it necessarily applies to EVERY null of that column
    * (the Delta `ADD COLUMN … DEFAULT` semantic, suitable when null
    * means "unscored/absent"; for columns where a written null is
    * meaningful data, declare `lit(null)` as the default and the
    * conform is null-preserving). */
  final case class TargetCol(name: String, sqlType: String, default: Column)

  private val widenOk: Map[String, Set[String]] = Map(
    "int" -> Set("int", "bigint", "double"),
    "bigint" -> Set("bigint", "double"),
    "float" -> Set("float", "double"),
    "double" -> Set("double"),
    "string" -> Set("string"),
    "boolean" -> Set("boolean"),
    "timestamp" -> Set("timestamp"))

  def read(spark: SparkSession, dir: String, target: Seq[TargetCol]): DataFrame = {
    val files = Compaction.listFiles(spark, dir).map(_.path)
    require(files.nonEmpty, s"no data files under $dir")
    val groups = files
      .groupBy(f => spark.read.parquet(f).schema
        .map(x => s"${x.name}:${x.dataType.simpleString}").mkString(","))
      .toSeq.sortBy(_._1) // deterministic group order
    groups
      .map { case (_, fs) => conform(spark.read.parquet(fs: _*), target) }
      .reduce(_ unionByName _)
  }

  /** Conform an already-loaded frame to the target schema. */
  def conform(df: DataFrame, target: Seq[TargetCol]): DataFrame = {
    val onDisk: StructType = df.schema
    val cols = target.map { t =>
      onDisk.find(_.name == t.name) match {
        case Some(f) =>
          val from = f.dataType.simpleString
          require(widenOk.getOrElse(from, Set(from)).contains(t.sqlType.toLowerCase),
            s"narrowing cast ${t.name}: $from -> ${t.sqlType} would corrupt silently")
          // mergeSchema nulls the column for generations that lack it;
          // fill those rows with the declared default after the cast
          coalesce(col(t.name).cast(t.sqlType), t.default.cast(t.sqlType))
            .as(t.name)
        case None =>
          t.default.cast(t.sqlType).as(t.name)
      }
    }
    df.select(cols: _*)
  }
}
