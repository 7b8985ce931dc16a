package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the mixed-generation reader: added columns default (not null),
  * widening casts conform, narrowing throws, extra on-disk columns
  * drop, column order is the target's, and the conform is a pure
  * projection (no shuffle). */
class SchemaEvolveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("evolve").toString
    // gen0: (doc_id INT, text) — before lang/quality existed
    Seq((1, "alpha"), (2, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/g0")
    // gen1: added lang; doc_id already BIGINT; extra scratch column
    Seq((3L, "gamma", "en", "junk"), (4L, "delta", "de", "junk"))
      .toDF("doc_id", "text", "lang", "tmp_debug")
      .write.mode("overwrite").parquet(s"$d/g1")
    // flatten both generations into one table dir
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("g0", "g1").zipWithIndex.foreach { case (g, i) =>
      Compaction.listFiles(spark, s"$d/$g").zipWithIndex.foreach { case (f, j) =>
        fs.rename(new org.apache.hadoop.fs.Path(f.path),
          new org.apache.hadoop.fs.Path(s"$d/data/part-$i-$j.parquet"))
      }
    }
    s"$d/data"
  }

  private val target = Seq(
    SchemaEvolve.TargetCol("doc_id", "bigint", lit(-1L)),
    SchemaEvolve.TargetCol("lang", "string", lit("und")),
    SchemaEvolve.TargetCol("quality", "double", lit(0.5)),
    SchemaEvolve.TargetCol("text", "string", lit("")))

  test("conform: defaults for absent columns, widening, drop extras, target order") {
    val df = SchemaEvolve.read(spark, dir, target)
    assert(df.columns.toSeq == Seq("doc_id", "lang", "quality", "text"))
    assert(df.schema("doc_id").dataType.simpleString == "bigint")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // gen0 rows: lang defaults to "und"; gen1 rows keep their lang
    assert(rows(0)._2 == "und" && rows(2)._2 == "en")
    // quality exists nowhere on disk: every row gets the declared default
    assert(rows.forall(_._3 == 0.5))
    assert(!df.columns.contains("tmp_debug"), "extra on-disk column must drop")
  }

  test("narrowing cast refuses; conform is shuffle-free") {
    val bad = Seq(SchemaEvolve.TargetCol("doc_id", "int", lit(-1)))
    val e = intercept[IllegalArgumentException] {
      SchemaEvolve.read(spark, dir, bad).collect()
    }
    assert(e.getMessage.contains("narrowing"))
    val p = SchemaEvolve.read(spark, dir, target)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"conform must be a pure projection:\n$p")
  }
}
