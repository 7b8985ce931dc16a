package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash matches the reference loop, handles empty and null") {
    GraftFunctions.register(spark)
    val df = Seq(Option("hello world"), Option(""), None).toDF("t")
      .select(expr("rolling_hash(t)").as("h"))
    val out = df.collect()
    assert(out(0).getLong(0) == RollingHash.hash("hello world".getBytes))
    assert(out(1).getLong(0) == 0L)
    assert(out(2).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(100).selectExpr("rolling_hash(CAST(id AS STRING)) AS h")
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [rolling_hash"), plan)
    assert(df.agg(max("h")).collect()(0).getLong(0) > 0)
  }

  test("registration is idempotent and works via SparkSessionExtensions class") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT rolling_hash('abc')").collect()(0).getLong(0) ==
      RollingHash.hash("abc".getBytes))
    // the extension entry point wires the same descriptor
    new GraftExtensions() // constructible (used via spark.sql.extensions)
  }
}
