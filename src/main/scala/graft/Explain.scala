package graft

/** Plan-audit tool: print the formatted physical plan of named registry
  * queries. With `--run`, execute first and print the FINAL adaptive
  * plan (shows AQE decisions: reused stages, skew splits, coalesced
  * partitions) — the plan that actually ran, not the static estimate.
  *
  * Usage: runMain graft.Explain <sfDir> [--run] <query> [query ...]
  * With no query names, lists the registry.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val run = args.contains("--run")
    val rest = args.filterNot(_ == "--run")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = core.GraftSession.get("local[4]")
    val qs = SparkEntry.queries
    if (rest.length <= 1) {
      qs.keys.toSeq.sorted.foreach(println)
    } else {
      rest.tail.foreach { name =>
        println(s"\n=== $name ===")
        qs.get(name) match {
          case Some(fn) =>
            val df = fn(spark, sfDir)
            if (run) {
              df.collect()
              println(df.queryExecution.executedPlan.toString)
            } else df.explain("formatted")
          case None => println(s"unknown query: $name")
        }
      }
    }
    spark.stop()
  }
}
