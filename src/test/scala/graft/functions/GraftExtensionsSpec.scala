package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.PlanBridge

/** Verifies the `spark.sql.extensions=graft.functions.GraftExtensions`
  * entry point actually wires everything the library ships — the specs
  * elsewhere exercise the imperative registration path, so a function or
  * strategy missing from the extension class would otherwise only
  * surface in a user's cluster config. */
class GraftExtensionsSpec extends SparkSpec {

  private def applied: SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ext
  }

  test("all six custom expressions register through the extension") {
    val names = PlanBridge.injectedFunctionNames(applied).toSet
    assert(Set("rolling_hash", "vec_dot", "minhash_sig", "trigram_stats",
      "simhash32", "vec_l2sq").subsetOf(names), names.toString)
  }

  test("the as-of planner strategy registers through the extension") {
    val strategies = PlanBridge.injectedStrategies(applied, spark)
    assert(strategies.exists(_ eq graft.plans.AsofJoinStrategy), strategies.toString)
  }

  test("the as-of optimizer rule registers through the extension") {
    val rules = PlanBridge.injectedOptimizerRules(applied, spark)
    assert(rules.exists(_ eq graft.plans.AsofJoinOptimizations), rules.toString)
  }
}
