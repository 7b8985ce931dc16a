package graft

import org.scalatest.funsuite.AnyFunSuite

/** Enforces the bench-coverage contract Bench.scala's headline comment
  * states: every registry query is (a) headline-timed, (b) sfCaps-
  * excluded with a logged reason, or (c) on the explicit known-untimed
  * list below — cheap scalar / variant / parity rows whose family
  * already has a headline representative, timed only under
  * SPARK_GRAFT_BENCH_ALL=1. A new query landing in none of the three
  * fails here, forcing an explicit bench decision instead of silent
  * coverage drift; a promoted or deleted row must leave this list. */
class BenchCoverageSpec extends AnyFunSuite {

  private val knownUntimed: Set[String] = Set(
    // pipe_golden_replay replays the reference's FIXED-SIZE golden
    // fixture (eval/GoldenReplay) — its input does not scale with sf,
    // so timing it at bench grain would measure a constant. Every
    // other former member scanned an sf-scaled table and was promoted
    // to headline in r15 (the scale-behavior-must-be-measured rule);
    // a new row may join this list ONLY if its plan touches no
    // sf-scaled table at bench grain.
    "pipe_golden_replay")

  test("every registry row is headline-timed, capped, or explicitly known-untimed") {
    val registry = SparkEntry.queries.keySet
    val headline = Bench.headline.toSet
    val caps = Bench.sfCaps.keySet

    val phantomHeadline = headline -- registry
    assert(phantomHeadline.isEmpty,
      s"headline names not in the registry: $phantomHeadline")

    val undecided = registry -- headline -- caps -- knownUntimed
    assert(undecided.isEmpty,
      s"registry rows with NO bench decision (add to Bench.headline, " +
        s"sfCaps, or BenchCoverageSpec.knownUntimed): $undecided")

    val stale = knownUntimed -- registry
    assert(stale.isEmpty, s"known-untimed rows no longer in the registry: $stale")

    val promoted = knownUntimed intersect headline
    assert(promoted.isEmpty,
      s"rows both headline-timed and known-untimed (remove from the list): $promoted")
  }
}
