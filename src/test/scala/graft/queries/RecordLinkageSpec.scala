package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** Pins dedup_record_linkage's Fellegi–Sunter structure on sf0.001:
  * conservation (every customer's true pair survives blocking), score
  * monotonicity in each agreement bit (m > u for every field on this
  * data, so flipping any disagreement to agreement must raise the
  * log-likelihood), and the name-agreement identity (names are unique
  * per custkey and corrupted names end in a non-digit, so name
  * agreement implies a true match).  */
class RecordLinkageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    Registry.queries("dedup_record_linkage")(spark, sf).collect()

  private def pat(r: org.apache.spark.sql.Row) =
    (r.getAs[Int]("name_agree"), r.getAs[Int]("seg_agree"), r.getAs[Int]("bal_agree"))

  test("conservation: blocking never loses a true pair") {
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_true")).sum == nCust)
  }

  test("score is strictly monotone in every agreement bit") {
    val score = rows.map(r => pat(r) -> r.getAs[Long]("score_micro")).toMap
    for {
      (p @ (n, s, b), v) <- score
      (q, i) <- Seq(((1, s, b), n), ((n, 1, b), s), ((n, s, 1), b))
      if i == 0
      w <- score.get(q)
    } assert(w > v, s"flipping a bit of $p to $q did not raise the score ($v -> $w)")
  }

  test("name agreement implies a true match; full agreement is decision=match") {
    rows.filter(_.getAs[Int]("name_agree") == 1).foreach { r =>
      assert(r.getAs[Long]("n_true") == r.getAs[Long]("n_pairs"),
        s"non-true pair with agreeing name at ${pat(r)}")
    }
    rows.find(r => pat(r) == ((1, 1, 1))).foreach { r =>
      assert(r.getAs[String]("decision") == "match")
    }
    // decision thresholds partition the score axis in order
    val byDecision = rows.groupBy(_.getAs[String]("decision"))
      .view.mapValues(_.map(_.getAs[Long]("score_micro"))).toMap
    for {
      m <- byDecision.get("match"); rv <- byDecision.get("review")
    } assert(m.min > rv.max)
    for {
      rv <- byDecision.get("review"); nm <- byDecision.get("non_match")
    } assert(rv.min > nm.max)
  }
}
