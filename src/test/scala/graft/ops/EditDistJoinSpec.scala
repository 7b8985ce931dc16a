package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix filter's whole value is that it is SOUND (candidates ⊇
  * true pairs); these cases hammer that against brute force on string
  * families built to stress it — shared hot grams, repeated grams
  * (multiset occurrence tagging), and boundary lengths. */
class EditDistJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(names: Seq[String], k: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val n = names.distinct.filter(_.length >= 2 * k + 2)
    (for {
      a <- n; b <- n if a < b
      dist = lev(a, b) if dist <= k
    } yield (a, b, dist)).toSet
  }

  private def run(names: Seq[String], k: Int): Set[(String, String, Int)] =
    EditDistJoin.selfJoin(names.toDF("s"), "s", k)
      .as[(String, String, Int)].collect().toSet

  test("matches brute force on a deterministic pseudo-random word soup") {
    // 120 words over a 4-letter alphabet: collisions and near-misses
    // abound, and every bigram is corpus-hot (16 possible bigrams) —
    // the regime where a naive all-gram join would explode and an
    // UNSOUND prefix would visibly drop pairs
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(120)(
      (0 until (6 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    assert(run(words, k = 2) === brute(words, k = 2))
  }

  test("repeated-gram strings: occurrence tagging keeps the multiset bound") {
    // aaaaaa-style strings are all about duplicate grams — set
    // semantics without the j tag would over-count overlap
    val words = Seq("aaaaaa", "aaaaab", "aaaaba", "aabaaa", "aaaaaa_x",
      "bbbbbb", "bbbbba", "abababab", "babababa", "abababaa")
    assert(run(words, k = 2) === brute(words, k = 2))
  }

  test("edits at the string edges and boundary lengths") {
    val words = Seq("abcdef", "bcdef!", "zabcde", "abcdez", "abcdefgh",
      "xbcdefgh", "abcdefgx", "abcdxfgh")
    for (k <- 1 to 2)
      assert(run(words, k) === brute(words, k), s"k=$k")
  }
}
