package graft.functions

import graft.SparkSpec
import graft.ops.BpeTrain
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("train learns the hand-computed merge sequence") {
    import spark.implicits._
    // word counts: abc ×5, abd ×3 →
    //   round 1: (a,b)=8 beats (b,c)=5, (b,d)=3
    //   round 2: (ab,c)=5 beats (ab,d)=3
    //   round 3: (ab,d)=3
    //   then no pair remains
    val corpus = Seq("abc abc abc abc abc abd abd abd").toDF("text")
    val docs = Seq("abc abd abc", "abc abd abc", "abc abd abc").toDF("text")
    assert(BpeTrain.train(corpus, "text", nMerges = 10) ==
      Seq(("a", "b"), ("ab", "c"), ("ab", "d")))
    // nMerges caps the list
    assert(BpeTrain.train(corpus, "text", nMerges = 1) == Seq(("a", "b")))
    // determinism across invocations
    assert(BpeTrain.train(docs, "text", 5) == BpeTrain.train(docs, "text", 5))
  }

  test("encode applies merges by rank, not position") {
    import spark.implicits._
    // rank 0 = (b,c): in "abc" it outranks (a,b) even though (a,b) is
    // first by position
    val merges = Seq(("b", "c"), ("a", "b"))
    val out = Seq("abc").toDF("text")
      .select(BpeEncode.tokens($"text", merges).as("toks"))
      .head.getSeq[String](0)
    assert(out == Seq("a", "bc"))
  }

  test("encode: left-to-right non-overlapping application, word isolation, codegen parity") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = Seq((1L, "abcd abab cab"), (2L, "aaa"), (3L, ""), (4L, "x  y"))
      .toDF("id", "text")
    def run() = df.select($"id", BpeEncode.tokens($"text", merges).as("toks"))
      .orderBy($"id").collect().map(_.getSeq[String](1))
    val codegen = run()
    assert(codegen(0) == Seq("abc", "d", "ab", "ab", "c", "ab"))
    assert(codegen(1) == Seq("a", "a", "a")) // no (a,a) merge learned
    assert(codegen(2) == Seq.empty)          // empty text → no tokens
    assert(codegen(3) == Seq("x", "y"))      // double space → no empty token

    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      assert(codegen.toSeq == interp.toSeq, "interpreted path diverges from codegen")
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("sequential rank-order replay (the DuckDB oracle strategy) matches the kernel") {
    import spark.implicits._
    // The text_bpe_tokens oracle replays the learned merge list in a
    // recursive CTE: one boundary-wrapped left-to-right `replace` per
    // rank, in rank order. Mirror that exactly here (java String.replace
    // is the same left-to-right non-overlapping literal scan) and pin it
    // against the kernel's lowest-rank-first loop on every word type of
    // the real corpus — the learned-list equivalence the oracle relies on.
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrain.train(docs, "text", 40)
    val words = docs.select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0).distinct().as[String].collect()
    val table = BpeEncodeImpl.buildTable(merges)
    val SEP = "\u0001"
    words.foreach { w =>
      val replayed = merges.foldLeft(w.map(c => SEP + c + SEP).mkString) {
        case (s, (a, b)) => s.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
      }
      val replayedN = replayed.count(_ == '\u0001') / 2
      val enc = BpeEncodeImpl.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
      assert(replayedN == enc.numElements(),
        s"word '$w': sequential replay gives $replayedN tokens, kernel ${enc.numElements()}")
    }
    // the rendered SQL is deterministic for a fixed corpus
    val r1 = graft.queries.TextQueries.bpeReplayOracle(merges)
    val r2 = graft.queries.TextQueries.bpeReplayOracle(BpeTrain.train(docs, "text", 40))
    assert(r1 == r2)
    assert(r1.contains("WITH RECURSIVE"))
  }

  test("train + encode on real docs: lossless, and more merges never add tokens") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(100).cache()
    val m50 = BpeTrain.train(docs, "text", 50)
    val m200 = BpeTrain.train(docs, "text", 200)
    assert(m200.take(50) == m50, "merge list is prefix-stable in nMerges")
    val counted = docs.select(
      $"doc_id",
      length(regexp_replace($"text", " ", "")).cast("long").as("n_chars"),
      size(BpeEncode.tokens($"text", m50)).cast("long").as("t50"),
      size(BpeEncode.tokens($"text", m200)).cast("long").as("t200"),
      concat_ws("", BpeEncode.tokens($"text", m200)).as("glued"),
      regexp_replace($"text", " ", "").as("squashed")).collect()
    counted.foreach { r =>
      assert(r.getString(4) == r.getString(5),
        s"doc ${r.getLong(0)}: tokenization must be lossless")
      assert(r.getLong(3) <= r.getLong(2), "more merges can only shrink the encoding")
      assert(r.getLong(2) <= r.getLong(1), "token count is bounded by char count")
    }
  }
}
