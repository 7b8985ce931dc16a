package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** Behavioral pins for the retrieval-eval pair beyond the DuckDB
  * oracle: metric ranges, the hits↔recall identity, the NDCG ceiling,
  * silhouette bounds and the partition property of the cell census. */
class RetrievalEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sim_retrieval_eval: one row per query, metric ranges, hits identity") {
    val rows = Registry.queries("sim_retrieval_eval")(spark, sf).collect()
    assert(rows.length == 10, "one row per held-out query")
    rows.foreach { r =>
      val (hits, recall, mrr, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(hits >= 0 && hits <= 10)
      assert(math.abs(recall - hits / 10.0) < 1e-9, "recall must BE hits/10")
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      // a hit in the list implies a positive reciprocal rank and DCG
      if (hits > 0) assert(mrr > 0.0 && ndcg > 0.0)
      else assert(mrr == 0.0 && ndcg == 0.0)
    }
    // the nprobe=2 index must actually retrieve on this corpus — an
    // all-zero eval would gate nothing
    assert(rows.map(_.getLong(1)).sum > 0, "IVF retrieved no truth at all")
  }

  test("sim_silhouette: bounds, cell census partitions the corpus") {
    val rows = Registry.queries("sim_silhouette")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count(),
      "cells must partition the embedding table")
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9, s"silhouette $s out of range")
    }
  }
}
