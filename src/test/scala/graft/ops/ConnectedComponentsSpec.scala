package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, isolated vertices, and cycles resolve to min-id components") {
    val vertices = (0L to 9L).toDF("id")
    // chain 0-1-2-3, cycle 5-6-7-5, isolated 4, 8, 9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("src", "dst")
    val comps = ConnectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(comps(_) == 0L))
    assert(Seq(5L, 6L, 7L).forall(comps(_) == 5L))
    assert(comps(4L) == 4L && comps(8L) == 8L && comps(9L) == 9L)
  }

  test("reliable checkpoint dir yields identical components to localCheckpoint") {
    // cluster path: an executor loss invalidates localCheckpoint blocks;
    // with a checkpoint dir configured the per-round state is durable.
    // Same graph through both paths must agree exactly.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val vertices = (0L to 9L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("src", "dst")
    val local = ConnectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = ConnectedComponents(vertices, edges, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    // the reliable path actually wrote checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "df.checkpoint must materialize into the configured dir")
  }

  test("long chain converges (diameter > 1 iteration)") {
    val n = 30L
    val vertices = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val comps = ConnectedComponents(vertices, edges).collect()
    assert(comps.forall(_.getLong(1) == 0L))
  }
}
