package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Hilbert key three ways: exact equality with the reference
  * xy2d recursion over a full grid, the two curve laws (bijection onto
  * [0, 4^bits); every consecutive key pair is a 4-neighbor step — the
  * locality guarantee), and the contrast that motivates the operator:
  * Morton interleaving BREAKS the neighbor law on the same grid. Plus
  * the layout sink round trip. */
class HilbertOrderSpec extends SparkSpec {
  import spark.implicits._

  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private val bits = 6
  private val n = 1 << bits // 64×64 grid

  private lazy val keys: Map[(Int, Int), Long] = {
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y))).toDF("x", "y")
    HilbertOrder.withHilbertKey(grid, col("x"), col("y"), "h", bits = bits)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  test("exact equality with the reference xy2d recursion over the full grid") {
    keys.foreach { case ((x, y), h) =>
      assert(h == xy2d(n, x, y), s"($x,$y): $h vs ${xy2d(n, x, y)}")
    }
  }

  test("native codegen expression ≡ the projection chain on the full 16-bit-domain grid") {
    // sparse probe of the full 2^16 domain (the chain test above runs
    // bits=6; here both spellings run at the production 16 bits)
    val pts = (0 until 4096).map { i =>
      ((i * 2654435761L) & 0xffffL, (i * 40503L + 7) & 0xffffL)
    }.toDF("x", "y")
    val chain = HilbertOrder
      .withHilbertKey(pts, col("x"), col("y"), "h")
      .orderBy("x", "y").collect().map(_.getLong(2)).toSeq
    val native = HilbertOrder
      .withHilbertKeyNative(pts, col("x"), col("y"), "h")
      .orderBy("x", "y").collect().map(_.getLong(2)).toSeq
    assert(chain == native)
    // and both equal the JVM reference kernel
    val ref = pts.orderBy("x", "y").collect()
      .map(r => graft.functions.HilbertIndex2.xy2d(r.getLong(0), r.getLong(1))).toSeq
    assert(native == ref)
  }

  test("bijection onto [0, 4^bits) and the 4-neighbor walk law") {
    assert(keys.size == n * n && keys.values.toSet.size == n * n)
    assert(keys.values.min == 0L && keys.values.max == n.toLong * n - 1)
    val byKey = keys.toSeq.sortBy(_._2).map(_._1)
    byKey.sliding(2).foreach { w =>
      val dist = math.abs(w(1)._1 - w(0)._1) + math.abs(w(1)._2 - w(0)._2)
      assert(dist == 1, s"jump between ${w(0)} and ${w(1)}")
    }
  }

  test("Morton breaks the neighbor law on the same grid (the contrast)") {
    val morton = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
      .map { case (x, y) =>
        var m = 0L
        for (i <- 0 until bits) {
          m |= ((x >> i) & 1L) << (2 * i)
          m |= ((y >> i) & 1L) << (2 * i + 1)
        }
        (x, y, m)
      }.sortBy(_._3)
    val jumps = morton.sliding(2).count { w =>
      math.abs(w(1)._1 - w(0)._1) + math.abs(w(1)._2 - w(0)._2) > 1
    }
    assert(jumps > 0, "Morton unexpectedly adjacency-perfect")
  }

  test("layout sink: rows preserved, files carry disjoint-ish key ranges") {
    val d = java.nio.file.Files.createTempDirectory("hilbert").toString
    val df = (0 until 4096).map { i => (i.toLong, (i * 37 % 211).toLong, (i * 91 % 199).toLong) }
      .toDF("id", "a", "b")
    HilbertOrder.writeHilbertOrderedBy(df, s"$d/data", "a", "b", numFiles = 8)
    val back = spark.read.parquet(s"$d/data")
    assert(back.count() == 4096 && back.select("id").distinct().count() == 4096)
    assert(back.inputFiles.length == 8)
    assert(back.columns.sorted.toSeq == Seq("a", "b", "id"))
  }
}
