package graft.ops

import graft.SparkSpec
import graft.functions.HilbertIndex3
import org.apache.spark.sql.functions._

/** Pins the 3-D Hilbert key (functions/HilbertIndex3, Skilling
  * transpose walk) by the curve laws that define a Hilbert index —
  * checked EXHAUSTIVELY at small bits where the whole space fits:
  *
  *  - bijection onto [0, 8^bits) (every index hit exactly once);
  *  - unit-step locality: consecutive indices are 6-neighbor cells
  *    (Manhattan distance exactly 1) — the guarantee Morton lacks;
  *  - forward/inverse round trip;
  *
  * then at the production 21 bits: sampled round-trip + unit-step (the
  * full 2^63 space can't be enumerated), the Morton CONTRAST, the
  * Spark expression ≡ JVM kernel parity, and the layout sink round
  * trip. */
class HilbertOrder3Spec extends SparkSpec {
  import spark.implicits._

  test("exhaustive curve laws at 4 bits/dim: bijection + unit step + round trip") {
    val bits = 4
    val n = 1 << bits
    val seen = new Array[(Long, Long, Long)](n * n * n)
    for (x <- 0 until n; y <- 0 until n; z <- 0 until n) {
      val d = HilbertIndex3.xyz2d(x, y, z, bits)
      assert(d >= 0 && d < n.toLong * n * n, s"($x,$y,$z) → $d out of range")
      assert(seen(d.toInt) == null, s"collision at d=$d")
      seen(d.toInt) = (x, y, z)
      assert(HilbertIndex3.d2xyz(d, bits) == ((x.toLong, y.toLong, z.toLong)),
        s"round trip failed at ($x,$y,$z)")
    }
    // bijection: the array is full; unit step: every consecutive pair
    // differs by exactly 1 in exactly one coordinate
    for (d <- 0 until n * n * n - 1) {
      val (a, b) = (seen(d), seen(d + 1))
      val dist = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3)
      assert(dist == 1, s"non-unit step at d=$d: $a → $b")
    }
  }

  test("Morton contrast: interleaving breaks the unit-step law on the same grid") {
    val bits = 4
    val n = 1 << bits
    // morton key → cell; count non-unit steps (Hilbert above has zero)
    val cells = (for (x <- 0 until n; y <- 0 until n; z <- 0 until n) yield {
      var m = 0L
      for (k <- bits - 1 to 0 by -1) {
        m = (m << 3) | (((x >> k) & 1) << 2) | (((y >> k) & 1) << 1) | ((z >> k) & 1)
      }
      m -> (x, y, z)
    }).sortBy(_._1).map(_._2)
    val jumps = cells.sliding(2).count { case Seq(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3) > 1
    }
    assert(jumps > 0, "Morton unexpectedly unit-step — contrast void")
  }

  test("21-bit production key: sampled round trip, range, and unit step") {
    val r = new scala.util.Random(42)
    // 8^21 = 2^63: the key space is exactly the non-negative longs
    for (_ <- 0 until 20000) {
      val x = r.nextInt(1 << 21).toLong
      val y = r.nextInt(1 << 21).toLong
      val z = r.nextInt(1 << 21).toLong
      val d = HilbertIndex3.xyz2d(x, y, z)
      assert(d >= 0)
      assert(HilbertIndex3.d2xyz(d) == ((x, y, z)))
    }
    for (_ <- 0 until 20000) {
      val d = r.nextLong() & Long.MaxValue
      if (d < Long.MaxValue) {
        val a = HilbertIndex3.d2xyz(d)
        val b = HilbertIndex3.d2xyz(d + 1)
        val dist = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3)
        assert(dist == 1, s"non-unit step at d=$d: $a → $b")
      }
    }
  }

  test("Spark expression ≡ JVM kernel (codegen path) on a 21-bit sample") {
    val pts = (0 until 4096).map { i =>
      ((i * 2654435761L) & 0x1fffffL, (i * 40503L + 7) & 0x1fffffL,
        (i * 97003L + 13) & 0x1fffffL)
    }
    val df = pts.toDF("x", "y", "z")
    val got = HilbertOrder
      .withHilbert3KeyNative(df, col("x"), col("y"), col("z"), "h")
      .orderBy("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (x, y, z, h) =>
      assert(h == HilbertIndex3.xyz2d(x, y, z), s"($x,$y,$z)")
    }
  }

  test("writeHilbert3OrderedBy round-trips rows and clusters the key space") {
    val dir = java.nio.file.Files.createTempDirectory("h3sink").toString
    val df = (0 until 5000).map { i =>
      (i.toLong, (i * 7919L) % 1000, (i * 104729L) % 1000, (i * 31L) % 1000)
    }.toDF("id", "a", "b", "c")
    HilbertOrder.writeHilbert3OrderedBy(df, s"$dir/t", "a", "b", "c", numFiles = 4)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() === 5000)
    assert(back.agg(sum("id")).head().getLong(0) === (0L until 5000L).sum)
    // empty-bounds fallback: all-null dim → plain write, rows intact
    val withNull = df.withColumn("c", lit(null).cast("long"))
    HilbertOrder.writeHilbert3OrderedBy(withNull, s"$dir/n", "a", "b", "c")
    assert(spark.read.parquet(s"$dir/n").count() === 5000)
  }
}
