package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom + CountMin — the two map-side gates with one-sided error.
  * Both must satisfy their no-false-negative contract EXACTLY (that is
  * what makes the two-phase gate-then-verify pipelines correct), and
  * their error rate must sit inside the design envelope (that is what
  * makes them useful). */
class SketchGateSpec extends SparkSpec {

  private def hashed(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => s"$tag-$i").toDF("s")
      .select(expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("h"))
  }

  test("bloom: zero false negatives, fpp within envelope") {
    val mBits = 1 << 14
    val members = hashed(2000, "in")
    val words = Bloom.build(members, "h", mBits)
    // every inserted hash tests positive
    val misses = members.filter(!Bloom.mightContain(words, mBits, col("h"))).count()
    assert(misses == 0L, "a Bloom filter may never reject a member")
    // non-members: bit load ≈ 1−e^(−kn/m) = 0.217 → fpp ≈ load² ≈ 4.7%
    // for k=2 INDEPENDENT probes; 0.15 would only trip if the probes
    // correlate (the xor-seed degeneration measured ~0.21 ≈ load^1)
    val out = hashed(4000, "out")
    val fp = out.filter(Bloom.mightContain(words, mBits, col("h"))).count()
    assert(fp.toDouble / 4000 < 0.15, s"false-positive rate ${fp / 4000.0} out of envelope")
    assert(fp > 0, "with m=16k bits and 2k members some false positives are expected " +
      "— zero suggests the probe reads different bits than the build wrote")
  }

  test("bloom: build matches a scalar reference bit-for-bit") {
    val mBits = 1 << 10
    val rows = hashed(100, "ref").collect().map(_.getLong(0))
    val words = Bloom.build(hashed(100, "ref"), "h", mBits)
    val logM = Integer.numberOfTrailingZeros(mBits)
    val ref = new Array[Long](mBits / 32)
    for (h <- rows; i <- 0 until Bloom.DefaultK) {
      val pos = ((h >> (i * logM)) & (mBits - 1)).toInt
      ref(pos >> 5) |= 1L << (pos & 31)
    }
    assert(words.toSeq == ref.toSeq)
  }

  test("count-min: never undercounts, exact on light load, bounded overcount") {
    import spark.implicits._
    val w = 1 << 10
    // skewed stream: key k repeated k times, k = 1..60
    val items = (1 to 60).flatMap(k => Seq.fill(k)(s"key-$k")).toDF("s")
      .select(col("s"), expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val matrix = CountMin.build(items, "h", w, d = 4)
    val est = items.groupBy(col("s"), col("h")).agg(count(lit(1)).as("true_n"))
      .withColumn("est", CountMin.estimate(matrix, w, col("h")))
      .collect()
    assert(est.length == 60)
    est.foreach { r =>
      val (t, e) = (r.getLong(2), r.getLong(3))
      assert(e >= t, s"CMS undercounted ${r.getString(0)}: est $e < true $t")
      // 1830 items in 1024 cells, min over 4 rows: overshoot beyond the
      // analytic eN/w bound (~7 with 4x slack) means broken row hashing
      assert(e - t <= 20, s"CMS overcount $e vs $t out of envelope")
    }
  }

  test("null hashes are ignored by both builders, not NPEs") {
    import spark.implicits._
    val withNulls = Seq(Some(42L), None, Some(7L), None).toDF("h")
    val words = Bloom.build(withNulls, "h", 1 << 10)
    assert(words.exists(_ != 0L), "non-null members still inserted")
    val m = CountMin.build(withNulls, "h", 1 << 8, d = 2)
    val est = Seq(42L).toDF("h")
      .select(CountMin.estimate(m, 1 << 8, col("h"))).head.getLong(0)
    assert(est >= 1L)
  }

  test("count-min: xor-seeded rows would be degenerate, bit-sliced rows are not") {
    // Regression pin for the row-hash design choice: XOR with a constant
    // preserves equality mod 2^k, so colliding keys collide in EVERY
    // xor-seeded row; bit-sliced rows must separate some pair that
    // collides in row 0. Construct hashes colliding in row 0 (same low
    // 10 bits), then check row 1 separates at least one pair.
    val w = 1 << 10
    val logW = 10
    // same low 10 bits, different bits 10..19
    val hs = Seq(1L, 1L | (1L << logW), 1L | (2L << logW), 1L | (3L << logW))
    val row0 = hs.map(h => h & (w - 1)).distinct
    val row1 = hs.map(h => (h >> logW) & (w - 1)).distinct
    assert(row0.size == 1, "fixture: all hashes collide in row 0")
    assert(row1.size > 1, "bit-sliced row 1 separates the colliding keys")
  }
}
