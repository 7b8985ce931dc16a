package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust equi-join (inner or left-outer), driven by the
  * Count-Min sketch: a fixed-memory sketch over the fact side's key
  * frequencies turns "is this key hot?" into a MAP-SIDE predicate
  * (`estimate(key) >= hotThreshold` over the literal sketch matrix),
  * so both sides split into hot/cold regimes consistently with NO
  * driver-side key collect at all — the driver holds only the d×w
  * sketch. The dimension rows for the hot regime broadcast (the hot
  * slice of a dimension is tiny even when the whole dimension is not
  * broadcastable), the cold remainder takes the ordinary shuffle
  * join. The result is exactly the plain join — the regime split is
  * physical, not semantic.
  *
  * This is AQE's skew-join mitigation as an explicit, composable
  * operator, for the cases AQE cannot see: skew known ahead of a
  * multi-stage pipeline, a right side above the broadcast budget whose
  * hot slice is not, or an engine run with AQE disabled.
  *
  * Saturation guard: when the sketch is overloaded (fact count / w
  * approaches hotThreshold) nearly every cell reads hot and the "hot
  * dim slice" stops being tiny. The hot dim row count is checked
  * first (a cheap aggregate over the SMALL side) and the operator
  * falls back to the plain join above `maxHotDimRows` — the broadcast
  * can never OOM on a saturated sketch.
  *
  * Scan economics at 100 TB: the fact is read by the sketch build
  * plus the join's two regime branches. Pass a pre-built sketch via
  * `cms` and the sketch read disappears; use the salted variants and
  * the join itself reads the fact EXACTLY once.
  *
  * `cms` contract: the sketch MUST come from [[sketch]] — call it in
  * (or alongside) an earlier stage that already scans the fact. A
  * Count-Min matrix built by any other pipeline (e.g. the md5-hashed
  * text_cms_heavy_hitters sketch) uses a different hash family; it
  * would pass the dimension check but probe garbage positions here,
  * silently disabling the skew mitigation. [[resolve]] can only
  * validate dimensions — the hash family is the caller's obligation.
  */
object SkewJoin {

  /** The canonical fact-side key sketch — build it in (or alongside)
    * any earlier stage that scans the fact, then hand it to the join
    * via `cms` so the join adds no extra fact pass. Same hash
    * spelling as the join's probes. */
  def sketch(fact: DataFrame, key: String, w: Int = 4096, d: Int = 4): Array[Array[Long]] =
    CountMin.build(
      fact.filter(col(key).isNotNull).select(keyHash(key).as("h")), "h", w, d)

  /** @param hotThreshold fact-row count above which a key is "hot"
    * @param cms pre-built fact-key sketch from [[sketch]] (same w, d)
    * @param maxHotDimRows broadcast budget for the hot dim slice;
    *        above it (saturated sketch / genuinely huge hot slice)
    *        the operator degrades to the plain join
    * @return exactly `fact.join(dim, Seq(key))`, skew-split physically
    */
  def inner(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int = 4096, d: Int = 4,
      cms: Option[Array[Array[Long]]] = None,
      maxHotDimRows: Long = 100000L): DataFrame =
    split(fact, dim, key, hotThreshold, w, d, "inner", cms, maxHotDimRows)

  /** Left-outer variant: unmatched fact rows (including null keys)
    * survive with null dim columns, exactly as in the plain left join —
    * both the hot and cold regimes preserve their left side, so the
    * union is the full fact. */
  def leftOuter(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int = 4096, d: Int = 4,
      cms: Option[Array[Array[Long]]] = None,
      maxHotDimRows: Long = 100000L): DataFrame =
    split(fact, dim, key, hotThreshold, w, d, "left_outer", cms, maxHotDimRows)

  /** Salted spelling, inner: ONE scan and ONE shuffle of the fact.
    * Hot fact rows get a content-derived salt in [0, nSalts); hot dim
    * rows are replicated once per salt; cold rows on both sides carry
    * salt 0; the join runs on (key, salt). Each hot key spreads over
    * nSalts reducers instead of one, and the fact never splits into
    * two scan branches — the spelling to use when the fact SCAN
    * dominates (the usual 100 TB case). `inner` wins only when the
    * hot slice is so large that not shuffling it at all (broadcast)
    * beats spreading it. Replication cost is bounded by
    * nSalts × |hot dim rows|, on the small side; a saturated sketch
    * degrades to salting most of the dim — heavier, never wrong. */
  def innerSalted(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, nSalts: Int = 32, w: Int = 4096, d: Int = 4,
      cms: Option[Array[Array[Long]]] = None): DataFrame =
    salted(fact, dim, key, hotThreshold, nSalts, w, d, "inner", cms)

  /** Salted spelling, left-outer — same one-scan/one-shuffle shape;
    * null and unmatched fact keys ride the salt-0 lane and null-extend. */
  def leftOuterSalted(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, nSalts: Int = 32, w: Int = 4096, d: Int = 4,
      cms: Option[Array[Array[Long]]] = None): DataFrame =
    salted(fact, dim, key, hotThreshold, nSalts, w, d, "left_outer", cms)

  // 60 uniform bits of xxhash64 over the stringified key (stringify so
  // INT and BIGINT spellings of the same key hash identically across
  // the two sides). xxhash64's avalanche makes its disjoint bit slices
  // independent row functions — the property CountMin's bit-sliced rows
  // need — and it is pure codegen at ~ns/row. The md5/conv spelling the
  // ORACLE queries share is reserved for oracle-replayed sketches: here
  // the hash is PHYSICAL state (it only routes rows between regimes —
  // any strong hash yields the identical join result), and inside a
  // FILTER (which, unlike Project, does no common-subexpression
  // elimination) the md5 chain would be re-evaluated once per sketch
  // row — measured 4-6× the whole plain join's cost at 3M rows.
  private def keyHash(key: String): Column =
    pmod(xxhash64(col(key).cast("string")), lit(1L << 60))

  /** Map-side hot predicate: null-safe (null keys are never hot — they
    * match nothing in either join type and must not reach the sketch
    * probe), deterministic (the sketch matrix is a fixed literal), and
    * IDENTICAL on both sides — which is what makes the regime split
    * consistent without any collected key set. */
  private def isHotCol(matrix: Array[Array[Long]], w: Int, key: String,
      hotThreshold: Long): Column =
    col(key).isNotNull && CountMin.estimate(matrix, w, keyHash(key)) >= hotThreshold

  private def resolve(fact: DataFrame, key: String, w: Int, d: Int,
      cms: Option[Array[Array[Long]]]): Array[Array[Long]] = {
    cms.foreach { m =>
      require(m.length == d && m.forall(_.length == w),
        s"pre-built sketch is ${m.length}×${m.headOption.fold(0)(_.length)}, expected $d×$w")
    }
    cms.getOrElse(sketch(fact, key, w, d))
  }

  private def split(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, w: Int, d: Int, joinType: String,
      cms: Option[Array[Array[Long]]], maxHotDimRows: Long): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    val matrix = resolve(fact, key, w, d, cms)
    val isHot = isHotCol(matrix, w, key, hotThreshold)
    // the guard aggregate runs over the SMALL side only; zero hot dim
    // rows (uniform data, or every hot fact key unmatched) and a
    // saturated sketch both take the plain join
    val nHotDim = dim.filter(isHot).count()
    if (nHotDim == 0 || nHotDim > maxHotDimRows) fact.join(dim, Seq(key), joinType)
    else {
      val hotSide = fact.filter(isHot)
        .join(broadcast(dim.filter(isHot)), Seq(key), joinType)
      // !isHot is true for null keys (three-valued: !(false && null) = true),
      // so nulls ride the cold lane and null-extend under left_outer
      val coldSide = fact.filter(!isHot)
        .join(dim.filter(!isHot), Seq(key), joinType)
      hotSide.unionByName(coldSide)
    }
  }

  private def salted(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, nSalts: Int, w: Int, d: Int, joinType: String,
      cms: Option[Array[Array[Long]]]): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    require(nSalts >= 1, s"nSalts must be >= 1 (got $nSalts)")
    val matrix = resolve(fact, key, w, d, cms)
    val isHot = isHotCol(matrix, w, key, hotThreshold)
    // fact salt: a content hash of the whole row — deterministic under
    // task retry, varies WITHIN a hot key so its rows spread; the salt
    // only routes rows, it never appears in the output
    val rowHash = hash(fact.columns.map(col).toIndexedSeq: _*)
    val saltedFact = fact.withColumn("__salt",
      when(isHot, pmod(rowHash.cast("long"), lit(nSalts.toLong))).otherwise(lit(0L)))
    // dim side: hot rows exist at EVERY salt (each fact row meets each
    // matching dim row exactly once, at its own salt), cold rows only
    // at salt 0
    val saltedDim = dim
      .withColumn("__salts",
        when(isHot, sequence(lit(0L), lit(nSalts.toLong - 1))).otherwise(array(lit(0L))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts")
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
