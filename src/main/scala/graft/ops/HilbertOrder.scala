package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality-preserving completion of
  * [[ZOrder]]: Morton interleaving is cheap (one mask ladder) but the
  * z-curve JUMPS — consecutive keys can sit in opposite corners of a
  * quadrant boundary, so a rectangle query's key range covers runs of
  * unrelated cells and row groups straddle spatial seams. The Hilbert
  * curve visits every cell of the 2^bits × 2^bits grid through
  * 4-NEIGHBOR steps only (each key's cell touches the next key's cell —
  * pinned exhaustively in HilbertOrderSpec), so equal-size key ranges
  * cover tighter rectangles: measurably fewer row groups intersect a
  * 2-dim predicate than under Morton at the same file count (the
  * scan_*_hilbert vs scan_*_zorder BENCH cells). The price is compute:
  * the index is a 16-step rotate/reflect recurrence instead of one
  * mask ladder — paid ONCE at write time, like every layout decision.
  *
  * The recurrence is the standard xy2d walk (top bit to bottom):
  *
  *   rx = bit i of x;  ry = bit i of y
  *   d += s²·((3·rx) XOR ry)            (s = 2^i)
  *   if ry = 0: reflect when rx = 1 (x,y ← s−1−x, s−1−y), then swap x,y
  *
  * Everything is exact integer Column arithmetic (the XOR of the 2-bit
  * quadrant code is spelled as a CASE so the oracle needs no xor()
  * builtin), and each step is its OWN projection over fresh attribute
  * references — the expression tree stays linear where inlining the
  * recurrence would double it per step. Bucketization reuses
  * [[ZOrder.bucket]] (exact floor math, driver-known bounds).
  */
object HilbertOrder {

  /** Bits per dimension (16 → a 32-bit Hilbert key, same key space as
    * [[ZOrder.interleave16]]). */
  val DimBits = 16

  /** The PRODUCTION key: the native codegen expression
    * ([[graft.functions.HilbertIndex2]] — one generated-Java loop, no
    * intermediate columns; measured 13 s → sub-second for the sf1 key
    * build vs the 16-projection Column spelling below, which stays as
    * the cross-check). Registers the function on the frame's session
    * (idempotent). */
  def withHilbertKeyNative(df: DataFrame, bx: Column, by: Column,
      out: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // temp names must not collide with user columns — a fixed "__hbx"
    // would silently overwrite-and-drop a real column of that name
    val taken = df.columns.toSet
    val nx = Iterator.from(0).map(i => s"__hbx$i").find(!taken(_)).get
    val ny = Iterator.from(0).map(i => s"__hby$i").find(!taken(_)).get
    df.withColumn(nx, bx.cast("long")).withColumn(ny, by.cast("long"))
      .withColumn(out, expr(s"hilbert2(`$nx`, `$ny`)"))
      .drop(nx, ny)
  }

  /** The 3-D production key: native [[graft.functions.HilbertIndex3]]
    * (Skilling transpose walk, one generated-Java call per row). Inputs
    * must be bucket ids in [0, 2^21) (ZOrder.bucket at DimBits3). */
  def withHilbert3KeyNative(df: DataFrame, bx: Column, by: Column,
      bz: Column, out: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val taken = df.columns.toSet
    val nx = Iterator.from(0).map(i => s"__hbx$i").find(!taken(_)).get
    val ny = Iterator.from(0).map(i => s"__hby$i").find(!taken(_)).get
    val nz = Iterator.from(0).map(i => s"__hbz$i").find(!taken(_)).get
    df.withColumn(nx, bx.cast("long")).withColumn(ny, by.cast("long"))
      .withColumn(nz, bz.cast("long"))
      .withColumn(out, expr(s"hilbert3(`$nx`, `$ny`, `$nz`)"))
      .drop(nx, ny, nz)
  }

  /** Appends `out` = Hilbert index of the bucketized pair. `bx`/`by`
    * must already be bucket indices in [0, 2^bits). */
  def withHilbertKey(df: DataFrame, bx: Column, by: Column, out: String,
      bits: Int = DimBits): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(!df.columns.exists(Set("__hx", "__hy")),
      "input already carries the reserved __hx/__hy scratch columns — " +
        "rename them or use withHilbertKeyNative (collision-free names)")
    var cur = df.withColumns(Map(
      "__hx" -> bx.cast("long"), "__hy" -> by.cast("long"), out -> lit(0L)))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rxb = col("__hx").bitwiseAND(lit(s)) =!= 0L
      val ryb = col("__hy").bitwiseAND(lit(s)) =!= 0L
      // (3·rx) XOR ry over rx,ry ∈ {0,1} enumerated as a CASE — the
      // identical spelling the generated oracle uses
      val quad = when(rxb, when(ryb, lit(2L)).otherwise(lit(3L)))
        .otherwise(when(ryb, lit(1L)).otherwise(lit(0L)))
      val nx = when(!ryb,
        when(rxb, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
        .otherwise(col("__hx"))
      val ny = when(!ryb,
        when(rxb, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
        .otherwise(col("__hy"))
      // one projection per step, all three columns rebound from the SAME
      // input frame (withColumns is atomic — nx must read the OLD __hy)
      cur = cur.withColumns(Map(
        out -> (col(out) + lit(s * s) * quad), "__hx" -> nx, "__hy" -> ny))
    }
    cur.drop("__hx", "__hy")
  }

  /** Hilbert-clustered layout for two long-valued columns with
    * driver-known bounds — the [[ZOrder.writeZOrderedBy]] twin. */
  def writeHilbertOrderedBy(df: DataFrame, dir: String, xCol: String,
      yCol: String, numFiles: Int = 0): Unit = {
    val aggs = Seq(xCol, yCol)
      .flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val Array(b) = df.agg(aggs.head, aggs.drop(1): _*).collect()
    if (b.toSeq.indices.exists(b.isNullAt)) {
      // nothing to cluster (empty / all-null dim) — plain write, the
      // ZOrder.writeByKey None contract
      df.write.mode("overwrite").parquet(dir)
    } else {
      val bx = ZOrder.bucket(col(xCol).cast("long"), b.getLong(0), b.getLong(1))
      val by = ZOrder.bucket(col(yCol).cast("long"), b.getLong(2), b.getLong(3))
      val keyed = withHilbertKeyNative(df, bx, by, "__h")
      val ranged =
        if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__h"))
        else keyed.repartitionByRange(col("__h"))
      ranged.sortWithinPartitions(col("__h")).drop("__h")
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** 3-D Hilbert-clustered layout — the [[graft.ops.ZOrder
    * .writeZOrdered3By]] twin for (time, entity, domain) fact tables:
    * the Hilbert walk's 6-neighbor unit steps cover tighter boxes than
    * Morton's octant jumps at the same file count. Buckets at 21
    * bits/dim (the hilbert3 kernel's key space). */
  def writeHilbert3OrderedBy(df: DataFrame, dir: String, xCol: String,
      yCol: String, zCol: String, numFiles: Int = 0): Unit = {
    val dims = Seq(xCol, yCol, zCol)
    val aggs = dims.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val Array(b) = df.agg(aggs.head, aggs.drop(1): _*).collect()
    if (b.toSeq.indices.exists(b.isNullAt)) {
      df.write.mode("overwrite").parquet(dir)
    } else {
      val bits = ZOrder.DimBits3
      val bk = dims.zipWithIndex.map { case (c, i) =>
        ZOrder.bucket(col(c).cast("long"), b.getLong(2 * i), b.getLong(2 * i + 1), bits)
      }
      val keyed = withHilbert3KeyNative(df, bk(0), bk(1), bk(2), "__h")
      val ranged =
        if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__h"))
        else keyed.repartitionByRange(col("__h"))
      ranged.sortWithinPartitions(col("__h")).drop("__h")
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** The DuckDB spelling of [[withHilbertKey]] as a chain of
    * MATERIALIZED CTEs (one per step — materialization keeps the
    * unrolled chain from re-opening the scan per reference). Expects a
    * prior CTE `from` exposing (`idCol`, x, y, d) with d = 0; exposes
    * `h${bits-1}` with the final d. */
  def oracleSteps(idCol: String, from: String, bits: Int = DimBits): String =
    (0 until bits).map { k =>
      val i = bits - 1 - k
      val s = 1L << i
      val prev = if (k == 0) from else s"h${k - 1}"
      s"""h$k AS MATERIALIZED (
         |  SELECT $idCol,
         |    d + CAST(${s * s} AS BIGINT) * (CASE WHEN (x & $s) != 0
         |      THEN (CASE WHEN (y & $s) != 0 THEN 2 ELSE 3 END)
         |      ELSE (CASE WHEN (y & $s) != 0 THEN 1 ELSE 0 END) END) AS d,
         |    CASE WHEN (y & $s) = 0
         |      THEN (CASE WHEN (x & $s) != 0 THEN ${s - 1} - y ELSE y END)
         |      ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0
         |      THEN (CASE WHEN (x & $s) != 0 THEN ${s - 1} - x ELSE x END)
         |      ELSE y END AS y
         |  FROM $prev)""".stripMargin
    }.mkString(", ")
}
