package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted epoch-shuffle index — the resume path for the training
  * loader's seeded corpus permutation (the `pipe_epoch_shuffle`
  * semantics made restart-cheap).
  *
  * The epoch position of a document is a pure function of (seed,
  * doc id): its rank in (hash, id) order, with the hash an md5-prefix
  * draw keyed by `"ep<seed>:" ++ id` — reproducible across engines and
  * runs, no RNG state. [[permutation]] derives it in-flight via the
  * [[PrefixSum]] bucketed global rank (an unpartitioned rank window
  * would serialize the corpus through one reducer — the battery-wide
  * ban). That derivation costs a full scan + shuffle, which is the
  * right price ONCE per epoch — but a crashed loader that re-derives
  * it on every restart pays it per restart, and at 100 TB that is the
  * difference between "resume in seconds" and "re-shuffle the corpus".
  *
  * [[write]] therefore materializes the permutation AT EPOCH START:
  * `(pos, id, hv)` range-partitioned and sorted by `pos`
  * ([[graft.sources.Sinks.writeSortedBy]] — each file covers one
  * disjoint position span) with a file-level [[Manifest]] keyed on
  * `pos`. [[resume]] is then ONE manifest-pruned scan: the slice
  * (from, until] touches only the files whose position span intersects
  * it — O(slice) files and bytes, no shuffle, no window, no rescan of
  * the corpus. [[candidateFiles]] exposes the pruning for telemetry
  * (the bench's files_read cell).
  *
  * Scale shape: the index row is ~24 bytes + the id — even a 10⁹-doc
  * corpus indexes in tens of GB, one range-partitioned write. Loader
  * restarts within an epoch hit [[resume]]; the next epoch writes a
  * fresh index under its own seed dir (the old one is droppable — it
  * is a pure function of the corpus and seed).
  */
object EpochShuffle {

  /** The in-flight epoch permutation of `docs`: one row per input row
    * with `pos` (1-based rank in the seeded order), the id column, and
    * `hv` (the 60-bit md5-prefix draw). The order key is the
    * fixed-width digit-string concat of (hv, id) — monotone in
    * (hv, id) without the long-product overflow (`hv · 10¹⁰ + id`
    * would cross 2⁶³). The id pad is 19 digits (covers every positive
    * bigint); an id that still overflows it fails LOUDLY in-plan —
    * Spark's lpad silently TRUNCATES longer strings, which would
    * collide truncated siblings and break the seeded-bijection
    * contract nondeterministically. The guard rides the projection
    * itself (no extra validation scan). */
  def permutation(docs: DataFrame, idCol: String, seed: Int,
      knownCount: Option[Long] = None): DataFrame = {
    val idStr = col(idCol).cast("string")
    val keyed = docs
      .withColumn("hv", expr(
        s"CAST(conv(substr(md5(concat('ep$seed:', CAST($idCol AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("__ord", concat(
        lpad(col("hv").cast("string"), 19, "0"),
        when(length(idStr) > 19, raise_error(concat(
          lit(s"EpochShuffle: $idCol value "), idStr,
          lit(" exceeds the 19-char order-key pad; lpad would " +
            "truncate and collide ids"))))
          .otherwise(lpad(idStr, 19, "0"))))
      .withColumn("__g", lit(0))
      .withColumn("__one", lit(1L))
    val n = knownCount.getOrElse(docs.count())
    PrefixSum.withCumsum(keyed, "__g", "__ord", "__one",
      outCol = "pos", knownCount = Some(n))
      .select(col("pos"), col(idCol), col("hv"))
  }

  /** Materialize the epoch's permutation under `outDir`: position-
    * range-partitioned sorted data files + a `pos`-keyed manifest.
    * This is the once-per-epoch cost; every [[resume]] after it is a
    * pruned scan. */
  def write(docs: DataFrame, idCol: String, seed: Int, outDir: String,
      numFiles: Int = 32, knownCount: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    val perm = permutation(docs, idCol, seed, knownCount)
    graft.sources.Sinks.writeSortedBy(perm, s"$outDir/data", Seq("pos"),
      numFiles = numFiles)
    Manifest.write(spark, s"$outDir/data", s"$outDir/manifest", Seq("pos"))
  }

  /** The mid-epoch slice (from, until] — rows with
    * `from < pos <= until` — as one manifest-pruned scan of the
    * persisted index: only files whose position span intersects the
    * slice are opened. The loader's restart call. */
  def resume(spark: SparkSession, outDir: String, from: Long,
      until: Long): DataFrame =
    Manifest.readRange(spark, s"$outDir/data", s"$outDir/manifest",
      "pos", from + 1, until)

  /** Files a [[resume]] of (from, until] would open — the pruning
    * telemetry (must stay O(slice / rows-per-file), not O(index)). */
  def candidateFiles(spark: SparkSession, outDir: String, from: Long,
      until: Long): Array[String] =
    Manifest.candidateFiles(spark, s"$outDir/manifest", "pos",
      from + 1, until)
}
