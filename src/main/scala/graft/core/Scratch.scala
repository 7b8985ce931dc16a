package graft.core

/** Deterministic per-(tag, input) scratch directories for queries that
  * must materialize intermediate tables (one-big-table layouts, stream
  * replay file sources, persisted search indexes).
  *
  * `Files.createTempDirectory` mints a FRESH directory per invocation,
  * so repeated Verify/Bench runs accumulate multi-GB temp data at sf1+
  * (nothing ever deletes a previous run's copy). A scratch dir instead
  * is a FIXED path derived from (tag, key): the same query over the
  * same data dir lands on the same path every time, and the dir is
  * wiped-and-recreated on entry — a rerun REPLACES the previous run's
  * bytes instead of adding to them. The wipe also covers streaming
  * checkpoints, which must never be reused across runs (a stale
  * checkpoint would see "no new files" and emit nothing).
  *
  * Concurrency contract: two concurrent invocations of the SAME query
  * over the SAME data dir would race on the path — the workflow
  * (Verify, Bench, the driver) runs entries sequentially, and distinct
  * queries/data dirs never collide (the key hash separates them).
  */
object Scratch {

  private val root = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_scratch")

  /** The (tag, key) path WITHOUT wiping — for reads of a scratch
    * table a prior [[dir]] call in the same process populated. */
  def path(tag: String, key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    new java.io.File(root, s"${tag}_$h").toString
  }

  /** A wiped, freshly-created scratch dir unique to (tag, key). */
  def dir(tag: String, key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val d = new java.io.File(root, s"${tag}_$h")
    deleteRecursively(d)
    if (!d.mkdirs() && !d.isDirectory)
      throw new java.io.IOException(s"could not create scratch dir $d")
    d.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}
