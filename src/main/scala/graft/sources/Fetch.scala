package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** S6: fetch + cache — the Spark-side counterpart of the reference's
  * download machinery (fetch/noaa_hourly.py:103-118 `download_file`,
  * :395-417 per-year fetch with corrupted-cache recovery).
  *
  * Division of labor at 100 TB: fetching is DRIVER-side I/O that lands
  * raw files into a cache directory (in production an object store
  * mounted path); Spark then scans the cached files in parallel. The
  * transport (URL → bytes) is injectable, like the S5 NetCDF extractor:
  * the real HTTP client lives outside the library, tests and offline
  * runs inject a fake, and everything around it — cache-hit skip,
  * atomic writes, corruption recovery, URL construction — is real and
  * tested here.
  *
  * Two deliberate improvements over the reference:
  *  - writes are ATOMIC (temp file + move), so a crashed fetch never
  *    leaves a half-written cache entry; the reference instead repairs
  *    corruption after the fact when the parser chokes
  *    (noaa_hourly.py:406-417) — `fetchParsed` keeps that recovery path
  *    too, for entries corrupted at rest.
  *  - the cache root is explicit (no global working-dir assumption), so
  *    concurrent pipelines can share or isolate caches deliberately.
  */
object Fetch {

  /** URL → payload bytes. Throwing signals a failed fetch. */
  type Transport = String => Array[Byte]

  final case class Fetched(path: Path, fromCache: Boolean)

  // URL builders (noaa_hourly.py:90-101) — kept byte-identical so cache
  // layouts produced by either implementation interoperate.
  private val IsdBase = "https://www.ncei.noaa.gov/data/global-hourly/access"
  private val GhcnhBase =
    "https://www.ncei.noaa.gov/data/global-historical-climatology-network-hourly/access"

  def isdUrl(usaf: String, wban: String, year: Int): String =
    s"$IsdBase/$year/$usaf$wban.csv"

  def ghcnhUrl(ghcnId: String): String = s"$GhcnhBase/$ghcnId.psv"

  final class FileCache(root: String, transport: Transport) {

    /** download_file semantics (noaa_hourly.py:103-118): cache hit
      * returns the existing file unless forced; a miss fetches through
      * the transport and writes atomically. */
    def fetch(url: String, relPath: String,
        force: Boolean = false, useCache: Boolean = true): Fetched = {
      val out = Paths.get(root, relPath)
      if (useCache && !force && Files.exists(out)) Fetched(out, fromCache = true)
      else {
        if (out.getParent != null) Files.createDirectories(out.getParent)
        val bytes = transport(url)
        val tmp = Files.createTempFile(out.getParent, ".fetch-", ".tmp")
        try {
          Files.write(tmp, bytes)
          Files.move(tmp, out, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        } finally Files.deleteIfExists(tmp)
        Fetched(out, fromCache = false)
      }
    }

    /** Fetch + parse with corrupted-cache recovery
      * (noaa_hourly.py:406-417): when parsing a cached file fails, the
      * entry is deleted, re-fetched with force, and parsed once more —
      * a second failure propagates (the source itself is bad, not the
      * cache). */
    def fetchParsed[T](url: String, relPath: String)(parse: Path => T): T = {
      val first = fetch(url, relPath)
      try parse(first.path)
      catch {
        case scala.util.control.NonFatal(_) if first.fromCache =>
          Files.deleteIfExists(first.path)
          parse(fetch(url, relPath, force = true).path)
      }
    }

    /** Per-year ISD fan-in (noaa_hourly.py:395-405): one cached CSV per
      * year, named `<year>.csv` like the reference's cache layout. */
    def fetchIsdYears(usaf: String, wban: String, years: Range): Seq[Fetched] =
      years.map(y => fetch(isdUrl(usaf, wban, y), s"isd/$usaf$wban/$y.csv"))
  }
}
