package graft.sources

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** S6 cache semantics with a counting fake transport — pure JVM, no
  * network, no SparkSession. */
class FetchSpec extends AnyFunSuite {

  private def cacheWithCounter(payload: String = "a,b\n1,2\n") = {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val root = Files.createTempDirectory("fetch").toString
    val cache = new Fetch.FileCache(root, url => {
      calls.incrementAndGet()
      s"$payload".getBytes(StandardCharsets.UTF_8)
    })
    (cache, calls, root)
  }

  test("cache hit skips the transport; force and useCache=false bypass it") {
    val (cache, calls, _) = cacheWithCounter()
    val first = cache.fetch("https://example/x.csv", "x/2023.csv")
    assert(!first.fromCache && calls.get() == 1)
    val second = cache.fetch("https://example/x.csv", "x/2023.csv")
    assert(second.fromCache && calls.get() == 1) // no new transport call
    assert(second.path == first.path)
    cache.fetch("https://example/x.csv", "x/2023.csv", force = true)
    assert(calls.get() == 2)
    cache.fetch("https://example/x.csv", "x/2023.csv", useCache = false)
    assert(calls.get() == 3)
  }

  test("writes are atomic: no temp droppings, content lands complete") {
    val (cache, _, root) = cacheWithCounter("payload")
    val out = cache.fetch("https://example/y", "y.bin").path
    assert(Files.readString(out) == "payload")
    val stray = Files.list(out.getParent).filter(_.getFileName.toString.startsWith(".fetch-")).count()
    assert(stray == 0, "temp files must be moved or deleted")
  }

  test("corrupted cache entry is deleted, re-fetched with force, re-parsed") {
    val (cache, calls, root) = cacheWithCounter("good")
    // poison the cache entry directly (corruption at rest)
    val poisoned = java.nio.file.Paths.get(root, "z.csv")
    Files.createDirectories(poisoned.getParent)
    Files.writeString(poisoned, "CORRUPt")
    def parse(p: Path): String = {
      val s = Files.readString(p)
      if (s.startsWith("CORRUP")) throw new IllegalStateException("parser choke")
      s
    }
    val parsed = cache.fetchParsed("https://example/z.csv", "z.csv")(parse)
    assert(parsed == "good")
    assert(calls.get() == 1) // exactly one forced re-fetch
    // a FRESH fetch whose parse fails propagates (source is bad, not cache)
    val badCache = new Fetch.FileCache(
      Files.createTempDirectory("fetch2").toString, _ => "CORRUPT".getBytes)
    intercept[IllegalStateException] {
      badCache.fetchParsed("https://example/w.csv", "w.csv")(parse)
    }
  }

  test("URL builders match the reference byte-for-byte; ISD year fan-in layout") {
    assert(Fetch.isdUrl("725030", "14732", 2023) ==
      "https://www.ncei.noaa.gov/data/global-hourly/access/2023/72503014732.csv")
    assert(Fetch.ghcnhUrl("USW00014732") ==
      "https://www.ncei.noaa.gov/data/global-historical-climatology-network-hourly/access/USW00014732.psv")
    val (cache, calls, _) = cacheWithCounter()
    val fetched = cache.fetchIsdYears("725030", "14732", 2022 to 2024)
    assert(fetched.size == 3 && calls.get() == 3)
    assert(fetched.map(_.path.getFileName.toString) == Seq("2022.csv", "2023.csv", "2024.csv"))
    // second sweep is all cache hits
    assert(cache.fetchIsdYears("725030", "14732", 2022 to 2024).forall(_.fromCache))
    assert(calls.get() == 3)
  }
}
