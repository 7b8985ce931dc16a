package graft.sources

import graft.SparkSpec

/** NetCDF3 classic reader spec. The fixtures are built BY HAND from the
  * public CDF-1 on-disk layout (see [[NcFixture]]), independently of the
  * reader code.
  */
class NetCdf3Spec extends SparkSpec {

  import NcFixture.{FAttr, FDim, FVar, build}

  // ---- fixtures ----

  private val era5Attrs = Seq(
    FAttr("scale_factor", 6, Seq(0.01)),
    FAttr("add_offset", 6, Seq(280.0)),
    FAttr("_FillValue", 3, Seq(-32767.0)))

  /** ERA5-shaped fixed-dim file: t2m(time=3, latitude=2, longitude=2),
    * packed shorts, one fill value at (t=2, cell 0,0). */
  private def fixtureA: Array[Byte] = build(
    dims = Seq(FDim("time", 3), FDim("latitude", 2), FDim("longitude", 2)),
    vars = Seq(
      FVar("latitude", Seq(1), Nil, 5, Seq(40.5, 41.0)),
      FVar("longitude", Seq(2), Nil, 5, Seq(-74.0, -73.5)),
      FVar("time", Seq(0),
        Seq(FAttr("units", 2, "hours since 1900-01-01 00:00:00.0")), 4,
        Seq(1000000.0, 1000001.0, 1000002.0)),
      FVar("t2m", Seq(0, 1, 2), era5Attrs, 3,
        // row-major (time, lat, lon); cell (0,0) carries 100+t, others junk
        Seq(100, 1, 2, 3, /*t=1*/ 101, 4, 5, 6, /*t=2*/ -32767, 7, 8, 9).map(_.toDouble))),
    numRecs = 0)

  test("fixed-dim ERA5 extract: nearest cell, packed shorts, CF time, fill→NaN") {
    val out = Ingest.fromEra5NetCdf(spark, fixtureA, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(out.length == 3)
    // station (40.7, -73.9) → lat 40.5 (|0.2|<|0.3|), lon -74.0 (|0.1|<|0.4|)
    // t2m K = 280 + 0.01·(100+t) → °C = 280 + 1.00 − 273.15 + 0.01t
    assert(math.abs(out(0).getAs[Double]("temp_c") - (280 + 1.00 - 273.15)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("temp_c") - (280 + 1.01 - 273.15)) < 1e-9)
    assert(out(2).getAs[Double]("temp_c").isNaN) // fill value
    // 1,000,000 hours since 1900-01-01, via an independent java.time path
    val expect0 = java.time.LocalDateTime.of(1900, 1, 1, 0, 0)
      .plusHours(1000000L).toEpochSecond(java.time.ZoneOffset.UTC) * 1000L
    assert(out(0).getAs[java.sql.Timestamp]("ts_utc").getTime == expect0)
    assert(out(0).getAs[String]("source") == "era5" && out(0).getAs[String]("station_id") == "KLGA")
  }

  /** Record-dim file with TWO record variables — exercises per-record
    * slab padding (t2m is 2 bytes/record → padded to 4 in the stride). */
  private def fixtureB: Array[Byte] = build(
    dims = Seq(FDim("time", 0), FDim("latitude", 1), FDim("longitude", 1)),
    vars = Seq(
      FVar("latitude", Seq(1), Nil, 5, Seq(40.5)),
      FVar("longitude", Seq(2), Nil, 5, Seq(-74.0)),
      FVar("time", Seq(0),
        Seq(FAttr("units", 2, "seconds since 1970-01-01")), 4, Seq(3600.0, 7200.0)),
      FVar("t2m", Seq(0, 1, 2),
        Seq(FAttr("scale_factor", 6, Seq(0.1)), FAttr("add_offset", 6, Seq(250.0))), 3,
        Seq(123.0, 456.0))),
    numRecs = 2)

  test("record-dim file: interleaved record slabs with padding decode correctly") {
    val out = Ingest.fromEra5NetCdf(spark, fixtureB, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(out.length == 2)
    assert(out(0).getAs[java.sql.Timestamp]("ts_utc").getTime == 3600L * 1000)
    assert(out(1).getAs[java.sql.Timestamp]("ts_utc").getTime == 7200L * 1000)
    assert(math.abs(out(0).getAs[Double]("temp_c") - (250 + 12.3 - 273.15)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("temp_c") - (250 + 45.6 - 273.15)) < 1e-9)
  }

  test("single record variable packs unpadded (the spec's special case)") {
    val bytes = build(
      dims = Seq(FDim("time", 0)),
      vars = Seq(FVar("x", Seq(0), Nil, 3, Seq(7.0, 8.0, 9.0))),
      numRecs = 3)
    val f = NetCdf3.parse(bytes)
    val (shp, vals) = NetCdf3.readVar(f, "x")
    assert(shp == Seq(3) && vals.toSeq == Seq(7.0, 8.0, 9.0))
  }

  test("temperature dim order is honored via strides, not assumed") {
    // same data as fixtureA's t=0/1 cells but t2m laid out (lat, lon, time)
    val bytes = build(
      dims = Seq(FDim("time", 2), FDim("latitude", 2), FDim("longitude", 2)),
      vars = Seq(
        FVar("latitude", Seq(1), Nil, 5, Seq(40.5, 41.0)),
        FVar("longitude", Seq(2), Nil, 5, Seq(-74.0, -73.5)),
        FVar("time", Seq(0),
          Seq(FAttr("units", 2, "seconds since 1970-01-01")), 4, Seq(0.0, 3600.0)),
        FVar("t2m", Seq(1, 2, 0), // (lat, lon, time)!
          Seq(FAttr("scale_factor", 6, Seq(0.01)), FAttr("add_offset", 6, Seq(280.0))), 3,
          // row-major (lat, lon, time): cell (0,0) times are the FIRST pair
          Seq(100, 101, /*lon1*/ 1, 2, /*lat1*/ 3, 4, 5, 6).map(_.toDouble))),
      numRecs = 0)
    val out = Ingest.fromEra5NetCdf(spark, bytes, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(math.abs(out(0).getAs[Double]("temp_c") - (280 + 1.00 - 273.15)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("temp_c") - (280 + 1.01 - 273.15)) < 1e-9)
  }

  test("STREAMING numrecs sentinel (0xFFFFFFFF) derives the count from the byte length") {
    val bytes = build(
      dims = Seq(FDim("time", 0), FDim("latitude", 1), FDim("longitude", 1)),
      vars = Seq(
        FVar("latitude", Seq(1), Nil, 5, Seq(40.5)),
        FVar("longitude", Seq(2), Nil, 5, Seq(-74.0)),
        FVar("time", Seq(0),
          Seq(FAttr("units", 2, "seconds since 1970-01-01")), 4, Seq(3600.0, 7200.0)),
        FVar("t2m", Seq(0, 1, 2), Nil, 3, Seq(280.0, 281.0))),
      numRecs = 2)
    // overwrite the numrecs header field with the streaming sentinel
    bytes(4) = 0xff.toByte; bytes(5) = 0xff.toByte
    bytes(6) = 0xff.toByte; bytes(7) = 0xff.toByte
    val f = NetCdf3.parse(bytes)
    assert(f.numRecs == 2)
    val out = Ingest.fromEra5NetCdf(spark, bytes, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(out.length == 2)
    assert(math.abs(out(1).getAs[Double]("temp_c") - (281.0 - 273.15)) < 1e-9)
  }

  test("fill-masked time coordinates drop the row instead of aliasing to the base epoch") {
    val bytes = build(
      dims = Seq(FDim("time", 3), FDim("latitude", 1), FDim("longitude", 1)),
      vars = Seq(
        FVar("latitude", Seq(1), Nil, 5, Seq(40.5)),
        FVar("longitude", Seq(2), Nil, 5, Seq(-74.0)),
        FVar("time", Seq(0),
          Seq(FAttr("units", 2, "seconds since 1970-01-01"),
            FAttr("_FillValue", 4, Seq(-2147483647.0))), 4,
          Seq(3600.0, -2147483647.0, 7200.0)), // middle entry is fill
        FVar("t2m", Seq(0, 1, 2), Nil, 3, Seq(280.0, 281.0, 282.0))),
      numRecs = 0)
    val out = Ingest.fromEra5NetCdf(spark, bytes, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(out.length == 2) // the fill-timed row is gone, not at 1970-01-01
    assert(out.map(_.getAs[java.sql.Timestamp]("ts_utc").getTime).toSeq ==
      Seq(3600000L, 7200000L))
    assert(math.abs(out(1).getAs[Double]("temp_c") - (282.0 - 273.15)) < 1e-9)
  }

  test("fromEra5NetCdfDir parses every .nc file on executors and unions the rows") {
    val work = java.nio.file.Files.createTempDirectory("graft_nc_dir")
    def monthFile(baseHour: Int, n: Int): Array[Byte] = build(
      dims = Seq(FDim("time", n), FDim("latitude", 1), FDim("longitude", 1)),
      vars = Seq(
        FVar("latitude", Seq(1), Nil, 5, Seq(40.5)),
        FVar("longitude", Seq(2), Nil, 5, Seq(-74.0)),
        FVar("time", Seq(0),
          Seq(FAttr("units", 2, "hours since 2024-06-01 00:00:00")), 4,
          (0 until n).map(i => (baseHour + i).toDouble)),
        FVar("t2m", Seq(0, 1, 2), Nil, 3,
          (0 until n).map(i => (280 + baseHour + i).toDouble))),
      numRecs = 0)
    java.nio.file.Files.write(work.resolve("m1.nc"), monthFile(0, 5))
    java.nio.file.Files.write(work.resolve("m2.nc"), monthFile(5, 7))
    java.nio.file.Files.write(work.resolve("ignored.txt"), Array[Byte](1, 2, 3))
    val out = Ingest.fromEra5NetCdfDir(spark, work.toString, "KLGA", 40.7, -73.9)
      .orderBy("ts_utc").collect()
    assert(out.length == 12) // 5 + 7, the .txt filtered by the glob
    out.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("temp_c") - (280 + i - 273.15)) < 1e-9)
    }
    assert(out(0).getAs[String]("source") == "era5")
  }

  test("NetCDF-4 (HDF5) files are rejected with a clear error") {
    val hdf5 = Array[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a)
    val e = intercept[IllegalArgumentException] { NetCdf3.parse(hdf5) }
    assert(e.getMessage.contains("HDF5"))
  }

  test("CF time base parsing covers the spellings ERA5 ships") {
    import NetCdf3.parseBase
    assert(parseBase("1900-01-01 00:00:00.0") == parseBase("1900-01-01"))
    assert(parseBase("1970-01-01T00:00:00Z") == 0L)
    assert(parseBase("1970-01-01 01:00:00") == 3600L * 1000000)
    assert(parseBase("2024-7-1 6:30") ==
      java.time.LocalDateTime.of(2024, 7, 1, 6, 30)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
  }
}
