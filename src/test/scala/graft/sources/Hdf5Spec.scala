package graft.sources

import graft.SparkSpec

/** NetCDF-4 (HDF5) path: the [[H5Fixture]] writer assembles
  * spec-conformant files byte by byte (superblock v0, symbol-table
  * groups, v1 headers, chunked+shuffle+deflate layouts — the encoding
  * netcdf-c produces), and [[Hdf5]] must read them back exactly;
  * [[Ingest.era5CellSeries]] must dispatch on the magic and produce the
  * same row contract as the classic-CDF path. */
class Hdf5Spec extends SparkSpec {

  import H5Fixture.{FAttr, FDs}

  // 6 hourly steps × 3 lats × 4 lons, CF order (time, lat, lon); packed
  // shorts with scale/offset, one fill hole; time int32 hours since epoch
  private val lats = Array(50.0, 50.25, 50.5)
  private val lons = Array(8.0, 8.25, 8.5, 8.75)
  private val times = Array.tabulate(6)(_.toDouble) // hours since base
  private def packedT2m: Array[Double] = Array.tabulate(6 * 3 * 4) { i =>
    if (i == 13) -32767.0 else (i * 10 + 100).toDouble // fill at (t=1,lat=0,lon=1)
  }

  private def era5File(
      chunked: Boolean, shuffle: Boolean, deflate: Boolean): Array[Byte] =
    H5Fixture.build(Seq(
      FDs("latitude", Seq(3), 1, 4, lats),
      FDs("longitude", Seq(4), 1, 8, lons),
      FDs("time", Seq(6), 0, 4, times,
        attrs = Seq(FAttr("units", "hours since 1990-01-01 00:00:00"))),
      FDs("t2m", Seq(6, 3, 4), 0, 2, packedT2m,
        attrs = Seq(
          FAttr("scale_factor", Array(0.01)),
          FAttr("add_offset", Array(270.0)),
          FAttr("_FillValue", Array(-32767.0))),
        chunkDims = if (chunked) Some(Seq(2, 3, 2)) else None,
        shuffle = shuffle, deflate = deflate)))

  test("parse: superblock, symbol-table group, shapes, dtypes, attributes") {
    val f = Hdf5.parse(era5File(chunked = true, shuffle = true, deflate = true))
    assert(f.vars.map(_.name).sorted == Seq("latitude", "longitude", "t2m", "time"))
    val t2m = f.variable("t2m")
    assert(t2m.shape == Seq(6L, 3L, 4L))
    assert(t2m.dtype == Hdf5.DType(0, 2, littleEndian = true, signed = true))
    assert(t2m.attrs("scale_factor").asInstanceOf[Array[Double]].head == 0.01)
    assert(f.variable("time").attrs("units") == "hours since 1990-01-01 00:00:00")
    assert(t2m.filters.map(_.id) == Seq(2, 1)) // shuffle then deflate
  }

  test("contiguous and chunked+shuffle+deflate layouts read identical values") {
    for ((ch, sh, df) <- Seq((false, false, false), (true, false, false),
        (true, true, false), (true, false, true), (true, true, true))) {
      val f = Hdf5.parse(era5File(ch, sh, df))
      val rdr = new Hdf5.VarReader(f, f.variable("t2m"))
      // spot-check corners + interior across chunk boundaries
      for ((t, la, lo) <- Seq((0, 0, 0), (5, 2, 3), (2, 1, 2), (3, 0, 3), (1, 2, 1))) {
        val expect = packedT2m((t * 3 + la) * 4 + lo)
        assert(rdr.elementAt(Seq(t.toLong, la.toLong, lo.toLong)) == expect,
          s"($t,$la,$lo) chunked=$ch shuffle=$sh deflate=$df")
      }
      val latRdr = new Hdf5.VarReader(f, f.variable("latitude"))
      assert(latRdr.readAll().toSeq == lats.toSeq)
    }
  }

  test("superblock v2 parses identically to v0, and the committed fixture reads known values") {
    val v0 = Hdf5.parse(H5Fixture.build(Seq(
      H5Fixture.FDs("latitude", Seq(3), 1, 4, lats)), sbVersion = 0))
    val v2 = Hdf5.parse(H5Fixture.build(Seq(
      H5Fixture.FDs("latitude", Seq(3), 1, 4, lats)), sbVersion = 2))
    assert(new Hdf5.VarReader(v0, v0.variable("latitude")).readAll().toSeq ==
      new Hdf5.VarReader(v2, v2.variable("latitude")).readAll().toSeq)
    // the committed pipe_era5_hdf5 fixture: sb v2 + chunked/shuffle/deflate
    val fx = GenEra5Fixture.bytes
    val committed = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/resources/graft/era5_sb2.nc4"))
    assert(fx.sameElements(committed),
      "committed era5_sb2.nc4 is stale — rerun Test/runMain graft.sources.GenEra5Fixture")
    val rows = Ingest.era5CellSeries(fx, 50.1, 8.58)
    assert(rows.length == 72)
    assert(rows(23)._2 == 270.0 + 0.25 * (23 + 32)) // K at Jan-1 23:00
    assert(rows(5)._2.isNaN) // the fill hole
  }

  test("era5CellSeries dispatches on the HDF5 magic: nearest cell, CF time, unpack, fill→NaN") {
    val bytes = era5File(chunked = true, shuffle = true, deflate = true)
    // nearest to (50.3, 8.3) → lat index 1, lon index 1
    val rows = Ingest.era5CellSeries(bytes, 50.3, 8.3)
    assert(rows.length == 6)
    val base = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
      .toInstant.toEpochMilli
    rows.zipWithIndex.foreach { case ((ts, k), t) =>
      assert(ts.getTime == base + t * 3600L * 1000L, s"t=$t")
      val packed = packedT2m((t * 3 + 1) * 4 + 1)
      assert(k == packed * 0.01 + 270.0, s"t=$t")
    }
    // the fill hole sits at (t=1, lat=0, lon=1): series at (50.0, 8.25)
    val holed = Ingest.era5CellSeries(bytes, 50.0, 8.25)
    assert(holed(1)._2.isNaN, "fill value must surface as NaN")
    assert(!holed(0)._2.isNaN && !holed(2)._2.isNaN)
  }

  test("extra leading axis (ERA5T expver) pins at index 0; axis order comes from lengths") {
    // (expver=2, time=6, lat=3, lon=4): values in expver 0 = base grid,
    // expver 1 = base + 5000 — reads must come from expver 0
    val grid = packedT2m
    val withExpver = Array.tabulate(2 * 6 * 3 * 4) { i =>
      if (i < grid.length) grid(i) else grid(i - grid.length) + 5000.0
    }
    val bytes = H5Fixture.build(Seq(
      FDs("latitude", Seq(3), 1, 4, lats),
      FDs("longitude", Seq(4), 1, 8, lons),
      FDs("time", Seq(6), 0, 4, times,
        attrs = Seq(FAttr("units", "hours since 1990-01-01 00:00:00"))),
      FDs("t2m", Seq(2, 6, 3, 4), 0, 2, withExpver,
        attrs = Seq(
          FAttr("scale_factor", Array(0.01)),
          FAttr("add_offset", Array(270.0)),
          FAttr("_FillValue", Array(-32767.0))))))
    val rows = Ingest.era5CellSeries(bytes, 50.3, 8.3)
    val packed = packedT2m((0 * 3 + 1) * 4 + 1)
    assert(rows.head._2 == packed * 0.01 + 270.0, "must read expver slice 0")
  }

  test("fromEra5NetCdfDir unions CDF and HDF5 files in one directory") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_nc4mix")
    // an HDF5 month and a classic-CDF month (reusing the CDF fixture)
    java.nio.file.Files.write(dir.resolve("h5month.nc"),
      era5File(chunked = true, shuffle = true, deflate = true))
    val cdfBytes = NcFixture.build(
      dims = Seq(NcFixture.FDim("time", 2), NcFixture.FDim("latitude", 1),
        NcFixture.FDim("longitude", 1)),
      vars = Seq(
        NcFixture.FVar("time", Seq(0),
          Seq(NcFixture.FAttr("units", 2, "hours since 1990-02-01 00:00:00")),
          4, Seq(0.0, 1.0)),
        NcFixture.FVar("latitude", Seq(1), Seq.empty, 5, Seq(50.25)),
        NcFixture.FVar("longitude", Seq(2), Seq.empty, 5, Seq(8.25)),
        NcFixture.FVar("t2m", Seq(0, 1, 2), Seq.empty, 6, Seq(271.0, 272.0))),
      numRecs = 0)
    java.nio.file.Files.write(dir.resolve("cdfmonth.nc"), cdfBytes)
    val df = Ingest.fromEra5NetCdfDir(spark, dir.toString, "TEST", 50.3, 8.3)
    val n = df.count()
    assert(n == 8, s"6 HDF5 rows + 2 CDF rows, got $n")
    // the CDF rows carry their own month
    val feb = df.filter(col("ts_utc") >= lit("1990-02-01").cast("timestamp")).count()
    assert(feb == 2)
  }

  test("unsupported structures are rejected with clear errors, not misread") {
    val bad = "not an hdf5 file".getBytes
    assert(!Hdf5.isHdf5(bad))
    intercept[IllegalArgumentException](Hdf5.parse(bad))
    // a truncated file with a valid signature dies loudly
    val good = era5File(chunked = false, shuffle = false, deflate = false)
    intercept[RuntimeException](Hdf5.parse(good.take(30)))
  }
}
