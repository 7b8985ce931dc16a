package graft.sources

/** One-shot generator for the COMMITTED NetCDF-4 fixture behind the
  * `pipe_era5_hdf5` driver row (src/main/resources/graft/era5_sb2.nc4):
  * superblock v2, 72 hourly steps × 3 lats × 4 lons, packed-short t2m
  * with scale 0.25 / offset 270.0, one fill hole at (t=5, lat=0, lon=2)
  * — the station cell — chunked (12,3,2) + shuffle + deflate. The
  * PipelineQueries entry documents the expected daily maxima this data
  * implies; re-run this main if the layout ever needs regenerating. */
object GenEra5Fixture {
  def main(args: Array[String]): Unit = {
    val out = new java.io.File("src/main/resources/graft/era5_sb2.nc4")
    out.getParentFile.mkdirs()
    java.nio.file.Files.write(out.toPath, bytes)
    println(s"wrote ${out} (${bytes.length} bytes)")
  }

  def bytes: Array[Byte] = {
    import H5Fixture.{FAttr, FDs}
    val lats = Array(50.0, 50.25, 50.5)
    val lons = Array(8.0, 8.25, 8.5, 8.75)
    val times = Array.tabulate(72)(_.toDouble) // hours since base
    // raw(t, la, lo) = (t+12) + 100·la + 10·lo; fill at (5, 0, 2).
    // Station (50.1, 8.58) → nearest cell (la=0, lo=2):
    //   K(t) = 270 + 0.25·(t+32) = 278 + 0.25·t, °C = 4.85 + 0.25·t
    //   daily max °C: Jan-1 t=23 → 10.6 | Jan-2 t=47 → 16.6
    //                 | Jan-3 t=71 → 22.6; Jan-1 has 23 valid hours.
    val packed = Array.tabulate(72 * 3 * 4) { i =>
      val t = i / 12; val la = (i / 4) % 3; val lo = i % 4
      if (t == 5 && la == 0 && lo == 2) -32767.0
      else (t + 12 + 100 * la + 10 * lo).toDouble
    }
    H5Fixture.build(Seq(
      FDs("latitude", Seq(3), 1, 4, lats),
      FDs("longitude", Seq(4), 1, 8, lons),
      FDs("time", Seq(72), 0, 4, times,
        attrs = Seq(FAttr("units", "hours since 2024-01-01 00:00:00"))),
      FDs("t2m", Seq(72, 3, 4), 0, 2, packed,
        attrs = Seq(
          FAttr("scale_factor", Array(0.25)),
          FAttr("add_offset", Array(270.0)),
          FAttr("_FillValue", Array(-32767.0))),
        chunkDims = Some(Seq(12, 3, 2)),
        shuffle = true, deflate = true)), sbVersion = 2)
  }
}
