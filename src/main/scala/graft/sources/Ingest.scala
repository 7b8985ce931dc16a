package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion decoders — SURVEY §2.1 S2–S5, §2.3 E3–E5, E10.
  *
  * Each parser is a pure DataFrame transform from the raw text schema to
  * canonical hourly_obs / daily_tmax_forecast — expression-only (no
  * UDFs), so Catalyst keeps column pruning + pushdown through the scan
  * and the whole decode stays in whole-stage codegen.
  *
  * Driver-side I/O (HTTP fetch + cache, S6) is intentionally out of the
  * engine: callers hand paths to `spark.read`.
  */
object Ingest {

  /** S2: NOAA ISD CSV — read only {DATE, TMP, LATITUDE, LONGITUDE}, all
    * as string (noaa_hourly.py:193-207), then decode.
    * TMP format "+0150,1" → value/10 °C; |raw| >= 9990 → null (E3,
    * noaa_hourly.py:135-163). */
  val isdSchema: StructType = StructType(Seq(
    StructField("DATE", StringType),
    StructField("TMP", StringType),
    StructField("LATITUDE", StringType),
    StructField("LONGITUDE", StringType)))

  def readIsdCsv(spark: SparkSession, path: String, stationId: String): DataFrame =
    decodeIsd(
      spark.read.schema(isdSchema).option("header", "true").csv(path),
      stationId)

  def decodeIsd(raw: DataFrame, stationId: String): DataFrame = {
    val tmpRaw = expr("try_cast(split(TMP, ',')[0] AS DOUBLE)")
    raw.select(
        expr("try_to_timestamp(DATE)").as("ts_utc"), // E5: null on parse failure (ANSI-safe)
        lit(stationId).as("station_id"),
        expr("try_cast(LATITUDE AS DOUBLE)").as("lat"), // E4: null-on-fail cast
        expr("try_cast(LONGITUDE AS DOUBLE)").as("lon"),
        when(abs(tmpRaw) >= 9990d, lit(null).cast(DoubleType))
          .otherwise(tmpRaw / 10.0).as("temp_c"),
        lit("isd").as("source"),
        lit(0L).as("qc_flags"))
      .filter(col("ts_utc").isNotNull) // drop unparseable timestamps (P6)
  }

  /** S3: GHCNh pipe-delimited — headers lowercased/trimmed; datetime and
    * temperature columns discovered from candidate lists driver-side
    * (noaa_hourly.py:235-307). Sentinel -9999/empty → null (E3 variant). */
  val ghcnhDatetimeCandidates: Seq[String] = Seq("datetime", "date_time", "date", "obs_time")
  val ghcnhTempCandidates: Seq[String] = Seq("temperature", "temp", "tmp", "air_temperature")

  def readGhcnhPsv(spark: SparkSession, path: String, stationId: String): DataFrame = {
    val raw = spark.read.option("sep", "|").option("header", "true").csv(path)
    decodeGhcnh(raw, stationId)
  }

  def decodeGhcnh(raw0: DataFrame, stationId: String): DataFrame = {
    // header normalization: trim + lowercase (driver-side rename, E17)
    val raw = raw0.toDF(raw0.columns.map(_.trim.toLowerCase).toIndexedSeq: _*)
    val dtCol = ghcnhDatetimeCandidates.find(raw.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        s"no datetime column among ${ghcnhDatetimeCandidates.mkString(",")} in ${raw.columns.mkString(",")}"))
    val tCol = ghcnhTempCandidates.find(raw.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        s"no temperature column among ${ghcnhTempCandidates.mkString(",")} in ${raw.columns.mkString(",")}"))
    val tempRaw = trim(col(tCol))
    val parsed = when(tempRaw === "" || tempRaw === "-9999", lit(null).cast(DoubleType))
      .otherwise(expr(s"try_cast(trim($tCol) AS DOUBLE)"))
    raw.select(
        expr(s"try_to_timestamp(`$dtCol`)").as("ts_utc"),
        lit(stationId).as("station_id"),
        (if (raw.columns.contains("latitude")) expr("try_cast(latitude AS DOUBLE)") else lit(null).cast(DoubleType)).as("lat"),
        (if (raw.columns.contains("longitude")) expr("try_cast(longitude AS DOUBLE)") else lit(null).cast(DoubleType)).as("lon"),
        parsed.as("temp_c"),
        lit("ghcnh").as("source"),
        lit(0L).as("qc_flags"))
      .filter(col("ts_utc").isNotNull)
  }

  /** S4: Open-Meteo JSON — zip daily.time[] × daily.temperature_2m_max[]
    * into forecast rows, skipping null temps
    * (openmeteo_daily_forecast.py:124-189); E10 lead-hours. */
  def decodeOpenMeteo(
      response: DataFrame, // schema: daily struct{time: array<string>, temperature_2m_max: array<double>}
      stationId: String, lat: Double, lon: Double,
      issueTimeUtc: java.sql.Timestamp, stationTz: String,
      model: String = "openmeteo"): DataFrame = {
    response
      .select(explode(arrays_zip(
        col("daily.time").as("time"),
        col("daily.temperature_2m_max").as("tmax"))).as("z"))
      .select(
        to_date(col("z.time")).as("target_date_local"),
        col("z.tmax").cast(DoubleType).as("tmax_pred_c"))
      .filter(col("tmax_pred_c").isNotNull)
      .select(
        lit(stationId).as("station_id"),
        lit(lat).as("lat"), lit(lon).as("lon"),
        lit(issueTimeUtc).as("issue_time_utc"),
        col("target_date_local"),
        col("tmax_pred_c"),
        round(col("tmax_pred_c") * 9.0 / 5.0 + 32.0, 1).as("tmax_pred_f"),
        // E10: floor((local-midnight-in-UTC − issue)/3600), clamped ≥ 0
        greatest(lit(0L), floor(
          (unix_timestamp(to_utc_timestamp(col("target_date_local").cast(TimestampType), stationTz))
            - unix_timestamp(lit(issueTimeUtc))) / 3600.0).cast(LongType)).cast(IntegerType)
          .as("lead_hours"),
        lit(model).as("model"),
        lit("openmeteo").as("source"),
        lit(issueTimeUtc).as("ingested_at_utc"))
  }

  /** S5: ERA5 NetCDF grid extract. No Spark NetCDF source offline — the
    * driver-side extractor selects the nearest grid cell and yields
    * (ts, kelvin) rows; this transform finishes the job (E2: K→°C).
    * The extraction callback is injectable (stubbed in tests, real
    * xarray/netCDF4 equivalent in production). */
  def fromEra5Rows(
      spark: SparkSession,
      rows: Seq[(java.sql.Timestamp, Double)], // (ts_utc, t2m kelvin)
      stationId: String, lat: Double, lon: Double): DataFrame = {
    import spark.implicits._
    rows.toDF("ts_utc", "t2m_k")
      .select(
        col("ts_utc"),
        lit(stationId).as("station_id"),
        lit(lat).as("lat"), lit(lon).as("lon"),
        (col("t2m_k") - 273.15).as("temp_c"), // E2
        lit("era5").as("source"),
        lit(0L).as("qc_flags"))
  }

  /** S5 (real parse): ERA5 grid extract from NetCDF classic bytes —
    * the pure-JVM [[NetCdf3]] reader plus the reference's exact
    * nearest-cell semantics (fetch/era5_hourly.py:309-347
    * `_parse_with_netcdf4`): argmin |coord − station| per axis (first
    * index on ties, like np.argmin), CF time decode from the `units`
    * attribute, packed-short unpacking via scale/offset, fill → NaN,
    * then the shared K→°C transform. Dim order of the temperature
    * variable is honored via stride arithmetic (ERA5 ships
    * (time, latitude, longitude) but nothing here assumes it).
    * NetCDF-4/HDF5 files are rejected with a clear error — classic
    * CDF-1/CDF-2 only (the documented boundary). */
  def fromEra5NetCdf(
      spark: SparkSession,
      bytes: Array[Byte],
      stationId: String, lat: Double, lon: Double): DataFrame =
    fromEra5Rows(spark, era5CellSeries(bytes, lat, lon), stationId, lat, lon)

  /** The pure per-file kernel behind [[fromEra5NetCdf]] /
    * [[fromEra5NetCdfDir]]: (ts, kelvin) for the nearest grid cell.
    * Driver- or executor-side; no Spark dependency. Dispatches on the
    * container magic: classic CDF-1/2 → [[NetCdf3]]; NetCDF-4 (HDF5,
    * what real ERA5 downloads ship today) → [[Hdf5]]. */
  private[sources] def era5CellSeries(
      bytes: Array[Byte], lat: Double, lon: Double): Seq[(java.sql.Timestamp, Double)] =
    if (Hdf5.isHdf5(bytes)) era5CellSeriesHdf5(bytes, lat, lon)
    else era5CellSeriesCdf(bytes, lat, lon)

  /** HDF5-backed variant of the cell-series kernel: same CF semantics
    * (nearest cell by |coord − station|, `units`-driven time decode,
    * `scale_factor`/`add_offset` unpack, fill → NaN → row dropped for
    * time / kept as NaN temp). Axes of the grid variable resolve by
    * COORDINATE LENGTH (the time axis is the one whose extent equals
    * |time|, etc.) rather than netCDF-4's DIMENSION_LIST attribute —
    * that attribute is a variable-length-reference type outside the
    * [[Hdf5]] subset; length matching resolves every regular lat×lon
    * grid, ties broken by CF's (time, lat, lon) write order, and any
    * extra axis (e.g. ERA5T's `expver`) pins at index 0. */
  private[sources] def era5CellSeriesHdf5(
      bytes: Array[Byte], lat: Double, lon: Double): Seq[(java.sql.Timestamp, Double)] = {
    val f = Hdf5.parse(bytes)
    val latVar = f.variable("latitude", "lat")
    val lonVar = f.variable("longitude", "lon")
    val timeVar = f.variable("time", "valid_time")
    val tempVar = f.variable("t2m", "2m_temperature")
    def unpack(v: Hdf5.H5Var): Double => Double = {
      def numAttr(names: String*): Option[Double] =
        names.flatMap(v.attrs.get).collectFirst { case a: Array[Double] if a.nonEmpty => a(0) }
      val fill = numAttr("_FillValue", "missing_value")
      val scale = numAttr("scale_factor").getOrElse(1.0)
      val offset = numAttr("add_offset").getOrElse(0.0)
      x => if (fill.exists(_ == x)) Double.NaN else x * scale + offset
    }
    def readCoord(v: Hdf5.H5Var): Array[Double] = {
      val u = unpack(v)
      new Hdf5.VarReader(f, v).readAll().map(u)
    }
    val lats = readCoord(latVar)
    val lons = readCoord(lonVar)
    val timeRaw = readCoord(timeVar)
    def nearest(arr: Array[Double], x: Double): Int =
      arr.zipWithIndex.minBy { case (v, _) => math.abs(v - x) }._2
    val latIdx = nearest(lats, lat)
    val lonIdx = nearest(lons, lon)
    val units = timeVar.attrs.get("units") match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException(
        s"time variable ${timeVar.name} has no units attribute")
    }
    val micros = NetCdf3.decodeTime(units, timeRaw)
    // axis resolution by coordinate length, claimed in CF write order
    val shape = tempVar.shape
    val taken = scala.collection.mutable.Set[Int]()
    def claim(n: Long, what: String): Int = {
      val ax = shape.indices.find(i => !taken(i) && shape(i) == n).getOrElse(
        throw new IllegalArgumentException(
          s"no axis of ${tempVar.name} (shape ${shape.mkString("x")}) has extent $n for $what"))
      taken += ax
      ax
    }
    val tAxis = claim(timeRaw.length.toLong, "time")
    val latAxis = claim(lats.length.toLong, "latitude")
    val lonAxis = claim(lons.length.toLong, "longitude")
    val rdr = new Hdf5.VarReader(f, tempVar)
    val up = unpack(tempVar)
    val idx = Array.fill(shape.length)(0L) // extra axes (expver) stay at 0
    idx(latAxis) = latIdx.toLong
    idx(lonAxis) = lonIdx.toLong
    micros.indices
      .filterNot(t => timeRaw(t).isNaN)
      .map { t =>
        idx(tAxis) = t.toLong
        val ts = new java.sql.Timestamp(Math.floorDiv(micros(t), 1000L))
        (ts, up(rdr.elementAt(idx.toSeq)))
      }
  }

  private[sources] def era5CellSeriesCdf(
      bytes: Array[Byte], lat: Double, lon: Double): Seq[(java.sql.Timestamp, Double)] = {
    val f = NetCdf3.parse(bytes)
    val latVar = f.variable("latitude", "lat")
    val lonVar = f.variable("longitude", "lon")
    val timeVar = f.variable("time", "valid_time")
    val tempVar = f.variable("t2m", "2m_temperature")
    val lats = NetCdf3.readVar(f, latVar.name)._2
    val lons = NetCdf3.readVar(f, lonVar.name)._2
    def nearest(arr: Array[Double], x: Double): Int =
      arr.zipWithIndex.minBy { case (v, _) => math.abs(v - x) }._2
    val latIdx = nearest(lats, lat)
    val lonIdx = nearest(lons, lon)
    val units = timeVar.attrs.get("units") match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException(
        s"time variable ${timeVar.name} has no units attribute")
    }
    val timeRaw = NetCdf3.readVar(f, timeVar.name)._2
    val micros = NetCdf3.decodeTime(units, timeRaw)
    val latDim = latVar.dimIds.headOption.getOrElse(-1)
    val lonDim = lonVar.dimIds.headOption.getOrElse(-1)
    val timeDim = timeVar.dimIds.headOption.getOrElse(-1)
    // point reads along the time axis — the full grid is never
    // materialized (0.25° global ERA5 would be GBs as doubles)
    val temps = NetCdf3.readCellSeries(f, tempVar.name, timeDim,
      Map(latDim -> latIdx, lonDim -> lonIdx))
    val rows = micros.indices
      // a fill-masked time coordinate has no timestamp: drop the row
      // rather than aliasing it onto the units base epoch
      .filterNot(t => timeRaw(t).isNaN)
      .map { t =>
        val ts = new java.sql.Timestamp(Math.floorDiv(micros(t), 1000L))
        (ts, temps(t))
      }
    rows
  }

  /** Distributed ERA5 ingest: every `.nc` file under `dir` is parsed ON
    * AN EXECUTOR (binaryFile source → per-file [[era5CellSeries]]), so a
    * decade of monthly grids fans out across the cluster instead of
    * serializing through the driver — the 100 TB shape for an archive
    * of NetCDF files. Per-file parse state is O(one cell series), never
    * the grid; task memory is bounded by the largest single file's
    * BYTES (binaryFile materializes each file's content), so shard huge
    * archives into per-month files as ERA5 distribution already does. */
  def fromEra5NetCdfDir(
      spark: SparkSession,
      dir: String,
      stationId: String, lat: Double, lon: Double): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.nc")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes => era5CellSeries(bytes, lat, lon)))
      .toDF("ts_utc", "t2m_k")
    rows.select(
      col("ts_utc"),
      lit(stationId).as("station_id"),
      lit(lat).as("lat"), lit(lon).as("lon"),
      (col("t2m_k") - 273.15).as("temp_c"), // E2
      lit("era5").as("source"),
      lit(0L).as("qc_flags"))
  }

  /** S7: hybrid source routing — pick per-year source by cutoff date and
    * union the per-source frames (noaa_hourly.py:369-385; ISD before the
    * cutoff, GHCNh after). Pure path/branch logic + unionByName. */
  def routeByCutoff(
      before: DataFrame, after: DataFrame,
      tsCol: String, cutoff: java.sql.Timestamp): DataFrame = {
    before.filter(col(tsCol) < lit(cutoff))
      .unionByName(after.filter(col(tsCol) >= lit(cutoff)))
  }
}
