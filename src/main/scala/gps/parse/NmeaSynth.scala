package gps.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic NMEA sentence synthesis from the driver's `events` table —
  * the ingest surface for the fix pipeline (the caller loop feeding
  * ParseLine, class.nmea.parser.php:103). Each event becomes one GPS
  * "second" for its device (user_id): GGA + GSA + GSV×2 + RMC + VTG, in
  * reference arrival order, with valid checksums appended.
  *
  * The encoding is chosen so decode∘encode is exactly replicable in ANSI
  * SQL (2-decimal quantities; minute strings at 4 dp whose inputs carry ≤2
  * decimals — no rounding ever lands on a half boundary), which lets the
  * full synth→parse→assemble pipeline be hash-checked against DuckDB.
  */
object NmeaSynth {

  /** Materialize the synthesized NMEA log for a scale-factor dir ONCE as
    * device-tagged text lines (`device|line_no|$GPGGA,...`), then serve
    * every consumer from a real `spark.read.text` scan. Without this,
    * each query's pushed-down filters re-inline the whole synth
    * expression tree (Catalyst substitutes projected columns into pushed
    * predicates), re-evaluating checksums and string builds many times
    * per row; a text source also IS the surface being modeled — the
    * reference parses a GPS text log, not an in-plan generator
    * (class.nmea.parser.php:103). Deterministic content ⇒ the cache is
    * safe across sessions; `_SUCCESS` is the completion marker. */
  def logDir(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    // v-suffix = synth format version: bump it whenever fromEvents'
    // encoding changes, or stale caches would feed the correctness gate.
    // publishOnce = temp dir + atomic rename, so concurrent JVMs can't
    // race a half-written cache into the correctness gate.
    val out = s"${engine.Core.scratchRoot}/graft_nmea_log_v1_${
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    engine.Core.publishOnce(out) { tmp =>
      fromEvents(engine.Core.t(spark, sfDir, "events"))
        .select(concat_ws("|",
          col("device"), col("line_no"), col("line")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
  }

  /** The cached log as (device, line_no, line) — NMEA payloads never
    * contain '|', so the tag split is two cheap substring_index calls. */
  def readLog(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    spark.read.text(logDir(spark, sfDir))
      .select(
        substring_index(col("value"), "|", 1).as("device"),
        substring_index(substring_index(col("value"), "|", 2), "|", -1)
          .cast("long").as("line_no"),
        substring_index(col("value"), "|", -1).as("line"))
  }

  /** lat in [-45,45): derived from `value` (which carries 2 decimals). */
  def latOf(value: Column): Column = value % 90.0 - lit(45.0)
  /** lon in [-90,90). */
  def lonOf(value: Column): Column = (value * 7.0) % 180.0 - lit(90.0)
  /** ground speed in knots, 2 decimals preserved. */
  def knotsOf(value: Column): Column = value % 60.0
  /** hdop in [0,10), 2 decimals preserved. */
  def hdopOf(value: Column): Column = value % 10.0
  /** satellites used: 4..11. */
  def numsatOf(userId: Column): Column = (userId % 8 + 4).cast("int")

  /** ddmm.mmmm coordinate encoding (inverse of degree2decimal :339-351). */
  private def encCoord(dec: Column, degWidth: Int): Column = {
    val a = abs(dec)
    val dd = floor(a)
    val mm = (a - dd) * 60.0
    concat(
      lpad(dd.cast("int").cast("string"), degWidth, "0"),
      lpad(format_number(mm, 4), 7, "0"))
  }

  private def hemiLat(dec: Column): Column = when(dec < 0, "S").otherwise("N")
  private def hemiLon(dec: Column): Column = when(dec < 0, "W").otherwise("E")

  /** Append `*HH` checksum to a payload (without leading '$'). */
  def withChecksum(payloadCol: Column): Column =
    concat(lit("$"), payloadCol, lit("*"),
      lpad(hex(NmeaFunctions.checksum(payloadCol)), 2, "0"))

  /** events → (device, line_no, line). One shuffle-free projection +
    * posexplode; scales linearly with input. */
  def fromEvents(events: DataFrame): DataFrame = {
    val lat = latOf(col("value"))
    val lon = lonOf(col("value"))
    val knots = knotsOf(col("value"))
    val kph = knots * 1.852
    val hdop = hdopOf(col("value"))
    val numsat = numsatOf(col("user_id"))
    val utc = date_format(col("ts"), "HHmmss")
    val dt = date_format(col("ts"), "ddMMyy")
    val f2 = (c: Column) => format_number(c, 2) // %.2f, no grouping sep needed (<1000)

    val gga = concat_ws(",", lit("GPGGA"), utc,
      encCoord(lat, 2), hemiLat(lat), encCoord(lon, 3), hemiLon(lon),
      lit("1"), lpad(numsat.cast("string"), 2, "0"), f2(hdop),
      f2(lit(545.4)), lit("M"), f2(lit(46.9)), lit("M"), lit(""), lit(""))
    val gsaSats = concat_ws(",",
      (0 until 5).map(i => lpad(((col("user_id") + i) % 32 + 1).cast("int")
        .cast("string"), 2, "0")): _*)
    val gsa = concat_ws(",", lit("GPGSA"), lit("A"), lit("3"),
      gsaSats, lit(",,,,,,"), // 5 used + 7 empty PRN slots
      f2(lit(2.5)), f2(hdop), f2(lit(2.1)))
    def gsvSat(i: Int): Column = concat_ws(",",
      lpad(((col("user_id") + i) % 32 + 1).cast("int").cast("string"), 2, "0"),
      ((col("user_id") * 3 + i * 11) % 90).cast("int").cast("string"),
      ((col("user_id") * 17 + i * 45) % 360).cast("int").cast("string"),
      ((col("user_id") + i * 7) % 50 + 10).cast("int").cast("string"))
    val gsv1 = concat_ws(",", lit("GPGSV"), lit("2"), lit("1"), lit("08"),
      gsvSat(0), gsvSat(1), gsvSat(2), gsvSat(3))
    val gsv2 = concat_ws(",", lit("GPGSV"), lit("2"), lit("2"), lit("08"),
      gsvSat(4), gsvSat(5), gsvSat(6), gsvSat(7))
    val rmc = concat_ws(",", lit("GPRMC"), utc, lit("A"),
      encCoord(lat, 2), hemiLat(lat), encCoord(lon, 3), hemiLon(lon),
      f2(knots), f2(lit(84.4)), dt, f2(lit(3.1)), lit("W"))
    val vtg = concat_ws(",", lit("GPVTG"), f2(lit(54.7)), lit("T"),
      f2(lit(34.4)), lit("M"), f2(knots), lit("N"), f2(kph), lit("K"))

    events
      .select(col("event_id"), col("user_id").cast("string").as("device"),
        posexplode(array(gga, gsa, gsv1, gsv2, rmc, vtg))
          .as(Seq("pos", "payload")))
      .select(col("device"),
        (col("event_id") * 10 + col("pos")).as("line_no"),
        withChecksum(col("payload")).as("line"))
  }
}
