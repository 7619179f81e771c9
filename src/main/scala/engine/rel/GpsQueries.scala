package engine.rel

import org.apache.spark.sql.functions._
import engine.Core.{t, r4}
import engine.Q
import gps.parse.{NmeaFunctions, NmeaSynth}
import gps.assemble.FixAssembly

/** The GPS/NMEA operator surface — the reference's actual domain
  * (class.nmea.parser.php), driven end-to-end over NMEA text synthesized
  * deterministically from `events` (NmeaSynth), so even the full
  * parse→assemble pipeline is hash-checkable: the DuckDB oracle replicates
  * the encode∘decode arithmetic directly over `events` without any string
  * processing.
  */
object GpsQueries {

  /** B2: raw text-line scan — ParseLine's ingest surface (:103). Counts and
    * sizes per sentence family after checksum validation. */
  private val scanTextLines = Q(
    (s, d) => {
      val lines = NmeaSynth.readLog(s, d)
      lines
        .filter(NmeaFunctions.checksumValid(col("line")))
        .withColumn("stype", NmeaFunctions.sentenceType(col("line")))
        .groupBy(col("stype"))
        .agg(count(lit(1)).as("n_lines"))
        .orderBy("stype")
    },
    Some("""SELECT stype, n AS n_lines FROM (
        SELECT 'GPGGA' AS stype, count(*) AS n FROM events
        UNION ALL SELECT 'GPGSA', count(*) FROM events
        UNION ALL SELECT 'GPGSV', 2 * count(*) FROM events
        UNION ALL SELECT 'GPRMC', count(*) FROM events
        UNION ALL SELECT 'GPVTG', count(*) FROM events)
      ORDER BY stype"""))

  /** B42 batch-equivalent + flagship: the full NMEA fix pipeline —
    * synthesize sentences from events, parse (checksum-gated), assemble
    * fixes (carry-forward + last-writer-wins merge), apply GoodEnough and
    * the reference's *intended* quality filter (:13,:40-77), summarize
    * trips per device-hour. The oracle reproduces every decode∘encode
    * rounding step in pure arithmetic over events.
    *
    * ORACLE DATA ASSUMPTION: the oracle groups by
    * (user_id, date_trunc('second', ts)) *globally*, while the engine
    * segments fixes by runs of the carried HHmmss in line_no order. The
    * two agree because in the synthesized log a device's events are
    * emitted in event_id order with monotonically non-decreasing ts, so
    * same-truncated-second events are always ADJACENT (one run = one
    * second), and the testdata spans < 24h per device (no two runs N days
    * apart share an HHmmss key). Both properties hold for every
    * /root/testdata sf; data violating them would need an island-based
    * (lag/cumsum over event_id) oracle instead. When k events share a
    * second, their k GSV pairs all merge into that second's fix, so
    * n_sats_seen counts 8 per EVENT (sum of per-second event counts),
    * not 8 per fix — at sf0.1 one device-hour has such a collision. */
  private val nmeaFixPipeline = Q(
    (s, d) => {
      val fixes = FixAssembly.pipeline(NmeaSynth.readLog(s, d))
      FixAssembly.qualityFilter(fixes, minSats = 5, maxHdop = 8.0)
        .groupBy(col("device"),
          date_format(date_trunc("hour", col("fix_time")), "yyyy-MM-dd HH:00")
            .as("hour"))
        .agg(
          count(lit(1)).as("n_fixes"),
          round(avg(col("lat")), 6).as("avg_lat"),
          round(avg(col("lon")), 6).as("avg_lon"),
          r4(max(col("speed_knots"))).as("max_knots"),
          r4(avg(col("hdop"))).as("avg_hdop"),
          sum(size(col("sats_in_view"))).as("n_sats_seen"))
        .orderBy("device", "hour")
    },
    Some("""WITH f AS (
        SELECT user_id, date_trunc('second', ts) AS sec,
               arg_max(value, event_id) AS value,
               count(*) AS n_ev
        FROM events GROUP BY 1, 2
      ), g AS (
        SELECT user_id, sec, value, n_ev,
          fmod(value, 90.0) - 45.0 AS lat0,
          fmod(value * 7.0, 180.0) - 90.0 AS lon0,
          fmod(value, 60.0) AS knots0,
          fmod(value, 10.0) AS hdop,
          user_id % 8 + 4 AS numsat
        FROM f
      ), p AS (
        SELECT user_id, sec, hdop, numsat, n_ev, round(knots0, 2) AS knots,
          (CASE WHEN lat0 < 0 THEN -1 ELSE 1 END) *
            round(floor(abs(lat0))
              + round((abs(lat0) - floor(abs(lat0))) * 60.0, 4) / 60.0, 6) AS lat,
          (CASE WHEN lon0 < 0 THEN -1 ELSE 1 END) *
            round(floor(abs(lon0))
              + round((abs(lon0) - floor(abs(lon0))) * 60.0, 4) / 60.0, 6) AS lon
        FROM g
      )
      SELECT CAST(user_id AS VARCHAR) AS device,
        strftime(date_trunc('hour', sec), '%Y-%m-%d %H:00') AS hour,
        count(*) AS n_fixes,
        round(avg(lat), 6) AS avg_lat,
        round(avg(lon), 6) AS avg_lon,
        round(max(knots), 4) AS max_knots,
        round(avg(hdop), 4) AS avg_hdop,
        CAST(8 * sum(n_ev) AS BIGINT) AS n_sats_seen
      FROM p
      WHERE hdop <= 8.0 AND numsat >= 5
      GROUP BY 1, 2
      ORDER BY device, hour"""))

  /** B44: scalar UDF surface — nmea_checksum as BOTH a registered Scala UDF
    * and the codegen-friendly column fold; the query proves they agree.
    * Applied to part names (strings DuckDB also has, so the XOR fold is
    * oracle-checkable via list_reduce). */
  private val udfScalar = Q(
    (s, d) => {
      val xorUdf = udf((p: String) =>
        if (p == null) null.asInstanceOf[Integer]
        else Integer.valueOf(p.getBytes("UTF-8").foldLeft(0)((a, b) => a ^ b)))
      s.udf.register("nmea_checksum_udf", xorUdf)
      t(s, d, "part").select(
        col("p_partkey"),
        xorUdf(col("p_name")).as("ck_udf"),
        NmeaFunctions.checksum(col("p_name")).as("ck_expr"))
        .withColumn("agree", col("ck_udf") === col("ck_expr"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
        list_reduce(list_transform(range(1, length(p_name) + 1),
          i -> ord(p_name[i])), (a, b) -> xor(a, b)) AS ck_udf,
        list_reduce(list_transform(range(1, length(p_name) + 1),
          i -> ord(p_name[i])), (a, b) -> xor(a, b)) AS ck_expr,
        true AS agree
      FROM part ORDER BY p_partkey"""))

  /** B46: table-function / generator surface — the GSV satellite fan-out
    * (:246-258: 4 sats per sentence; the reference keeps 1). One NMEA line
    * → N satellite rows via explode; oracle rebuilds the same satellite
    * table arithmetically. */
  private val udtfGenerator = Q(
    (s, d) => {
      val lines = NmeaSynth.readLog(s, d)
      val parsed = NmeaFunctions.parseSentences(lines)
        .filter(col("stype") === "GPGSV")
      parsed
        // explode_outer, NOT explode: InferFiltersFromGenerate turns inner
        // explode into a pushed-down `size(col) > 0` filter whose condition
        // re-inlines the entire synth+parse tree (~16 interpreted
        // re-evaluations of split per row — 27 s of the bench); the outer
        // variant skips the rule, and GSV sentences always carry 4 sats
        .select(col("device"), explode_outer(col("sats_in_view")).as("sat"))
        .filter(col("sat").isNotNull)
        .select(col("device"), col("sat.prn"), col("sat.elev"),
          col("sat.azimuth"), col("sat.snr"))
        .groupBy(col("prn"))
        .agg(count(lit(1)).as("n_obs"),
          r4(avg(col("snr"))).as("avg_snr"),
          min(col("elev")).as("min_elev"),
          max(col("azimuth")).as("max_az"))
        .orderBy("prn")
    },
    Some("""WITH sat AS (
        SELECT CAST((user_id + i) % 32 + 1 AS INT) AS prn,
          CAST((user_id * 3 + i * 11) % 90 AS INT) AS elev,
          CAST((user_id * 17 + i * 45) % 360 AS INT) AS azimuth,
          CAST((user_id + i * 7) % 50 + 10 AS INT) AS snr
        FROM events CROSS JOIN (SELECT unnest(range(8)) AS i))
      SELECT prn, count(*) AS n_obs, round(avg(snr), 4) AS avg_snr,
        min(elev) AS min_elev, max(azimuth) AS max_az
      FROM sat GROUP BY prn ORDER BY prn"""))

  val queries: Map[String, Q] = Map(
    "scan_text_lines" -> scanTextLines,
    "nmea_fix_pipeline" -> nmeaFixPipeline,
    "udf_scalar" -> udfScalar,
    "udtf_generator" -> udtfGenerator)
}
