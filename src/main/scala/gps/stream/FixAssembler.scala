package gps.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import gps.model.SatView

/** One parsed NMEA sentence — the typed row produced by
  * NmeaFunctions.parseSentences (column order irrelevant; names bind). */
case class ParsedSentence(
    device: String,
    line_no: Long,
    stype: String,
    utc: Option[String],
    date: Option[String],
    lat: Option[Double],
    lon: Option[Double],
    ns: Option[String],
    ew: Option[String],
    quality: Option[Int],
    numsat: Option[Int],
    hdop: Option[Double],
    vdop: Option[Double],
    pdop: Option[Double],
    alt: Option[Double],
    geoidal: Option[Double],
    dgps_age: Option[Double],
    dgps_station: Option[String],
    status: Option[String],
    select_mode: Option[String],
    fix_mode: Option[Int],
    sats: Option[Seq[Int]],
    gsv_messages: Option[Int],
    gsv_msgnum: Option[Int],
    satview: Option[Int],
    sats_in_view: Option[Seq[SatView]],
    speed_knots: Option[Double],
    speed_kmph: Option[Double],
    track_deg: Option[Double],
    track_mag_deg: Option[Double],
    magvar: Option[Double],
    magvar_ew: Option[String],
    fix_time: Option[java.sql.Timestamp])

/** An emitted (closed) GPS fix. */
case class StreamFix(
    device: String,
    utc: String,
    date: Option[String],
    fix_time: Option[java.sql.Timestamp],
    lat: Option[Double],
    lon: Option[Double],
    quality: Option[Int],
    numsat: Option[Int],
    hdop: Option[Double],
    vdop: Option[Double],
    alt: Option[Double],
    speed_knots: Option[Double],
    speed_kmph: Option[Double],
    track_deg: Option[Double],
    n_sats_view: Int,
    complete: Boolean,
    types_seen: String)

/** Per-device stream state: the fix currently being assembled — exactly the
  * reference's `$CurrentUTC` cursor + `$Nmea[$CurrentUTC]` open row
  * (class.nmea.parser.php:22,25), except bounded: closed fixes are emitted
  * downstream instead of accumulating forever (the reference never evicts —
  * SURVEY.md §4.2). `types` is the sentence-type flag set of the open fix
  * (:173 etc.), mirroring the batch assembly's `types_seen`. */
case class FixBuffer(current: Option[ParsedSentence], maxLineNo: Long,
    types: Seq[String])

/** Streaming GPS-fix assembly — the flagship stateful operator (SURVEY.md
  * B42). `flatMapGroupsWithState` keyed by device; sentences are folded in
  * arrival (`line_no`) order; a timestamped sentence whose utc differs from
  * the open fix closes it (emit), mirroring ParseLine's behavior one-to-one
  * while scaling across devices/executors.
  */
object FixAssembler {

  /** GoodEnough (:126-129). */
  private def goodEnough(p: ParsedSentence): Boolean =
    p.date.isDefined && p.utc.isDefined && p.lat.isDefined && p.lon.isDefined

  /** Mutable working copy of the open fix for one trigger's fold — the
    * last-writer-wins field merge of `$Nmea[$CurrentUTC][field] = value`
    * (class.nmea.parser.php:173-187 etc.). An earlier immutable
    * formulation allocated a fresh 33-field ParsedSentence (plus a
    * FixBuffer and a types copy) per SENTENCE — ~600k short-lived objects
    * per bench run, whose GC pressure was the main run-to-run variance of
    * the flagship under a loaded heap. Folding into vars allocates only
    * per fix OPEN/CLOSE (~6x less): last writer wins, GSV satellite lists
    * accumulate, `utc` pinned at open. `types` prepends (order-free:
    * types_seen is distinct+sorted at emit). */
  private final class OpenFix(p: ParsedSentence, var types: List[String]) {
    val utc = p.utc // fix key — constant within the open fix
    var line_no = p.line_no; var stype = p.stype
    var date = p.date; var lat = p.lat; var lon = p.lon
    var ns = p.ns; var ew = p.ew; var quality = p.quality
    var numsat = p.numsat; var hdop = p.hdop; var vdop = p.vdop
    var pdop = p.pdop; var alt = p.alt; var geoidal = p.geoidal
    var dgps_age = p.dgps_age; var dgps_station = p.dgps_station
    var status = p.status; var select_mode = p.select_mode
    var fix_mode = p.fix_mode; var sats = p.sats
    var gsv_messages = p.gsv_messages; var gsv_msgnum = p.gsv_msgnum
    var satview = p.satview; var sats_in_view = p.sats_in_view
    var speed_knots = p.speed_knots; var speed_kmph = p.speed_kmph
    var track_deg = p.track_deg; var track_mag_deg = p.track_mag_deg
    var magvar = p.magvar; var magvar_ew = p.magvar_ew
    var fix_time = p.fix_time

    def add(s: ParsedSentence): Unit = {
      line_no = s.line_no; stype = s.stype
      if (s.date.isDefined) date = s.date
      if (s.lat.isDefined) lat = s.lat
      if (s.lon.isDefined) lon = s.lon
      if (s.ns.isDefined) ns = s.ns
      if (s.ew.isDefined) ew = s.ew
      if (s.quality.isDefined) quality = s.quality
      if (s.numsat.isDefined) numsat = s.numsat
      if (s.hdop.isDefined) hdop = s.hdop
      if (s.vdop.isDefined) vdop = s.vdop
      if (s.pdop.isDefined) pdop = s.pdop
      if (s.alt.isDefined) alt = s.alt
      if (s.geoidal.isDefined) geoidal = s.geoidal
      if (s.dgps_age.isDefined) dgps_age = s.dgps_age
      if (s.dgps_station.isDefined) dgps_station = s.dgps_station
      if (s.status.isDefined) status = s.status
      if (s.select_mode.isDefined) select_mode = s.select_mode
      if (s.fix_mode.isDefined) fix_mode = s.fix_mode
      if (s.sats.isDefined) sats = s.sats
      if (s.gsv_messages.isDefined) gsv_messages = s.gsv_messages
      if (s.gsv_msgnum.isDefined) gsv_msgnum = s.gsv_msgnum
      if (s.satview.isDefined) satview = s.satview
      // GSV groups accumulate (:261 intended semantics), others overwrite
      sats_in_view = (sats_in_view, s.sats_in_view) match {
        case (Some(a), Some(c)) => Some(a ++ c)
        case (a, c) => c.orElse(a)
      }
      if (s.speed_knots.isDefined) speed_knots = s.speed_knots
      if (s.speed_kmph.isDefined) speed_kmph = s.speed_kmph
      if (s.track_deg.isDefined) track_deg = s.track_deg
      if (s.track_mag_deg.isDefined) track_mag_deg = s.track_mag_deg
      if (s.magvar.isDefined) magvar = s.magvar
      if (s.magvar_ew.isDefined) magvar_ew = s.magvar_ew
      if (s.fix_time.isDefined) fix_time = s.fix_time
      types ::= s.stype
    }

    def toSentence(device: String): ParsedSentence = ParsedSentence(
      device = device, line_no = line_no, stype = stype, utc = utc,
      date = date, lat = lat, lon = lon, ns = ns, ew = ew,
      quality = quality, numsat = numsat, hdop = hdop, vdop = vdop,
      pdop = pdop, alt = alt, geoidal = geoidal, dgps_age = dgps_age,
      dgps_station = dgps_station, status = status,
      select_mode = select_mode, fix_mode = fix_mode, sats = sats,
      gsv_messages = gsv_messages, gsv_msgnum = gsv_msgnum,
      satview = satview, sats_in_view = sats_in_view,
      speed_knots = speed_knots, speed_kmph = speed_kmph,
      track_deg = track_deg, track_mag_deg = track_mag_deg,
      magvar = magvar, magvar_ew = magvar_ew, fix_time = fix_time)
  }

  private[stream] def toFix(p: ParsedSentence, types: Seq[String]): StreamFix =
    StreamFix(
      device = p.device, utc = p.utc.getOrElse(""), date = p.date,
      fix_time = p.fix_time, lat = p.lat, lon = p.lon, quality = p.quality,
      numsat = p.numsat, hdop = p.hdop, vdop = p.vdop, alt = p.alt,
      speed_knots = p.speed_knots, speed_kmph = p.speed_kmph,
      track_deg = p.track_deg,
      n_sats_view = p.sats_in_view.map(_.size).getOrElse(0),
      complete = goodEnough(p),
      // sorted distinct flag set — same encoding as the batch assembly's
      // array_join(array_sort(collect_set(stype)), ",")
      types_seen = types.distinct.sorted.mkString(","))

  /** Watermark delay AND per-fix eviction cushion. A fix whose device has
    * been silent for this long past the fix's own event time is closed and
    * emitted by timeout; rows disordered by less than this are never
    * dropped as late. The synth log is time-ordered (event_id is monotone
    * in ts), so real disorder is only same-second interleaving. */
  val WatermarkDelay = "10 minutes"
  private val CushionMs = 10 * 60 * 1000L

  /** The per-group fold. Emits every fix closed in this trigger; keeps the
    * still-open fix in state for the next trigger. `evict` (streaming
    * only) schedules an event-time timeout at the open fix's own time +
    * cushion, so state for silent devices is flushed and removed instead
    * of living forever — the reference's unbounded `$Nmea` defect
    * (class.nmea.parser.php:18,25; SURVEY.md §4.2), fixed. */
  private def processGroup(evict: Boolean)(
      device: String,
      it: Iterator[ParsedSentence],
      state: GroupState[FixBuffer]): Iterator[StreamFix] = {
    if (evict && state.hasTimedOut) {
      // Silent device: close and emit the open fix, drop the state.
      // Known tradeoff (r3 advisor): removal also discards maxLineNo, the
      // replay high-water mark — a duplicate line replayed AFTER eviction
      // but still inside the watermark window re-assembles as a fresh fix
      // and can double-emit. Accepted: eviction fires one full cushion
      // (10 min) past the fix's own event time, so such a replay must be
      // >10 min late yet non-late by watermark — impossible here, since
      // the cushion equals the watermark delay; keeping tombstones would
      // reintroduce the reference's unbounded-state defect for a replay
      // pattern the source (monotone line_no per device) cannot produce.
      val out = state.getOption.toSeq.flatMap(b =>
        b.current.filter(goodEnough).map(p => toFix(p, b.types)))
      state.remove()
      return out.iterator
    }
    val sorted = it.toSeq.sortBy(_.line_no)
    val prior = state.getOption.getOrElse(FixBuffer(None, -1L, Nil))
    var maxLineNo = prior.maxLineNo
    var open: OpenFix =
      prior.current.map(new OpenFix(_, prior.types.toList)).orNull
    val out = Seq.newBuilder[StreamFix]
    sorted.foreach { s =>
      // replayed/duplicate lines at or before the high-water mark are
      // ignored (exactly-once against source replays)
      if (s.line_no > maxLineNo) {
        maxLineNo = s.line_no
        val opensNew = s.utc.isDefined &&
          (open == null || open.utc != s.utc)
        if (opensNew) {
          if (open != null) {
            val p = open.toSentence(device)
            if (goodEnough(p)) out += toFix(p, open.types)
          }
          open = new OpenFix(s, s.stype :: Nil)
        } else if (open != null) {
          open.add(s)
        }
        // else: pre-fix, timestamp-less sentence — the reference piles
        // these under key 0 (:29); we drop them (never GoodEnough), the
        // high-water mark above still advances
      }
    }
    val buf =
      if (open == null) FixBuffer(None, maxLineNo, Nil)
      else FixBuffer(Some(open.toSentence(device)), maxLineNo, open.types)
    state.update(buf)
    if (evict) {
      // Timeouts must be re-armed on every invocation. The open fix's own
      // event time anchors the timeout; a fix that has no RMC yet inherits
      // the current watermark as its anchor (it still evicts one cushion
      // after the stream moves on). Both anchors are >= the current
      // watermark, which setTimeoutTimestamp requires.
      val anchor = buf.current.flatMap(_.fix_time).map(_.getTime)
        .getOrElse(state.getCurrentWatermarkMs())
      state.setTimeoutTimestamp(math.max(anchor,
        state.getCurrentWatermarkMs()) + CushionMs)
    }
    out.result().iterator
  }

  /** Streaming assembly over parsed sentences, with event-time state
    * eviction (watermark on `fix_time`, carried by RMC sentences). On a
    * batch Dataset the watermark node is erased by the analyzer, so the
    * batch path runs the identical fold without timeouts.
    *
    * Eviction IS the watermark contract: a sentence arriving more than
    * [[WatermarkDelay]] of event time after its fix opened may find the
    * fix already flushed (and may itself be dropped as late) — the stream
    * then differs from batch for that fix. That horizon is the necessary
    * price of bounded state (the alternative is the reference's
    * grow-forever map); real fixes span ~1 second, so the 10-minute
    * cushion is ~600x the observed intra-fix spread. */
  def assemble(parsed: Dataset[ParsedSentence]): Dataset[StreamFix] = {
    import parsed.sparkSession.implicits._
    if (parsed.isStreaming)
      parsed.withWatermark("fix_time", WatermarkDelay)
        .groupByKey(_.device)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(processGroup(evict = true))
    else
      parsed.groupByKey(_.device)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(processGroup(evict = false))
  }

  /** Batch entry point with identical semantics (for stream≡batch tests). */
  def assembleBatch(parsed: Dataset[ParsedSentence]): Dataset[StreamFix] =
    assemble(parsed)
}
