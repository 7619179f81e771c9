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

  /** Last-writer-wins field merge of sentence `s` into open fix `b`
    * (`$Nmea[$CurrentUTC][field] = value`, :173-187 etc.). */
  private[stream] def merge(b: ParsedSentence, s: ParsedSentence): ParsedSentence =
    ParsedSentence(
      device = b.device,
      line_no = s.line_no,
      stype = s.stype,
      utc = b.utc, // fix key — constant within the open fix
      date = s.date.orElse(b.date),
      lat = s.lat.orElse(b.lat),
      lon = s.lon.orElse(b.lon),
      ns = s.ns.orElse(b.ns),
      ew = s.ew.orElse(b.ew),
      quality = s.quality.orElse(b.quality),
      numsat = s.numsat.orElse(b.numsat),
      hdop = s.hdop.orElse(b.hdop),
      vdop = s.vdop.orElse(b.vdop),
      pdop = s.pdop.orElse(b.pdop),
      alt = s.alt.orElse(b.alt),
      geoidal = s.geoidal.orElse(b.geoidal),
      dgps_age = s.dgps_age.orElse(b.dgps_age),
      dgps_station = s.dgps_station.orElse(b.dgps_station),
      status = s.status.orElse(b.status),
      select_mode = s.select_mode.orElse(b.select_mode),
      fix_mode = s.fix_mode.orElse(b.fix_mode),
      sats = s.sats.orElse(b.sats),
      gsv_messages = s.gsv_messages.orElse(b.gsv_messages),
      gsv_msgnum = s.gsv_msgnum.orElse(b.gsv_msgnum),
      satview = s.satview.orElse(b.satview),
      // GSV groups accumulate (:261 intended semantics), others overwrite
      sats_in_view = (b.sats_in_view, s.sats_in_view) match {
        case (Some(a), Some(c)) => Some(a ++ c)
        case (a, c) => c.orElse(a)
      },
      speed_knots = s.speed_knots.orElse(b.speed_knots),
      speed_kmph = s.speed_kmph.orElse(b.speed_kmph),
      track_deg = s.track_deg.orElse(b.track_deg),
      track_mag_deg = s.track_mag_deg.orElse(b.track_mag_deg),
      magvar = s.magvar.orElse(b.magvar),
      magvar_ew = s.magvar_ew.orElse(b.magvar_ew),
      fix_time = s.fix_time.orElse(b.fix_time))

  /** GoodEnough (:126-129). */
  private def goodEnough(p: ParsedSentence): Boolean =
    p.date.isDefined && p.utc.isDefined && p.lat.isDefined && p.lon.isDefined

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
    var buf = state.getOption.getOrElse(FixBuffer(None, -1L, Nil))
    val out = Seq.newBuilder[StreamFix]
    sorted.foreach { s =>
      // replayed/duplicate lines at or before the high-water mark are
      // ignored (exactly-once against source replays)
      if (s.line_no > buf.maxLineNo) {
        val opensNew = s.utc.isDefined &&
          !buf.current.exists(_.utc == s.utc)
        if (opensNew) {
          buf.current.filter(goodEnough)
            .foreach(p => out += toFix(p, buf.types))
          buf = FixBuffer(Some(s), s.line_no, Seq(s.stype))
        } else if (buf.current.isDefined) {
          buf = FixBuffer(Some(merge(buf.current.get, s)), s.line_no,
            buf.types :+ s.stype)
        } else {
          // pre-fix, timestamp-less sentence: the reference piles these
          // under key 0 (:29); we drop them (they can never GoodEnough)
          buf = buf.copy(maxLineNo = s.line_no)
        }
      }
    }
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
