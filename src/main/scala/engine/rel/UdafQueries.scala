package engine.rel

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import engine.Core.{t, r4}
import engine.Q

/** B45 typed UDAF + B3 CSV/JSON source (SURVEY.md §2).
  *
  * `TrajectoryAggregator` generalizes the reference's stream-of-fixes
  * model (class.nmea.parser.php:289-302: speed/track per fix) to a
  * mergeable per-key trajectory summary. Every buffer field is chosen to
  * be ORDER-INDEPENDENT under partial aggregation — counts, min/max,
  * an exact integer-cents sum (double Σ is non-associative and would
  * break hash determinism across shuffles), and first/last selected by
  * the unique event_id (the reference's arrival-order last-writer-wins
  * :173-187 made deterministic, same trick as agg_last_merge/B23).
  */
object TrajectoryAggregator {

  final case class In(user_id: Long, event_id: Long, value: Double)
  final case class Buf(
      n: Long, sumCents: Long, vmin: Double, vmax: Double,
      firstId: Long, firstV: Double, lastId: Long, lastV: Double)
  final case class Out(
      n_events: Long, vsum: Double, vmin: Double, vmax: Double,
      vfirst: Double, vlast: Double, drift: Double)

  val agg: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(0L, 0L, Double.PositiveInfinity,
      Double.NegativeInfinity, Long.MaxValue, 0.0, Long.MinValue, 0.0)
    def reduce(b: Buf, a: In): Buf = {
      val cents = math.round(a.value * 100)
      Buf(b.n + 1, b.sumCents + cents,
        math.min(b.vmin, a.value), math.max(b.vmax, a.value),
        if (a.event_id < b.firstId) a.event_id else b.firstId,
        if (a.event_id < b.firstId) a.value else b.firstV,
        if (a.event_id > b.lastId) a.event_id else b.lastId,
        if (a.event_id > b.lastId) a.value else b.lastV)
    }
    def merge(x: Buf, y: Buf): Buf =
      Buf(x.n + y.n, x.sumCents + y.sumCents,
        math.min(x.vmin, y.vmin), math.max(x.vmax, y.vmax),
        if (x.firstId <= y.firstId) x.firstId else y.firstId,
        if (x.firstId <= y.firstId) x.firstV else y.firstV,
        if (x.lastId >= y.lastId) x.lastId else y.lastId,
        if (x.lastId >= y.lastId) x.lastV else y.lastV)
    def finish(b: Buf): Out = Out(
      b.n, b.sumCents / 100.0, b.vmin, b.vmax,
      b.firstV, b.lastV,
      math.rint((b.lastV - b.firstV) * 10000) / 10000)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}

object UdafQueries {

  /** B45: the typed Aggregator applied per user over events, registered
    * through the `udaf()` surface so it is a first-class grouped column
    * with partial+final (map-side combine) execution — one shuffle of
    * 8-field buffers, never of raw rows. Oracle decomposes into plain
    * SQL aggregates + arg_min/arg_max on the unique event_id. */
  private val udafAggregator = Q(
    (s, d) => {
      import s.implicits._
      val traj = udaf(TrajectoryAggregator.agg)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"))
        .as[TrajectoryAggregator.In]
        .groupBy(col("user_id"))
        .agg(traj(col("user_id"), col("event_id"), col("value")).as("t"))
        .select(col("user_id"), col("t.n_events").as("n_events"),
          r4(col("t.vsum")).as("vsum"), col("t.vmin").as("vmin"),
          col("t.vmax").as("vmax"), col("t.vfirst").as("vfirst"),
          col("t.vlast").as("vlast"), col("t.drift").as("drift"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS vsum,
        min(value) AS vmin, max(value) AS vmax,
        arg_min(value, event_id) AS vfirst,
        arg_max(value, event_id) AS vlast,
        round(arg_max(value, event_id) - arg_min(value, event_id), 4) AS drift
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** B3: CSV source round-trip with explicit schema + JSON prop
    * extraction (the reference's line-oriented ingest :103 generalized to
    * schema'd text formats). Writes events out as CSV, reads it back with
    * a declared schema (no inference job at scale), parses the JSON props
    * column. Oracle reads the original parquet — equality proves the
    * round-trip lossless. */
  private val sourceCsvJson = Q(
    (s, d) => {
      val out = s"${engine.Core.scratchRoot}/graft_source_csv_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("props"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read
        .schema("event_id LONG, event_type STRING, props STRING")
        .option("header", "true").csv(out)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events ORDER BY event_id"""))

  val queries: Map[String, Q] = Map(
    "udaf_aggregator" -> udafAggregator,
    "source_csv_json" -> sourceCsvJson)
}
