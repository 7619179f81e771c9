package engine.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import engine.Core.{t, r4}
import engine.Q

/** Scalar-function surface (SURVEY.md §2 B32–B37) + the as-of join (B16)
  * and approximate distinct (B21).
  *
  * Everything here is pure `Column` composition — codegen-friendly, no
  * UDFs — mirroring the reference's field transforms (substr/trim/upper
  * tokenizing :137-140, NMEA time conversion :86-95, degree→decimal math
  * :339-351) over the driver testdata.
  */
object FnQueries {

  /** B32: the tokenizer family — substring/trim/upper/split/concat
    * (SetNmeaType :137-140 and the per-sentence explode(",") :171 etc.). */
  private val fnString = Q(
    (s, d) => t(s, d, "part").select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 10)).as("name10"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).as("name_len"),
      size(split(col("p_name"), " ")).as("n_tokens"),
      element_at(split(col("p_name"), " "), 1).as("first_token"),
      trim(lit("  padded  ")).as("trimmed"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(substring(p_name, 1, 10)) AS name10,
      concat_ws('|', p_brand, p_type) AS brand_type,
      length(p_name) AS name_len,
      len(string_split(p_name, ' ')) AS n_tokens,
      string_split(p_name, ' ')[1] AS first_token,
      trim('  padded  ') AS trimmed
      FROM part ORDER BY p_partkey"""))

  /** B33: datetime functions incl. the NMEA ddmmyy re-parse with the
    * 2-digit-year pivot (NMEAtoUnixTime :86-95: yy<70 → 2000s, else 1900s).
    * Round-trips o_orderdate through the NMEA date encoding. */
  private val fnDatetime = Q(
    (s, d) => {
      val ddmmyy = date_format(col("o_orderdate"), "ddMMyy")
      val yy = substring(ddmmyy, 5, 2).cast("int")
      val pivotYear = when(yy < 70, yy + 2000).otherwise(yy + 1900)
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate"), lit("2024-01-01").cast("date"))
          .as("days_since"),
        ddmmyy.as("nmea_date"),
        pivotYear.as("pivot_year"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
      year(o_orderdate) AS y, month(o_orderdate) AS m,
      day(o_orderdate) AS dom,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      strftime(o_orderdate, '%d%m%y') AS nmea_date,
      CASE WHEN CAST(substring(strftime(o_orderdate, '%d%m%y'), 5, 2) AS INT) < 70
           THEN CAST(substring(strftime(o_orderdate, '%d%m%y'), 5, 2) AS INT) + 2000
           ELSE CAST(substring(strftime(o_orderdate, '%d%m%y'), 5, 2) AS INT) + 1900
      END AS pivot_year
      FROM orders ORDER BY o_orderkey"""))

  /** B34: math/geo — degree2decimal (:339-351) and haversine distance over
    * coordinates synthesized deterministically from events. Pure column
    * math (radians/sin/cos/atan2/sqrt) — no UDF, stays in codegen. */
  private val fnMathGeo = Q(
    (s, d) => {
      // synth coords: lat in [-45,45), lon in [-90,90)
      val lat = col("value") % 90.0 - lit(45.0)
      val lon = (col("user_id") % 180).cast("double") - lit(90.0)
      // deg2dec on a synthesized ddmm.m encoding of |lat|
      val absLat = abs(lat)
      val ddmm = floor(absLat) * 100.0 + (absLat - floor(absLat)) * 60.0
      val deg2dec = floor(ddmm / 100.0) + (ddmm - floor(ddmm / 100.0) * 100.0) / 60.0
      // haversine to a fixed anchor (48.1173, 11.5167) — the GGA golden fix
      val R = 6371.0088
      val dlat = radians(lat - lit(48.1173))
      val dlon = radians(lon - lit(11.5167))
      val a = pow(sin(dlat / 2), 2) +
        cos(radians(lit(48.1173))) * cos(radians(lat)) * pow(sin(dlon / 2), 2)
      val dist = lit(2 * R) * atan2(sqrt(a), sqrt(lit(1.0) - a))
      t(s, d, "events").select(
        col("event_id"),
        r4(lat).as("lat"), r4(lon).as("lon"),
        r4(deg2dec).as("deg2dec"),
        r4(dist).as("km_to_anchor"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (
      SELECT event_id,
        fmod(value, 90.0) - 45.0 AS lat,
        CAST(user_id % 180 AS DOUBLE) - 90.0 AS lon
      FROM events),
    m AS (
      SELECT event_id, lat, lon,
        floor(abs(lat)) * 100.0 + (abs(lat) - floor(abs(lat))) * 60.0 AS ddmm
      FROM c)
    SELECT event_id, round(lat, 4) AS lat, round(lon, 4) AS lon,
      round(floor(ddmm / 100.0) + (ddmm - floor(ddmm / 100.0) * 100.0) / 60.0, 4)
        AS deg2dec,
      round(2 * 6371.0088 * atan2(
        sqrt(pow(sin(radians(lat - 48.1173) / 2), 2)
          + cos(radians(48.1173)) * cos(radians(lat))
            * pow(sin(radians(lon - 11.5167) / 2), 2)),
        sqrt(1.0 - (pow(sin(radians(lat - 48.1173) / 2), 2)
          + cos(radians(48.1173)) * cos(radians(lat))
            * pow(sin(radians(lon - 11.5167) / 2), 2)))), 4) AS km_to_anchor
      FROM m ORDER BY event_id"""))

  /** B35: array functions over the 64-dim embeddings (the PRN-list /
    * GSV-satellite array model :229-240 generalized). Double-accumulator
    * fold on both sides so float summation order matches. */
  private val fnArray = Q(
    (s, d) => t(s, d, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      r4(element_at(col("embedding"), 1).cast("double")).as("first_val"),
      r4(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"))
        .as("sum_val"),
      r4(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
        .as("norm_sq"),
      size(filter_(col("embedding"), _ > 0f)).as("n_pos"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id, len(embedding) AS dim,
      round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
      round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_val,
      round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS norm_sq,
      len(list_filter(embedding, x -> x > 0)) AS n_pos
      FROM embeddings ORDER BY vec_id"""))

  private def filter_(c: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    filter(c, p)

  /** B36: map functions — the sentence-type flag set (:173,:203,:226...)
    * as a MAP column, built then queried; oracle checks the extracted
    * scalars. */
  private val fnMap = Q(
    (s, d) => t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      .withColumn("m", map(
        lit("click"), col("n_click"),
        lit("view"), col("n_view"),
        lit("purchase"), col("n_purchase")))
      .select(
        col("user_id"),
        element_at(col("m"), "click").as("clicks"),
        element_at(col("m"), "view").as("views"),
        element_at(col("m"), "purchase").as("purchases"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
      count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
      count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
      count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
      'click,purchase,view' AS keys
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** B37: JSON extraction from events.props (the config/props surface). */
  private val fnJson = Q(
    (s, d) => t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        r4(avg(col("k"))).as("avg_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(k) AS n_with_k,
      min(k) AS min_k, max(k) AS max_k, round(avg(k), 4) AS avg_k
      FROM (SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** B16: as-of join — the `$CurrentUTC` carry-forward (:22, :227-243:
    * attach timestamp-less sentences to the most recent fix) generalized:
    * each event matches the latest order of the same customer at or before
    * its timestamp. Implemented shuffle-once via union + carry-forward
    * window (no cross/range join), which scales to arbitrarily large sides.
    * Orders deduped to one per (custkey, date) so ties are deterministic. */
  private val joinAsof = Q(
    (s, d) => {
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("at"))
        .agg(max(col("o_orderkey")).as("ok"))
        .select(col("k"), col("at"), col("ok"), lit(null: java.lang.Long).as("event_id"))
      val e = t(s, d, "events")
        .select(col("user_id").as("k"), col("ts").as("at"),
          lit(null: java.lang.Long).as("ok"), col("event_id"))
      // orders sort before events at equal timestamps (asof is <=):
      // null event_id → NULLS FIRST under Spark ASC, and the oracle matches.
      val w = Window.partitionBy(col("k"))
        .orderBy(col("at"), col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      o.unionByName(e)
        .withColumn("matched_order", last(col("ok"), ignoreNulls = true).over(w))
        .filter(col("event_id").isNotNull && col("matched_order").isNotNull)
        .select(col("event_id"), col("k").as("user_id"), col("matched_order"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ok AS matched_order
      FROM events ASOF JOIN
        (SELECT o_custkey AS k, o_orderdate AS at, max(o_orderkey) AS ok
         FROM orders GROUP BY 1, 2) o
        ON events.user_id = o.k AND events.ts >= o.at
      ORDER BY event_id"""))

  /** B16b: FORWARD as-of join — each click matched to the user's
    * EARLIEST purchase at-or-after it (the other half of the as-of
    * pair: backward answers "state as of t", forward answers "next
    * action after t" — conversion attribution here, "next trade after
    * the quote" in tick data; join_interval emits ALL purchases in a
    * window, as-of exactly ONE). Same union+window shape as
    * [[joinAsof]] mirrored: one partition-sorted pass, `first` non-null
    * over the FORWARD frame — no range join, no per-row probe; one
    * shuffle on the key at any scale. At equal timestamps the purchase
    * is visible to the click (asof <= includes equality): purchases
    * sort AFTER clicks within a timestamp via NULLS LAST, so the
    * forward frame starting at the click row includes them; same-(user,
    * ts) purchases pre-group to the min id so the match is total-order
    * deterministic in both engines. */
  private val joinAsofForward = Q(
    (s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("k"), col("ts").as("at"))
        .agg(min(col("event_id")).as("pid"))
        .select(col("k"), col("at"), col("pid"),
          lit(null: java.lang.Long).as("click_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), col("ts").as("at"),
          lit(null: java.lang.Long).as("pid"),
          col("event_id").as("click_id"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("at"), col("click_id").asc_nulls_last)
        .rowsBetween(0, Window.unboundedFollowing)
      p.unionByName(c)
        .withColumn("purchase_id",
          first(col("pid"), ignoreNulls = true).over(w))
        .filter(col("click_id").isNotNull && col("purchase_id").isNotNull)
        .select(col("click_id"), col("k").as("user_id"),
          col("purchase_id"))
        .orderBy("click_id")
    },
    Some("""SELECT c.event_id AS click_id, c.user_id, p.pid AS purchase_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN
        (SELECT user_id AS k, ts AS at, min(event_id) AS pid
         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
        ON c.user_id = p.k AND c.ts <= p.at
      ORDER BY click_id"""))

  // --------------------------------------- B16c join_asof_tolerance
  /** Max staleness an as-of match may carry (24 h, in microseconds). */
  private val AsofTolUs = 86400000000L

  /** B16c: TOLERANCE-BOUNDED as-of join — [[joinAsof]]'s semantics
    * with a max-staleness bound: each click matches the user's latest
    * purchase at-or-before it ONLY if that purchase is within
    * [[AsofTolUs]] (recency-bounded attribution; in market data,
    * "quote valid for at most n seconds"). pandas' `merge_asof
    * (tolerance=...)` / QuestDB's bounded ASOF — the variant that
    * keeps a stale dimension from silently enriching forever.
    *
    * Same single-pass union+window shape as [[joinAsof]]: the carried
    * match must also surface its OWN timestamp for the bound, so the
    * window carries two `last(_, ignoreNulls)` columns — both resolve
    * to the same last purchase row by construction (one non-null iff
    * the other is), keeping id and timestamp consistent. Staleness is
    * compared in exact integer microseconds (`unix_micros` ≙ DuckDB
    * `epoch_us`) — sub-second timestamps make float/truncated-second
    * staleness non-portable. One shuffle on the key at any scale; the
    * tolerance is a post-window filter, never a join predicate (no
    * range-join blowup). */
  private val joinAsofTolerance = Q(
    (s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("k"), col("ts").as("at"))
        .agg(min(col("event_id")).as("pid"))
        .select(col("k"), col("at"), col("pid"),
          lit(null: java.lang.Long).as("click_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), col("ts").as("at"),
          lit(null: java.lang.Long).as("pid"),
          col("event_id").as("click_id"))
      // purchases sort before clicks at equal ts (asof <= includes
      // equality): pid non-null → NULLS FIRST on click_id
      val w = Window.partitionBy(col("k"))
        .orderBy(col("at"), col("click_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      p.unionByName(c)
        .withColumn("purchase_id", last(col("pid"), ignoreNulls = true).over(w))
        .withColumn("matched_at", last(when(col("pid").isNotNull, col("at")),
          ignoreNulls = true).over(w))
        .filter(col("click_id").isNotNull && col("purchase_id").isNotNull)
        .withColumn("staleness_us",
          unix_micros(col("at")) - unix_micros(col("matched_at")))
        .filter(col("staleness_us") <= AsofTolUs)
        .select(col("click_id"), col("k").as("user_id"),
          col("purchase_id"), col("staleness_us"))
        .orderBy("click_id")
    },
    Some(s"""SELECT c.event_id AS click_id, c.user_id, p.pid AS purchase_id,
        (epoch_us(c.ts) - epoch_us(p.at))::BIGINT AS staleness_us
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT user_id AS k, ts AS at, min(event_id) AS pid
                 FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
        ON c.user_id = p.k AND c.ts >= p.at
      WHERE epoch_us(c.ts) - epoch_us(p.at) <= $AsofTolUs
      ORDER BY click_id"""))

  /** B16d: NEAREST as-of join — each click matched to its nearest
    * purchase in TIME, either direction (pandas `merge_asof
    * (direction='nearest')`): backward answers "state as of t", forward
    * "next action after t", nearest "the closest observation" — the
    * sensor-fusion / sparse-telemetry alignment variant. Ties (equal
    * distance both ways, including the same-instant Δ=0 case) resolve
    * to the EARLIER purchase, pandas' convention.
    *
    * ONE union + TWO window passes over the SAME key partitioning (two
    * sort orders, one exchange): the backward frame carries the latest
    * at-or-before purchase id + its own timestamp (purchases sort
    * before clicks at an equal instant), the forward frame the earliest
    * at-or-after (purchases after clicks), and the pick compares the
    * two staleness values in exact integer microseconds. No range
    * join, no per-row probe — the as-of-family posture; same-(user,
    * ts) purchases pre-group to the min id so both directions are
    * total-order deterministic. */
  private val joinAsofNearest = Q(
    (s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("k"), col("ts").as("at"))
        .agg(min(col("event_id")).as("pid"))
        .select(col("k"), col("at"), col("pid"),
          unix_micros(col("at")).as("pts"),
          lit(null: java.lang.Long).as("click_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), col("ts").as("at"),
          lit(null: java.lang.Long).as("pid"),
          lit(null: java.lang.Long).as("pts"),
          col("event_id").as("click_id"))
      val wb = Window.partitionBy(col("k"))
        .orderBy(col("at"), col("click_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wf = Window.partitionBy(col("k"))
        .orderBy(col("at"), col("click_id").asc_nulls_last)
        .rowsBetween(0, Window.unboundedFollowing)
      val bd = unix_micros(col("at")) - col("bts")
      val fd = col("fts") - unix_micros(col("at"))
      val pickB = col("fpid").isNull ||
        (col("bpid").isNotNull && bd <= fd)
      p.unionByName(c)
        .withColumn("bpid", last(col("pid"), ignoreNulls = true).over(wb))
        .withColumn("bts", last(col("pts"), ignoreNulls = true).over(wb))
        .withColumn("fpid", first(col("pid"), ignoreNulls = true).over(wf))
        .withColumn("fts", first(col("pts"), ignoreNulls = true).over(wf))
        .filter(col("click_id").isNotNull &&
          (col("bpid").isNotNull || col("fpid").isNotNull))
        .select(col("click_id"), col("k").as("user_id"),
          when(pickB, col("bpid")).otherwise(col("fpid"))
            .as("matched_purchase"),
          when(pickB, lit("b")).otherwise(lit("f")).as("dir"),
          when(pickB, bd).otherwise(fd).as("delta_us"))
        .orderBy("click_id")
    },
    Some("""WITH np AS (SELECT user_id AS k, ts AS at, min(event_id) pid,
                epoch_us(ts)::BIGINT pts
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 4),
      ncl AS (SELECT user_id AS k, ts AS at, event_id cid
              FROM events WHERE event_type = 'click'),
      nu AS (SELECT k, at, pid, pts, NULL::BIGINT AS cid FROM np
             UNION ALL
             SELECT k, at, NULL::BIGINT, NULL::BIGINT, cid FROM ncl),
      nw AS (SELECT k, at, cid,
               last_value(pid IGNORE NULLS) OVER
                 (PARTITION BY k ORDER BY at, cid ASC NULLS FIRST
                  ROWS UNBOUNDED PRECEDING) AS bpid,
               last_value(pts IGNORE NULLS) OVER
                 (PARTITION BY k ORDER BY at, cid ASC NULLS FIRST
                  ROWS UNBOUNDED PRECEDING) AS bts,
               first_value(pid IGNORE NULLS) OVER
                 (PARTITION BY k ORDER BY at, cid ASC NULLS LAST
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS fpid,
               first_value(pts IGNORE NULLS) OVER
                 (PARTITION BY k ORDER BY at, cid ASC NULLS LAST
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS fts
             FROM nu),
      npk AS (SELECT cid, k, at, bpid, fpid,
                epoch_us(at)::BIGINT - bts AS bd,
                fts - epoch_us(at)::BIGINT AS fd,
                (fpid IS NULL OR (bpid IS NOT NULL AND
                  epoch_us(at)::BIGINT - bts <= fts - epoch_us(at)::BIGINT))
                  AS pb
              FROM nw
              WHERE cid IS NOT NULL
                AND (bpid IS NOT NULL OR fpid IS NOT NULL))
      SELECT cid AS click_id, k AS user_id,
        CASE WHEN pb THEN bpid ELSE fpid END AS matched_purchase,
        CASE WHEN pb THEN 'b' ELSE 'f' END AS dir,
        CASE WHEN pb THEN bd ELSE fd END AS delta_us
      FROM npk ORDER BY click_id"""))

  /** B21: approximate distinct (scale mandate — 100 TB cardinalities
    * can't be counted exactly without shuffling every key). Two surfaces:
    *
    *  - Spark's native HLL (`approx_count_distinct`) is the operator a
    *    user reaches for; its sketch isn't portable to DuckDB, so its
    *    error bound is pinned in RelSpec, not here.
    *  - The QUERY emits a *portable* cardinality sketch — linear counting
    *    (Whang et al., TODS '90) over K=4096 md5 buckets: estimate =
    *    −K·ln(V) where V = empty-bucket fraction = 1 − lc_buckets/K.
    *    The empty count is clamped to ≥1 so a saturated sketch (every
    *    bucket hit — certain beyond ~35k distinct) reports its ceiling
    *    K·ln(K) ≈ 34k instead of ln(0) (DuckDB hard-errors, Spark NULLs).
    *    Bucketing and arithmetic are deterministic and identical in both
    *    engines (md5-prefix → BIGINT & 4095, same double math), so the
    *    whole row — exact count, buckets hit, estimate — is hash-checked
    *    against DuckDB like any exact query. */
  private val aggApproxDistinct = Q(
    (s, d) => {
      val hit = countDistinct(col("bucket"))
      t(s, d, "events")
        .select(col("event_type"),
          col("user_id"),
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long").bitwiseAND(lit(4095L)).as("bucket"))
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          hit.as("lc_buckets"),
          r4(-lit(4096.0) *
              log(greatest(lit(4096L) - hit, lit(1L)) / lit(4096.0)))
            .as("lc_estimate"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
        count(DISTINCT user_id) AS exact_users,
        count(DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT & 4095)
          AS lc_buckets,
        round(-4096.0 * ln(greatest(4096 -
          count(DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT & 4095),
          1) / 4096.0), 4) AS lc_estimate
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val queries: Map[String, Q] = Map(
    "fn_string" -> fnString,
    "fn_datetime" -> fnDatetime,
    "fn_math_geo" -> fnMathGeo,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "join_asof" -> joinAsof,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_asof_nearest" -> joinAsofNearest,
    "agg_approx_distinct" -> aggApproxDistinct)
}
