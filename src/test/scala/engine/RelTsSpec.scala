package engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import gps.TestSpark

/** Behavior pins for the round-19 time-series QA operators (SURVEY.md §2
  * B27f/B27g): brute-force recomputes from the raw events so the window
  * formulations can never silently change frame bounds, tie rules, or the
  * integer flag algebra. sf0.001 is sparse enough that ts_anomaly's n ≥ 12
  * baseline gate yields zero flags there — the non-degenerate regime
  * (341 anomalies at sf0.01) is pinned by the oracle gate; these tests pin
  * the MECHANISM on the small fixture plus hand-built frames.
  */
class RelTsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("ts_anomaly matches the brute per-event trailing-6h recompute " +
      "(exclusive current row), and flag == (|z| > 3) wherever z exists") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byType = ev.groupBy(_._2)
    val got = graft.SparkEntry.queries("ts_anomaly")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4))))
      .toMap
    assert(got.size == ev.length)
    ev.foreach { case (id, tp, us, c) =>
      val frame = byType(tp).filter(e =>
        e._3 >= us - 21600000000L && e._3 <= us - 1)
      val n = frame.length.toLong
      val s1 = frame.map(_._4).sum
      val s2 = frame.map(e => e._4 * e._4).sum
      val varn2 = n * s2 - s1 * s1
      val (gn, gz, gflag) = got(id)
      assert(gn == n, s"event $id n_win")
      if (n >= 12 && varn2 > 0) {
        val dev = c * n - s1
        val z = dev.toDouble / math.sqrt(varn2.toDouble)
        assert(gz.isDefined && math.abs(gz.get - z) < 5e-4, s"event $id z")
        assert(gflag == (dev * dev > 9L * varn2), s"event $id flag")
        assert(gflag == (math.abs(z) > 3.0) ||
          math.abs(math.abs(z) - 3.0) < 1e-9, s"event $id flag==|z|>3")
      } else {
        assert(gz.isEmpty && !gflag, s"event $id sparse frame must not flag")
      }
    }
  }

  test("ts_interval_union: intervals are disjoint, ordered, cover every " +
      "event, and match the brute sweep-line merge") {
    val durOf = Map("view" -> 300L, "click" -> 900L, "error" -> 600L,
      "signup" -> 1800L).withDefaultValue(3600L)
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(3),
        r.getLong(3) + durOf(r.getString(2)) * 1000000L))
    // brute: per user, sort by start (ties irrelevant to the merged
    // geometry), sweep and merge on overlap-or-touch (us <= maxEnd)
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).toList
      val merged = sorted.drop(1).foldLeft(
        List((sorted.head._2, sorted.head._3, 1L))) {
        case (acc @ ((s0, e0, k) :: rest), (_, st, en)) =>
          if (st <= e0) (s0, math.max(e0, en), k + 1) :: rest
          else (st, en, 1L) :: acc
        case (Nil, _) => Nil
      }.reverse
      merged.zipWithIndex.map { case ((st, en, k), i) =>
        (u, i + 1L) -> ((st, en, k)) }
    }
    val got = graft.SparkEntry.queries("ts_interval_union")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == expect.size)
    expect.foreach { case (key, (st, en, k)) =>
      val (gs, ge, gk) = got(key)
      assert((gs, ge, gk) == ((st, en, k)), s"interval $key")
    }
    // geometry invariants: within a user, intervals strictly ordered and
    // separated by a real gap (else they would have merged)
    got.toSeq.groupBy(_._1._1).foreach { case (_, ivs) =>
      ivs.sortBy(_._1._2).sliding(2).foreach {
        case Seq((_, (_, e1, _)), (_, (s2, _, _))) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("win_streaks matches the brute consecutive-day recompute, " +
      "longest-streak ties resolve to the earliest start") {
    val days = Core.t(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
    val expect = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sortBy(_.toEpochDay)
      val streaks = sorted.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
        case ((s0, len) :: rest, d0)
            if s0.plusDays(len).isEqual(d0) => (s0, len + 1) :: rest
        case (acc, d0) => (d0, 1L) :: acc
      }.reverse
      val best = streaks.minBy { case (s0, len) => (-len, s0.toEpochDay) }
      u -> ((sorted.length.toLong, streaks.length.toLong,
        streaks.map(_._2).max, best._1.toString))
    }
    val got = graft.SparkEntry.queries("win_streaks")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
    // non-degenerate fixture: at least one real multi-day streak and at
    // least one user with several streaks
    assert(expect.values.exists(_._3 >= 2))
    assert(expect.values.exists(_._2 >= 2))
  }

  test("tokenize_vocab_coverage: vocab is the top-16 (count, term) cut; " +
      "per-lang token counts and OOV rate match the brute recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").toSeq)
    val cnt = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val vocab = cnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(16).map(_._1).toSet
    val expect = docs.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.flatMap(_._2)
      val oov = toks.filterNot(vocab)
      lang -> ((toks.size.toLong, oov.size.toLong,
        oov.distinct.size.toLong))
    }
    val got = graft.SparkEntry.queries("tokenize_vocab_coverage")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (lang, (nt, noov, ntypes)) =>
      val (gt, goov, gtypes, grate) = got(lang)
      assert((gt, goov, gtypes) == ((nt, noov, ntypes)), s"lang $lang")
      assert(math.abs(grate - noov.toDouble / nt) < 5e-4, s"lang $lang rate")
      assert(goov > 0 && goov < gt,
        s"lang $lang: both sides of the vocab cut must be populated")
    }
  }

  test("ts_ewma matches the brute finite-K weighted recompute per user " +
      "series, and a lone first observation smooths to itself") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = graft.SparkEntry.queries("ts_ewma")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == ev.length)
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._3, e._1))
      ordered.zipWithIndex.foreach { case ((id, _, _, _), idx) =>
        val tail = ordered.slice(math.max(0, idx - 7), idx + 1).reverse
        val num = tail.zipWithIndex
          .map { case (e, i) => e._4 * (1L << (7 - i)) }.sum
        val den = tail.zipWithIndex.map { case (_, i) => 1L << (7 - i) }.sum
        val expect =
          math.floor(num.toDouble / (den.toDouble * 100.0) * 1e4 + 0.5) / 1e4
        assert(math.abs(got(id) - expect) < 1e-9, s"event $id ewma")
        if (idx == 0)
          assert(math.abs(got(id) -
            math.floor(tail.head._4.toDouble / 100.0 * 1e4 + 0.5) / 1e4)
            < 1e-9, s"event $id: series head must smooth to itself")
      }
    }
  }

  test("agg_bitmap_distinct equals the exact COUNT(DISTINCT) per month " +
      "and packs words at the 63-ids-per-word density") {
    val o = Core.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        col("o_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = o.groupBy(_._1).map { case (m, rs) =>
      val ks = rs.map(_._2).distinct
      m -> ((ks.size.toLong, ks.map(_ / 63).distinct.size.toLong))
    }
    val got = graft.SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    got.values.foreach { case (n, w) =>
      assert(n >= w && n <= w * 63L,
        "popcount must lie within the occupied-word envelope")
    }
  }

  test("agg_bitmap_retention equals the brute set-intersection recompute " +
      "over adjacent months, and months without a successor are absent") {
    val o = Core.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        col("o_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = o.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def nextMon(m: String): String = {
      val Array(y, mm) = m.split("-").map(_.toInt)
      if (mm == 12) f"${y + 1}%04d-01" else f"$y%04d-${mm + 1}%02d"
    }
    val expect = sets.keys.filter(m => sets.contains(nextMon(m))).map { m =>
      val (a, b) = (sets(m), sets(nextMon(m)))
      val retained = (a intersect b).size.toLong
      m -> ((a.size.toLong, b.size.toLong, retained,
        math.floor(retained.toDouble / a.size.toDouble * 1e4 + 0.5) / 1e4))
    }.toMap
    val got = graft.SparkEntry.queries("agg_bitmap_retention")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got == expect)
    assert(got.values.exists(_._3 > 0L),
      "some adjacent-month pair must share customers")
  }

  test("fixture guard: events.value and epoch are non-negative at every " +
      "test SF — the div-semantics seam the integer ts ops stand on") {
    // ts_cusum / ts_seasonal_baseline translate DuckDB `//` (floors
    // toward -inf) as Spark `div` (truncates toward zero). The two agree
    // ONLY on non-negative numerators: per-series cents sums (value >= 0)
    // and the hod bucket (ts >= epoch). This pins the assumption the
    // docstrings state, so a fixture regeneration with negative values or
    // pre-1970 timestamps fails HERE with the reason, not as an opaque
    // oracle hash mismatch. (r19 ADVICE item 3.)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = Core.t(spark, d, "events")
        .agg(min(col("value")), min(unix_micros(col("ts")))).head()
      assert(r.getDouble(0) >= 0.0,
        s"$d events.value has negatives: Spark div != DuckDB // on sums")
      assert(r.getLong(1) >= 0L,
        s"$d has pre-epoch timestamps: hod bucket floors differently")
    }
  }

  test("ts_cusum matches the LITERAL max(0, S + y) recurrence per series " +
      "(proving the prefix-sum minus running-min identity), alarms exist") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val got = graft.SparkEntry.queries("ts_cusum")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == ev.length)
    var anyAlarm = false
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.length.toLong
      val k = rows.map(_._4).sum / n
      val aad = rows.map(e => math.abs(e._4 - k)).sum / n
      var s = 0L
      rows.sortBy(e => (e._3, e._1)).foreach { case (id, _, _, c) =>
        s = math.max(0L, s + (c - k - aad / 2))
        val (gs, galarm) = got(id)
        assert(gs == s, s"event $id cusum")
        assert(galarm == (s > 8L * aad), s"event $id alarm")
        anyAlarm ||= galarm
      }
    }
    assert(anyAlarm, "the fixture must trip at least one alarm")
  }

  test("agg_bitmap_funnel equals the brute distinct-user set AND-chain, " +
      "populations narrow monotonically") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def users(tp: String) = ev.filter(_._1 == tp).map(_._2).toSet
    val (v, c, p) = (users("view"), users("click"), users("purchase"))
    val (n1, n2, n3) =
      (v.size.toLong, (v & c).size.toLong, (v & c & p).size.toLong)
    val got = graft.SparkEntry.queries("agg_bitmap_funnel")(spark, sf)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1)._2 == n1 && got(2)._2 == n2 && got(3)._2 == n3)
    assert(got(1)._3 == 1.0)
    assert(math.abs(got(2)._3 -
      math.floor(n2.toDouble / n1 * 1e4 + 0.5) / 1e4) < 1e-9)
    assert(math.abs(got(3)._3 -
      math.floor(n3.toDouble / n2 * 1e4 + 0.5) / 1e4) < 1e-9)
    assert(n1 >= n2 && n2 >= n3 && n3 > 0,
      "every funnel step must stay populated on the fixture")
  }

  test("ts_seasonal_baseline matches the brute per-(series, hour) " +
      "integer recompute; outliers exist but stay a small minority") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 3600000000 % 24").as("hod"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byBucket = ev.groupBy(e => (e._2, e._3))
    val got = graft.SparkEntry.queries("ts_seasonal_baseline")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size == ev.length)
    var flagged = 0
    byBucket.foreach { case (_, rows) =>
      val n = rows.length.toLong
      val k = rows.map(_._4).sum / n
      val aad = rows.map(e => math.abs(e._4 - k)).sum / n
      rows.foreach { case (id, _, _, c) =>
        val (gr, gf) = got(id)
        assert(gr == c - k, s"event $id residual")
        assert(gf == (math.abs(c - k) > 4L * aad), s"event $id flag")
        if (gf) flagged += 1
      }
    }
    assert(flagged > 0 && flagged < ev.length / 10,
      s"outliers populated but a minority, got $flagged/${ev.length}")
  }

  test("ts_acf matches the brute Pearson recompute over lagged pairs " +
      "per series, r in [-1, 1]") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val got = graft.SparkEntry.queries("ts_acf")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    val series = ev.groupBy(_._2)
    assert(got.keySet == series.keySet.flatMap(t => (1 to 4).map(t -> _)))
    series.foreach { case (tp, rows) =>
      val cs = rows.sortBy(e => (e._3, e._1)).map(_._4)
      (1 to 4).foreach { l =>
        val pairs = cs.drop(l).zip(cs.dropRight(l)) // (x_t, x_{t-l})
        val m = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val vx = m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = m.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
        val cov = m.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
        val (gm, gr) = got((tp, l))
        assert(gm == m, s"$tp lag $l pair count")
        if (vx > 0 && vy > 0) {
          val expect =
            math.floor(cov / math.sqrt(vx * vy) * 1e4 + 0.5) / 1e4
          assert(gr.isDefined && math.abs(gr.get - expect) < 1e-9,
            s"$tp lag $l acf")
          assert(gr.get >= -1.0 && gr.get <= 1.0, s"$tp lag $l range")
        } else assert(gr.isEmpty, s"$tp lag $l degenerate variance")
      }
    }
  }
}
