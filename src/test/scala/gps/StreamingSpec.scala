package gps

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import gps.parse.{NmeaFunctions => NF}
import gps.stream.{FixAssembler, ParsedSentence}

/** Streaming semantics: watermark late-drop, stateful fix assembly
  * incrementally across triggers, stream ≡ batch equivalence
  * (FIXTURES.md §2; SURVEY.md B41-B42). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ck(payload: String): String = {
    val x = payload.getBytes("ASCII").foldLeft(0)((a, b) => a ^ b)
    f"$$$payload*$x%02X"
  }

  private val fix1 = Seq(
    ("A", 10L, ck("GPGGA,120000,4807.0380,N,01131.0000,E,1,08,0.9,545.4,M,46.9,M,,")),
    ("A", 11L, ck("GPGSA,A,3,04,05,,09,12,,,24,,,,,2.5,1.3,2.1")),
    ("A", 12L, ck("GPRMC,120000,A,4807.0380,N,01131.0000,E,022.4,084.4,010324,003.1,W")))
  private val fix1Vtg = ("A", 13L, ck("GPVTG,054.7,T,034.4,M,022.4,N,041.5,K"))
  private val fix2 = Seq(
    ("A", 20L, ck("GPGGA,120001,4807.0380,N,01131.0000,E,1,08,0.9,545.4,M,46.9,M,,")),
    ("A", 21L, ck("GPRMC,120001,A,4807.0380,N,01131.0000,E,010.0,084.4,010324,003.1,W")),
    ("A", 30L, ck("GPGGA,999999,0000.0000,N,00000.0000,E,1,00,0.0,0.0,M,0.0,M,,")))

  test("stateful fix assembly across triggers: late VTG enriches the open fix") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val parsed = NF.parseSentences(
      mem.toDF().toDF("device", "line_no", "line")).as[ParsedSentence]
    val q = FixAssembler.assemble(parsed).toDF()
      .writeStream.format("memory").queryName("sfix")
      .outputMode("append").start()
    try {
      mem.addData(fix1: _*) // fix1 still open — nothing emitted
      q.processAllAvailable()
      assert(spark.table("sfix").count() == 0)
      mem.addData(fix1Vtg +: fix2: _*) // VTG joins fix1, then fix2 closes it
      q.processAllAvailable()
      val rows = spark.table("sfix").orderBy("utc").collect()
      assert(rows.map(_.getAs[String]("utc")).toSeq == Seq("120000", "120001"))
      val f1 = rows(0)
      assert(f1.getAs[Double]("speed_kmph") == 41.5) // VTG made it in
      assert(f1.getAs[Double]("vdop") == 2.1)        // GSA made it in
      assert(f1.getAs[Boolean]("complete"))
    } finally q.stop()
  }

  test("stream ≡ batch: assembler gives identical fixes on the golden stream") {
    val all = (fix1 :+ fix1Vtg) ++ fix2
    val batch = FixAssembler.assemble(
      NF.parseSentences(all.toDF("device", "line_no", "line"))
        .as[ParsedSentence])
      .collect().filter(_.complete)
      .map(f => (f.device, f.utc, f.speed_kmph, f.types_seen))
    assert(batch.toSet == Set(
      ("A", "120000", Some(41.5), "GPGGA,GPGSA,GPRMC,GPVTG"),
      ("A", "120001", None, "GPGGA,GPRMC")))
  }

  test("event-time timeout closes and evicts a silent device's open fix (B42)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val parsed = NF.parseSentences(
      mem.toDF().toDF("device", "line_no", "line")).as[ParsedSentence]
    val q = FixAssembler.assemble(parsed).toDF()
      .writeStream.format("memory").queryName("evict")
      .outputMode("append").start()
    try {
      mem.addData(fix1: _*) // A's fix at 12:00:00 — open, nothing emitted
      q.processAllAvailable()
      assert(spark.table("evict").filter(col("device") === "A").count() == 0)
      // a different device advances event time to 13:00 → after this
      // batch the watermark is 12:50, past A's 12:10 eviction anchor
      mem.addData(("B", 100L,
        ck("GPRMC,130000,A,4807.0380,N,01131.0000,E,010.0,084.4,010324,003.1,W")))
      q.processAllAvailable()
      // the next batch's timeout sweep fires for A: the open fix emits
      // WITHOUT any closing sentence from A, and A's state is removed
      mem.addData(("B", 101L,
        ck("GPRMC,130100,A,4807.0380,N,01131.0000,E,010.0,084.4,010324,003.1,W")))
      q.processAllAvailable()
      val a = spark.table("evict").filter(col("device") === "A").collect()
      assert(a.length == 1, s"expected A's fix flushed by timeout: ${a.toSeq}")
      assert(a(0).getAs[String]("utc") == "120000")
      assert(a(0).getAs[Boolean]("complete"))
      assert(a(0).getAs[String]("types_seen") == "GPGGA,GPGSA,GPRMC")
    } finally q.stop()
  }

  test("watermark drops late data across triggers (B41)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(min: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T10:00:00Z").plusSeconds(min * 60L))
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wmtest")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 1.0), (ts(5), 1.0)) // window 10:00-10:10
      q.processAllAvailable()
      mem.addData((ts(30), 1.0)) // advances watermark to 10:25 → closes w1
      q.processAllAvailable()
      mem.addData((ts(2), 9.0)) // LATE: before watermark → dropped
      q.processAllAvailable()
      mem.addData((ts(60), 1.0)) // close the 10:30 window too
      q.processAllAvailable()
      val n = spark.table("wmtest")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(n("10:00") == 2) // late row NOT counted
      assert(n("10:30") == 1)
    } finally q.stop()
  }

  test("replayed lines (same line_no) are idempotent in the assembler") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val parsed = NF.parseSentences(
      mem.toDF().toDF("device", "line_no", "line")).as[ParsedSentence]
    val q = FixAssembler.assemble(parsed).toDF()
      .writeStream.format("memory").queryName("replay")
      .outputMode("append").start()
    try {
      mem.addData(fix1: _*)
      q.processAllAvailable()
      mem.addData(fix1: _*) // full replay of the open fix — must not dup
      q.processAllAvailable()
      mem.addData(fix2: _*)
      q.processAllAvailable()
      val utcs = spark.table("replay").select("utc").as[String].collect()
      assert(utcs.count(_ == "120000") == 1)
    } finally q.stop()
  }

  test("RocksDB state store: flagship merge + stateful joins result-identical") {
    // spark.graft.stateStore=rocksdb swaps the per-run provider inside
    // runToMemory; every stateful query must produce byte-identical
    // results under either store — the deployment knob for 100x key
    // cardinality must never be a semantics knob
    val sf = "/root/testdata/sf0.001"
    val qs = engine.stream.StreamQueries.queries
    Seq("stream_stateful_merge", "stream_join_stream", "stream_dedup")
      .foreach { id =>
        val base = qs(id).fn(spark, sf).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.stateStore", "rocksdb")
        try {
          val rocks = qs(id).fn(spark, sf).collect().map(_.toString).sorted.toSeq
          assert(rocks == base, s"$id differs under RocksDB")
          assert(rocks.nonEmpty, s"$id returned no rows")
        } finally spark.conf.unset("spark.graft.stateStore")
      }
  }

  test("flagship merge: result invariant under trigger/state-partition knobs") {
    // the r7 deployment confs (spark.graft.merge.*) size trigger admission
    // and state-store parallelism; like the store provider, they must
    // never be semantics knobs — any file split and any partition count
    // must assemble the identical fix set (decomposition invariance)
    val sf = "/root/testdata/sf0.001"
    val q = engine.stream.StreamQueries.queries("stream_stateful_merge")
    val base = q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(base.nonEmpty)
    spark.conf.set("spark.graft.merge.filesPerTrigger", "32")
    spark.conf.set("spark.graft.merge.statePartitions", "8")
    try {
      val alt = q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(alt == base, "merge result depends on trigger/state sizing")
    } finally {
      spark.conf.unset("spark.graft.merge.filesPerTrigger")
      spark.conf.unset("spark.graft.merge.statePartitions")
    }
  }

  test("stream-stream interval join: cross-trigger pairs join, watermark drops late") {
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def side(m: MemoryStream[(Long, Long, java.sql.Timestamp)], as: String) =
      m.toDF().toDF("event_id", "user_id", "ts")
        .withWatermark("ts", "10 minutes").alias(as)
    val joined = side(clicks, "c").join(side(purchases, "p"),
        expr("""c.user_id = p.user_id AND
                p.ts >= c.ts AND p.ts <= c.ts + interval 1 hour"""))
      .select(col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_spec")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    try {
      // click buffered in trigger 1, its purchase arrives in trigger 2:
      // the join must pair ACROSS triggers from buffered state
      clicks.addData((1L, 7L, ts(0)))
      q.processAllAvailable()
      purchases.addData((100L, 7L, ts(30)))
      q.processAllAvailable()
      // advance both watermarks past click 1's join horizon (+1h +10m)
      clicks.addData((2L, 7L, ts(300)))
      purchases.addData((101L, 7L, ts(300)))
      q.processAllAvailable()
      // in-window for click 1 but behind the watermark: state is evicted
      // and the row is dropped — NO pair may appear
      purchases.addData((102L, 7L, ts(40)))
      q.processAllAvailable()
      val pairs = spark.table("ssj_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 100L), (2L, 101L)), pairs.toString)
    } finally q.stop()
  }
}
