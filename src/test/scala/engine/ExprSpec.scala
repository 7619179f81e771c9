package engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import gps.TestSpark
import gps.parse.{NmeaChecksum, NmeaFunctions}
import engine.llm.{DoubleArrayDot, TokenWindowHash}
import engine.llm.TextFunctions.{tokens, tokenHash60, shingles3}

/** Custom Catalyst expression tests (SURVEY.md §4.2): the codegen'd
  * NmeaChecksum and DoubleArrayDot against golden values and against
  * forced-interpreted evaluation. */
class ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Golden NMEA sentences (class.nmea.parser.php:145-315 examples) carry
  // their own checksums — recompute and compare to the declared suffix.
  val golden = Seq(
    "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47",
    "$GPGSA,A,3,04,05,,09,12,,,24,,,,,2.5,1.3,2.1*39",
    "$GPGSV,2,1,08,01,40,083,46,02,17,308,41,12,07,344,39,14,22,228,45*75",
    "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A",
    "$GPVTG,054.7,T,034.4,M,005.5,N,010.2,K*48")

  test("NmeaChecksum matches the golden sentences' declared checksums") {
    val df = golden.toDF("line").select(
      NmeaChecksum(NmeaFunctions.payload(col("line"))).as("computed"),
      conv(substring_index(col("line"), "*", -1), 16, 10).cast("int")
        .as("declared"))
    df.collect().foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("NmeaChecksum: interpreted eval agrees with codegen path") {
    // wholestage codegen on (default) vs off forces the two paths
    val df = golden.toDF("line")
      .select(NmeaChecksum(NmeaFunctions.payload(col("line"))).as("c"))
    val on = df.collect().map(_.getInt(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(_.getInt(0)).toSeq
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("DoubleArrayDot: golden value, order, and interpreted/codegen parity") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").select(DoubleArrayDot(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) == 32.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.head().getDouble(0) == 32.0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // strict left-to-right accumulation (not pairwise/tree): the sum of
    // [big, 1, -big] dotted with ones is order-sensitive
    val big = 1e17
    val seqSum = ((0.0 + big) + 1.0) + -big
    val df2 = Seq((Array(big, 1.0, -big), Array(1.0, 1.0, 1.0))).toDF("a", "b")
      .select(DoubleArrayDot(col("a"), col("b")).as("d"))
    assert(df2.head().getDouble(0) == seqSum)
  }

  test("DoubleArrayDot rejects non-double-array inputs at analysis") {
    val ex = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(DoubleArrayDot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("double"))
  }

  test("native HLL approx distinct stays within its rsd bound (B21)") {
    // the oracle-checked query surface uses the portable linear-counting
    // sketch; Spark's approx_count_distinct (the operator a user reaches
    // for at 100 TB) is pinned here instead — rsd 0.01 ⇒ ±5% is generous
    val df = engine.Core.t(spark, "/root/testdata/sf0.01", "events")
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .head()
    val (approx, exact) = (df.getLong(0), df.getLong(1))
    assert(exact > 0)
    assert(math.abs(approx - exact) <= math.max(1L, exact / 20),
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks the exact percentile (B19b's 100 TB path)") {
    // agg_percentile's oracle-checked surface is the exact per-group-sort
    // form; approx_percentile (the sketch a 100 TB deployment runs, no
    // global sort) is pinned against it here: with accuracy 10000 the
    // rank error is <= n/10000, so the approx p50 must land between the
    // exact p45 and p55
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val r = engine.Core.t(spark, "/root/testdata/sf0.01", "lineitem")
      .agg(
        approx_percentile(cents, lit(0.5), lit(10000)).as("ap50"),
        percentile(cents, lit(0.45)).as("p45"),
        percentile(cents, lit(0.55)).as("p55"))
      .head()
    val ap50 = r.getLong(0).toDouble
    assert(ap50 >= r.getDouble(1) && ap50 <= r.getDouble(2),
      s"approx p50 $ap50 outside exact [p45, p55] = [${r.getDouble(1)}, ${r.getDouble(2)}]")
  }

  test("native stddev_pop/corr track agg_stats' exact integer-moment form (B19c)") {
    // agg_stats' oracle-checked surface derives stddev/corr from exact
    // wide-integer moment sums; Spark's built-in stddev_pop/corr (the
    // numerically-stable merge form a user reaches for) must agree to
    // float noise on the same data
    val x = round(col("l_extendedprice") * 100, 0).cast("long")
    val y = round(col("l_discount") * 100, 0).cast("long")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val r = engine.Core.t(spark, "/root/testdata/sf0.01", "lineitem")
      .agg(
        stddev_pop(x).as("sd_native"), corr(x, y).as("corr_native"),
        count(lit(1)).as("n"),
        sum(dec(x)).as("sx"), sum(dec(x * x)).as("sxx"),
        sum(dec(y)).as("sy"), sum(dec(y * y)).as("syy"),
        sum(dec(x * y)).as("sxy"))
      .selectExpr("sd_native", "corr_native",
        "sqrt(cast(cast(n as decimal(38,0))*sxx - sx*sx as double)" +
          " / cast(n as double) / cast(n as double)) as sd_exact",
        "cast(cast(n as decimal(38,0))*sxy - sx*sy as double)" +
          " / sqrt(cast(cast(n as decimal(38,0))*sxx - sx*sx as double)" +
          " * cast(cast(n as decimal(38,0))*syy - sy*sy as double)) as corr_exact")
      .head()
    assert(math.abs(r.getDouble(0) - r.getDouble(2)) / r.getDouble(2) < 1e-9,
      s"stddev native=${r.getDouble(0)} exact=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9,
      s"corr native=${r.getDouble(1)} exact=${r.getDouble(3)}")
  }

  test("TokenWindowHash: identical to the transform+tokenHash60 formulation") {
    import org.apache.spark.sql.Column
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("w"))
    def hofSpans(w: Column): Column = {
      val wins = when(size(w) >= 15,
        transform(sequence(lit(0), size(w) - 15),
          i => concat_ws(" ", slice(w, i + 1, lit(15)))))
        .otherwise(array(concat_ws(" ", w)))
      transform(wins, x => tokenHash60(x))
    }
    def hofChunks(w: Column): Column = transform(
      transform(sequence(lit(0L),
          floor((size(w) + 9) / 10).cast("long") - 1),
        p => concat_ws(" ", slice(w, (p * 10 + 1).cast("int"), lit(10)))),
      x => tokenHash60(x))
    def hofShingles(w: Column): Column =
      transform(shingles3(w), x => tokenHash60(x))
    val rows = docs.select(col("doc_id"),
      hofSpans(col("w")).as("hs"),
      TokenWindowHash(col("w"), 15, 1, tail = false, 15).as("es"),
      hofChunks(col("w")).as("hc"),
      TokenWindowHash(col("w"), 10, 10, tail = true, 15).as("ec"),
      array_distinct(hofShingles(col("w"))).as("hg"),
      array_distinct(TokenWindowHash(col("w"), 3, 1, tail = false, 15)).as("eg"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"spans doc ${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"chunks doc ${r.getLong(0)}")
      assert(r.getSeq[Long](5) == r.getSeq[Long](6), s"shingles doc ${r.getLong(0)}")
    }
  }

  test("SimHash60: identical to the explode + 60-bit-sum aggregate form") {
    import engine.llm.SimHash60
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the pre-r7 aggregate formulation, verbatim
    val th = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .select(col("doc_id"), tokenHash60(col("term")).as("h"))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$j"))
    val agg = th.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def viaExpr(): Map[Long, Long] = docs.select(col("doc_id"),
        SimHash60(tokens(col("text"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = viaExpr()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try viaExpr()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == agg && off == agg)
    assert(on.values.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("SimHash60: zero contributing tokens yields NULL, not all-ones") {
    import engine.llm.SimHash60
    // with no votes every bit ties to 1 — two degenerate docs would pair
    // at hamming 0; the expression returns null so band joins drop them
    val df = Seq(1, 2, 3).toDF("i").select(
      SimHash60(when(col("i") === 1, array(lit("tok")))
        .when(col("i") === 2, array().cast("array<string>"))
        .otherwise(array(lit(null).cast("string")))).as("sim"))
    def run(): Seq[Option[Long]] = df.collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try run()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
    assert(on.head.nonEmpty, "real token must produce a signature")
    assert(on(1).isEmpty, "empty array must be null")
    assert(on(2).isEmpty, "all-null tokens must be null")
  }

  test("TokenWindowHash: 8-nibble variant matches the minhash posting hash") {
    // last fixture repeats its 3-gram: shingles3 is SET-valued (it
    // array_distincts), TokenWindowHash is multiset-valued, and the
    // minhash call site wraps it in array_distinct — mirror that here
    // so the set/multiset relationship is explicit, not accidental
    val df = Seq("the quick brown fox jumps over the lazy dog", "a b", "x",
        "a b c a b c a b c")
      .toDF("text").select(tokens(col("text")).as("w"))
    val rows = df.select(
      transform(shingles3(col("w")),
        x => conv(substring(md5(x), 1, 8), 16, 10).cast("long")).as("h"),
      array_distinct(TokenWindowHash(col("w"), 3, 1, tail = false, 8))
        .as("e")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("TokenWindowHash: edge cases + interpreted agrees with codegen") {
    // single token, empty string token, exactly-width doc, null array
    val df = Seq(Some("a"), Some(""), Some("t1 t2 t3"), None)
      .toDF("text")
      .select(when(col("text").isNotNull, tokens(col("text"))).as("w"))
    def run(): Seq[Seq[Long]] = df.select(
      TokenWindowHash(col("w"), 3, 1, tail = false, 15).as("e"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0)).toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try run()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
    assert(on(3) == null, "null array must yield null")
    // golden: hash("a") == tokenHash60 of the single-token doc
    val g = df.limit(1).select(transform(shingles3(col("w")),
      x => tokenHash60(x))).head().getSeq[Long](0)
    assert(on(0) == g)
  }
}
