package engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-drift tripwire (r10 lesson: the driver silently regenerated
  * `events.parquet` with `ts` TIMESTAMP(NANOS) → TIMESTAMP_NTZ and 31
  * queries died at analysis time in the round gate, not locally).
  *
  * These tests load every table through [[Core.t]] — the only loader the
  * engine uses — at sf0.001 and pin the RESOLVED schema the query layer
  * depends on. If the driver changes a physical type again, this fails
  * in `sbt test` with a one-line actual-vs-expected schema diff instead
  * of 31 opaque oracle failures a round later.
  */
class TestdataDriftSpec extends AnyFunSuite {
  lazy val spark = gps.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** Resolved (post-loader) schema each query builder assumes. `ts` is
    * session-TZ TIMESTAMP because Core.t normalizes whatever physical
    * type the file has; everything else passes through the parquet
    * footer type. */
  val expected = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int"
  )

  def render(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  for ((name, want) <- expected.toSeq.sortBy(_._1))
    test(s"$name resolves to the pinned schema through Core.t") {
      val got = render(Core.t(spark, sf, name))
      assert(got == want,
        s"\nTESTDATA DRIFT in $name:\n  expected $want\n  actual   $got")
    }

  test("events timestamps: loader instants equal the file's naive " +
    "datetimes under UTC (the DuckDB oracle semantic)") {
    // DuckDB reads timestamp[us] as a naive datetime and all oracle
    // comparisons project epoch integers / strings under UTC. Pin that
    // Core.t's session-TZ timestamps render to the SAME naive strings
    // the raw NTZ column holds — if they ever diverge (TZ regression,
    // double rescale), every events hash goes red.
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        date_format(col("ts").cast("string"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("naive"))
    val loaded = Core.t(spark, sf, "events")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("rendered"))
    val diff = loaded.join(raw, "event_id")
      .where(col("rendered") =!= col("naive"))
    assert(diff.count() == 0, {
      val ex = diff.limit(3).collect().mkString("; ")
      s"loader timestamps diverge from the file's naive datetimes: $ex"
    })
  }

  test("legacy TIMESTAMP(NANOS) events take the retry branch and rescale") {
    // a REAL nanos-typed parquet (pyarrow-written fixture — Spark cannot
    // produce one): the plain read throws ILLEGAL_PARQUET_TYPE, Core.t
    // must retry under nanosAsLong and floor-divide to micros. Guards
    // the branch the r9→r10 testdata flip would re-enter if the driver
    // ever reverts to nanos.
    val dir = getClass.getResource("/nanos_events").getPath
    val got = Core.t(spark, dir, "events")
      .orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1700000000123456L, 1700000000123456L))
    // the retry must not leak nanosAsLong session-wide (r11 advisor): a
    // LATER nanos-typed parquet read outside the loader still fails
    // loudly instead of silently surfacing raw longs
    // getOption surfaces the registered DEFAULT ("false") — the leak
    // check is that the retry left the resolved value non-true
    assert(!spark.conf
        .getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "legacy retry leaked nanosAsLong into the session")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(s"$dir/events.parquet").collect()
    }
    assert(e.getCondition != null &&
      e.getCondition.contains("PARQUET_TYPE_ILLEGAL"))
  }

  test("legacy nanos-as-long events still rescale to micros") {
    // The pre-r10 testdata surfaced ts as a nanos long (via nanosAsLong);
    // Core.t must keep floor-dividing that shape to micros. Synthesize a
    // long-typed events file and check both the branch and the values.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift_nanos").toString
    val nanos = 1700000000123456789L // ...456789 ns -> ...456 us truncation
    Seq((1L, nanos), (2L, nanos + 210L)) // +210 ns: same micro after div
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Core.t(spark, dir, "events")
      .orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(got.toSeq == Seq(nanos / 1000, nanos / 1000))
  }
}
