package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared engine query (SURVEY.md §2 Table B) from the
  * operator modules into the driver's `queries`/`oracleSql` maps.
  */
object SparkEntry {

  private def all: Map[String, engine.Q] =
    engine.rel.RelQueries.queries ++
    engine.rel.FnQueries.queries ++
    engine.rel.UdafQueries.queries ++
    engine.rel.GpsQueries.queries ++
    engine.stream.StreamQueries.queries ++
    engine.llm.LlmQueries.queries ++
    engine.llm.SearchQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full NMEA pipeline: synthesize sentences → parse → assemble fixes
    * → quality-gate → per-device-hour trip summary (SURVEY.md §7.2 M0). */
  def entry(spark: SparkSession): DataFrame =
    all("nmea_fix_pipeline").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined =>
      k -> q.oracle.get.replaceAll("\\s+", " ").trim
    }

  /** The ONE canonical measured-run order, used by BOTH Bench and
    * ScaleProbe: stateful streaming + cross-run stores first on a fresh
    * heap, the rest alphabetical. Sharing the key is load-bearing — ops
    * that build session-keyed caches (the simhash pair table, the
    * shingle frame) must attribute the one-time build to the SAME op in
    * both artifacts, or probe÷bench per-op ratios compare different
    * cache states (r11: a 20× phantom growth from exactly this skew). */
  def benchOrderKey(name: String): (Int, String) =
    (if (name.startsWith("stream_") || name == "dedup_incremental" ||
       name == "pipeline_online" || name == "pipeline_online_hybrid") 0
     else 1, name)
}
