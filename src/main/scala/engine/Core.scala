package engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A declared engine query: the Spark plan plus (optionally) an ANSI-SQL
  * oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §5.2): every query ends with a total
  * ORDER BY over a unique key, all doubles in the final projection are
  * rounded to 4 dp, timestamps are projected as epoch integers or
  * dates/strings (never raw TIMESTAMP), and NULL sort keys are avoided
  * (Spark sorts NULLS FIRST, DuckDB NULLS LAST by default).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Core {
  /** Load one driver testdata table from the given scale-factor dir.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as a long and floor-divide to
    * micros — exactly DuckDB's ns→us truncation — so both engines see
    * identical timestamps.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Round a double column to 4 dp — the t2 hash-determinism discipline. */
  def r4(c: Column): Column = round(c, 4)
}
