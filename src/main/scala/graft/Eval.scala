package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE timed action shared by Bench/MiniBench/ScaleProbe/SkewProbe/
  * JobTimer (r16): evaluate EVERY output column through the built-in
  * noop sink and return the row count from an [[org.apache.spark.sql
  * .Observation]] riding the same execution.
  *
  * `.count()` — the timed action through r15 — lets Catalyst prune all
  * output columns and then eliminate whole subtrees that only feed
  * pruned columns: a distinct-keyed flag join (dedup_semantic's `kept`
  * left join) vanishes under count(), so the bench timed the cell
  * assignment but never the within-cell pair verification — caught by
  * the r16 skew probe, where the capped and uncapped hot-cell runs
  * timed identically because neither was running the pairs. count()
  * also drops the final ORDER BY. The noop sink materializes every
  * output row with all columns — the work a user collecting the result
  * pays — while writing nothing; the observed count(1) makes the row
  * count free (no second execution).
  */
object Eval {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  def rows(df: DataFrame): Long = {
    val obs = new org.apache.spark.sql.Observation(
      s"graft_eval_${seq.incrementAndGet()}")
    df.observe(obs, count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    // a query BUILDER may leave a job description set so the final
    // action above is attributed to its phase (e.g. "online:serve");
    // clear it here so the label can't leak onto the NEXT op's jobs
    df.sparkSession.sparkContext.setJobDescription(null)
    obs.get("n").asInstanceOf[Long]
  }
}
