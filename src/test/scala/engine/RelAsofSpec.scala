package engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import gps.TestSpark

/** As-of join directionality pins (SURVEY.md §2 B16/B16b): each side of
  * the pair recomputed brutally from the raw events so the union+window
  * formulation can never silently flip an inequality or a tie rule. */
class RelAsofSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("join_asof_forward matches the brute first-purchase-at-or-after " +
      "recompute") {
    val ev = Core.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    val clicks = ev.filter(_._3 == "click")
    val got = graft.SparkEntry.queries("join_asof_forward")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got.nonEmpty)
    val expect = clicks.flatMap { case (cid, u, _, cts) =>
      val cand = purchases.filter(p => p._2 == u && p._4 >= cts)
      if (cand.isEmpty) None
      else {
        // earliest at-or-after; ties at the same instant to the min id
        val best = cand.minBy(p => (p._4, p._1))
        Some((cid, u, best._1))
      }
    }.toSet
    assert(got == expect)
  }
}
