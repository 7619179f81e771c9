package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[DriftCheck]]'s parsing and banding — the pure logic behind
  * BOTH committed drift gates (the bench's per-query band and the
  * probe's cross-round us_per_row band). These are regex parsers over
  * machine-written artifacts; the r17 ADVICE found the number regex
  * silently crashing on scientific notation and the failure being
  * swallowed into an empty (= "clean") drift map, so the parse rules
  * are worth their own pins, Spark-free. */
class DriftCheckSpec extends AnyFunSuite {

  private def tmpJson(body: String): String = {
    val f = java.nio.file.Files.createTempFile("driftspec", ".json")
    java.nio.file.Files.writeString(f, body)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("readQueries parses plain, scientific, and negative numbers " +
      "(the 8.3E-4 crash class, r17 ADVICE)") {
    val p = tmpJson(
      """{"metric":"total","queries":{"fast":8.3E-4,"plain":1.25,
        |"neg":-1.0,"exp":1.2e+1},"attribution":{"fast":{"t1":9.0E-4}}}"""
        .stripMargin)
    val qs = DriftCheck.readQueries(p)
    assert(qs("fast") == 8.3e-4)
    assert(qs("plain") == 1.25)
    assert(qs("neg") == -1.0)
    assert(qs("exp") == 12.0)
    // the queries-block regex must not leak into attribution
    assert(qs.size == 4)
  }

  test("check flags only >band growth past the absolute floor") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.1, "d" -> 5.0)
    val cur = Map(
      "a" -> 3.5,  // 3.5x past the 1 s floor -> flag
      "b" -> 5.0,  // 2.5x -> under band, no flag
      "c" -> 0.4,  // 4x but under the 1 s floor -> no flag
      "d" -> 1.0,  // improvement -> no flag
      "e" -> 99.0) // no previous value -> no flag
    val flags = DriftCheck.check(prev, cur)
    assert(flags.map(_._1) == Seq("a"))
    val (_, p, c, r) = flags.head
    assert(p == 1.0 && c == 3.5 && math.abs(r - 3.5) < 1e-9)
  }

  test("readProbe parses (sec, us_per_row) and never mistakes " +
      "us_per_row_prev for us_per_row") {
    val p = tmpJson(
      """{"scale": 10, "flagged": [], "ops": {
        |    "fast_op": {"sec": 0.50, "rows": 100, "us_per_row": 5000.00, "us_per_row_prev": 1.00},
        |    "slow_op": {"sec": 12.00, "rows": 4, "vs10x": 1.10, "us_per_row": 3000000.00},
        |    "norow_op": {"sec": 2.00, "rows": 0}
        |  }}""".stripMargin)
    val ops = DriftCheck.readProbe(p)
    assert(ops("fast_op") == ((0.5, 5000.0))) // prev field NOT captured
    assert(ops("slow_op") == ((12.0, 3000000.0)))
    assert(!ops.contains("norow_op")) // zero-row ops emit no us_per_row
  }

  test("checkProbe bands us_per_row growth with the absolute-sec floor") {
    val prev = Map(
      "grew" -> ((5.0, 100.0)), "tiny" -> ((0.2, 10.0)),
      "fine" -> ((5.0, 100.0)))
    val cur = Map(
      "grew" -> ((16.0, 400.0)), // 4x us/row, sec past floor -> flag
      "tiny" -> ((0.6, 40.0)),   // 4x but sub-second -> no flag
      "fine" -> ((6.0, 120.0)),  // 1.2x -> no flag
      "new" -> ((9.0, 999.0)))   // no previous -> no flag
    val flags = DriftCheck.checkProbe(prev, cur)
    assert(flags.map(_._1) == Seq("grew"))
    assert(math.abs(flags.head._4 - 4.0) < 1e-9)
  }
}
