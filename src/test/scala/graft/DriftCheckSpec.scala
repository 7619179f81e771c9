package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the drift gate's band arithmetic and the isolated-triple
  * adjudication protocol (r20 verdict item 3): a synthetic forced
  * drift must flag, and the triple's median — not a single lucky or
  * unlucky re-run — must decide whether the flag clears in-band. */
class DriftCheckSpec extends AnyFunSuite {

  test("check flags only past-band growth above the jitter floor") {
    val prev = Map("a" -> 0.5, "b" -> 0.5, "c" -> 0.2, "d" -> 2.0)
    val cur = Map(
      "a" -> 1.9, // 3.8x, > 1 s         -> flagged
      "b" -> 1.4, // 2.8x, inside band    -> not flagged
      "c" -> 0.8, // 4.0x but under floor -> not flagged
      "d" -> 1.9, // faster               -> not flagged
      "e" -> 9.9) // no previous number   -> not flagged
    val flags = DriftCheck.check(prev, cur)
    assert(flags.map(_._1) == Seq("a"))
    val (_, p, c, r) = flags.head
    assert(p == 0.5 && c == 1.9 && math.abs(r - 3.8) < 1e-9)
  }

  test("adjudicate clears when the triple's median is back inside the " +
      "band, sustains when it reproduces") {
    // the r20 retention_cohorts shape: prev 0.5, flagged at ~3.9x, the
    // lesson-9 isolated triple comes back 2.9/1.5/0.85 — median 1.5 =
    // 3.0x = AT the band, cleared (environmental)
    val (m1, c1) = DriftCheck.adjudicate(0.5, Seq(2.9, 1.5, 0.85))
    assert(m1 == 1.5 && c1, "median at the band must clear")
    // a real regression reproduces in isolation: median stays past band
    val (m2, c2) = DriftCheck.adjudicate(0.5, Seq(1.9, 2.1, 2.0))
    assert(m2 == 2.0 && !c2, "median past band must sustain the flag")
    // one lucky fast run must NOT clear a reproducing regression
    val (m3, c3) = DriftCheck.adjudicate(0.5, Seq(0.4, 2.0, 2.2))
    assert(m3 == 2.0 && !c3)
    // one loaded run must NOT sustain an environmental flag
    val (m4, c4) = DriftCheck.adjudicate(0.5, Seq(0.6, 4.0, 0.7))
    assert(m4 == 0.7 && c4)
    // under the absolute jitter floor, always cleared (the gate's own
    // "can't meaningfully drift" rule)
    val (m5, c5) = DriftCheck.adjudicate(0.1, Seq(0.9, 0.95, 0.9))
    assert(m5 == 0.9 && c5)
    // crashed re-runs (-1) are excluded; all-crashed never clears
    val (m6, c6) = DriftCheck.adjudicate(0.5, Seq(-1.0, 0.8, -1.0))
    assert(m6 == 0.8 && c6)
    val (m7, c7) = DriftCheck.adjudicate(0.5, Seq(-1.0, -1.0, -1.0))
    assert(m7 == -1.0 && !c7)
  }
}
