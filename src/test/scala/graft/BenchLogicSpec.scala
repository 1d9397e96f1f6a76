package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's build re-pair decision (VERDICT r16 #1) on
  * synthetic timings — the same `Bench.rePairDecision` the hnsw/ann
  * build blocks run, so the graded machinery's truth table is
  * spec-verified independently of any live measurement:
  *
  *   pair agrees            → min, no retry, no flag
  *   pair splits, reconciles → min of three, no flag (transient)
  *   pair splits, stays split → min of three, FLAG (sustained drift)
  */
class BenchLogicSpec extends AnyFunSuite {

  private def run(s1: Double, s2: Double, s3: => Double):
      (Double, Boolean, Int, Int) = {
    var settles = 0
    var retries = 0
    val (best, flagged) = Bench.rePairDecision(
      s1, s2, 1.5, () => settles += 1, () => { retries += 1; s3 })
    (best, flagged, settles, retries)
  }

  test("agreeing pair: min wins, no retry, no settle, no flag") {
    assert(run(10.0, 12.0, fail("retry must not run")) ===
      ((10.0, false, 0, 0)))
    // exactly at the gate is still agreement (<=, not <)
    assert(run(10.0, 15.0, fail("retry must not run")) ===
      ((10.0, false, 0, 0)))
  }

  test("split pair that reconciles: transient episode, min of three, unflagged") {
    // slow-fast: the retry lands near the fast sample → the two best
    // agree → the episode was transient, min is evidence
    assert(run(18.9, 6.3, 6.5) === ((6.3, false, 1, 1)))
    // fast-slow order must behave identically
    assert(run(6.3, 18.9, 6.5) === ((6.3, false, 1, 1)))
  }

  test("split pair that stays split: sustained drift, flagged") {
    // the r16 d128 mode: builds swinging 1.7->6.3 s same-code — no two
    // of three agree within 1.5x → the row self-flags
    assert(run(18.9, 6.3, 12.0) === ((6.3, true, 1, 1)))
    // degenerate: retry slower than both
    assert(run(4.0, 9.0, 22.0) === ((4.0, true, 1, 1)))
  }

  test("retry agreeing with the SLOW sample flags too (the fast one was the outlier)") {
    // two agreeing slow samples vs one fast: best-of rule still
    // reports the fast min (the plan's cost) but the flag marks the
    // number as non-evidentiary — min/flag are decided independently
    assert(run(4.0, 18.0, 18.5) === ((4.0, true, 1, 1)))
  }
}
