package graft

import org.scalatest.funsuite.AnyFunSuite

class ScalarQuantSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("quantizeInt8: codes, scale, residuals; floor(x+0.5) on negatives; zero vector; clamp") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),  // scale 1/127; -63.5 rounds UP to -63
      (2L, Seq(0.0f, 0.0f, 0.0f)),   // zero vector -> scale 0, q 0
      (3L, Seq(-2.0f, 1.0f, 0.5f))   // max |x| on the NEGATIVE side -> q -127
    ).toDF("vec_id", "embedding")
    val got = graft.ann.ScalarQuant.quantizeInt8(df, "embedding", "vec_id")
      .as[(Long, Int, Int, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = 1.0 / 127.0
    assert(got((1L, 0)) == ((127, r9(s1), 0.0)))
    // Math.round semantics: floor(-63.5 + 0.5) = -63 (SQL round's
    // half-away-from-zero would say -64 — the rule this test pins)
    assert(got((1L, 1))._1 == -63)
    assert(got((1L, 2)) == ((0, r9(s1), 0.0)))
    (0 to 2).foreach(d => assert(got((2L, d)) == ((0, 0.0, 0.0))))
    val s3 = 2.0 / 127.0
    assert(got((3L, 0)) == ((-127, r9(s3), 0.0)))
    assert(got((3L, 1))._1 == math.floor(1.0 / s3 + 0.5).toInt)
    // residual reconstructs: err == round(x - q*scale, 6) for a
    // non-trivial dimension
    val q31 = got((3L, 1))._1
    val err31 = BigDecimal(1.0 - q31 * s3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((3L, 1))._3 == err31)
    // residual magnitude bound: |err| <= scale/2 + rounding grid
    got.foreach { case ((_, _), (_, sc, err)) =>
      assert(math.abs(err) <= sc / 2 + 1e-6)
    }
  }
}
