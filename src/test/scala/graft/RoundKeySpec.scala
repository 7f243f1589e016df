package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Ivf.roundKey` (the fused kernels' JVM-side ranking round) must be
  * BIT-IDENTICAL to Catalyst's `round(col, s)` on every double the
  * kernels can produce (non-negative finite distances, and their
  * negations for similarity keys) — the property that makes fused
  * selection, k-boundary ties included, exactly the declarative
  * oracle-anchored path's.
  */
class RoundKeySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sparkRound(vals: Seq[Double], s: Int): Seq[Double] =
    vals.toDF("d").coalesce(1).select(round(col("d"), s).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  test("roundKey == Spark round on adversarial boundary values") {
    // exact .5-at-the-6th-decimal cases, shortest-repr pitfalls, and
    // values already rounded (idempotence through the final no-op round)
    val vals = Seq(0.0, 0.1, 0.1234565, 0.1234575, 1.0000005, 123.456789,
      1e-7, 9.9999995, 0.9999999999999999, 2.675, 1234567.1234565,
      4.9e-324, 1.797e8, 0.123456, 42.0)
    for (s <- Seq(0, 2, 6)) {
      val expected = sparkRound(vals, s)
      val got = vals.map(graft.operators.Ivf.roundKey(_, s))
      assert(got === expected, s"scale $s")
    }
  }

  test("roundKey == Spark round over 5000 random magnitudes, both signs") {
    val rnd = new scala.util.Random(20260813L)
    val vals = Seq.fill(5000) {
      val m = (rnd.nextDouble() * 2 - 1) * 1e9
      m * math.pow(10.0, rnd.nextInt(13) - 9)
    }
    val expected = sparkRound(vals, 6)
    val got = vals.map(graft.operators.Ivf.roundKey(_, 6))
    assert(got === expected)
  }

  test("round of an already-rounded key is the identity (the kernels' trailing round is a no-op)") {
    val rnd = new scala.util.Random(7L)
    val once = Seq.fill(2000)(rnd.nextDouble() * 1e6)
      .map(graft.operators.Ivf.roundKey(_, 6))
    assert(once.map(graft.operators.Ivf.roundKey(_, 6)) === once)
    assert(sparkRound(once, 6) === once)
  }
}
