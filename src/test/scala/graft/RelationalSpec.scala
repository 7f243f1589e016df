package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Relational invariants that the DuckDB oracle can't cover: the
  * sort-based exact quantiles must reproduce `percentile()` bit-for-bit
  * (same p·(n-1) interpolation), and the approx sketch must stay within
  * its rank-error bound of the exact answer.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // deterministic lineitem-ish corpus: 3 flags, 6k skewed-size groups
  private lazy val li = {
    val rnd = new scala.util.Random(42)
    (1 to 6000).map { i =>
      val flag = if (i % 7 == 0) "R" else if (i % 3 == 0) "A" else "N"
      (flag, rnd.nextDouble() * 100000.0)
    }.toDF("l_returnflag", "l_extendedprice").cache()
  }

  private def collect3(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet

  test("sort-based exact quantiles == percentile() aggregate (same interpolation arithmetic)") {
    val viaBuffer = li.groupBy("l_returnflag").agg(
      round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
      round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
      round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))
    assert(collect3(Relational.priceQuantiles(li)) === collect3(viaBuffer))
  }

  test("approx quantiles stay within rank-error of exact") {
    val exact = collect3(Relational.priceQuantiles(li))
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val approx = collect3(Relational.priceQuantilesApprox(li, accuracy = 10000))
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // accuracy 10000 on ≤4.3k-row groups → rank error < 1 row; values
    // are ~uniform on [0, 100k], so adjacent ranks differ by ~25 —
    // assert a generous 1% relative envelope
    for ((flag, (e50, e90, e99)) <- exact) {
      val (a50, a90, a99) = approx(flag)
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.01, s"$flag p90: $a90 vs $e90")
      assert(math.abs(a99 - e99) / e99 < 0.01, s"$flag p99: $a99 vs $e99")
    }
  }
}
