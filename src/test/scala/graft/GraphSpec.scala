package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank invariants: mass conservation on dangling-free graphs,
  * structural ranking (hubs beat leaves), partition-count determinism
  * (the decimal-sum contract), and the degree relation.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cycle: uniform mass is a fixed point and total mass stays 1") {
    val n = 10
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pr.length === n)
    pr.foreach { case (_, p) => assert(math.abs(p - 1.0 / n) < 1e-9) }
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-6)
  }

  test("star: the hub out-ranks every leaf, and dangling hub mass is dropped") {
    // leaves 1..9 each point at hub 0; hub has no out-edges (dangling)
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val hub = pr(0L)
    (1L to 9L).foreach(i => assert(hub > pr(i), s"hub must out-rank leaf $i"))
    // dangling convention: total mass < 1 (the hub's mass re-enters nowhere)
    assert(pr.values.sum < 1.0)
  }

  test("partition count does not change a single rounded rank (decimal sums)") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 3000).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .toDF("src", "dst").cache()
    val a = Graph.pageRank(edges.repartition(1), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Graph.pageRank(edges.repartition(32), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a === b, "ranks must be identical at any partitioning")
  }

  test("degrees: out/in counts match direct aggregation, absent side is 0") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = Graph.degrees(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d === Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }
}
