package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.{Binary, Cascade, Sq, Tombstones}

/** Three-tier funnel invariants: a wide-open cascade reproduces exact
  * search; narrowing gates only ever shrink the candidate set; a
  * takedown at the widest gate reaches neither later stage.
  */
class CascadeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val emb = (0L until 250L).map { i =>
    val rnd = new scala.util.Random(i * 13 + 1)
    (i, Array.fill(32)(rnd.nextFloat() * 20f - 10f))
  }.toDF("vec_id", "embedding").cache()

  private lazy val dirs: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("cascade").toString
    Binary.ensureEncoded(emb, Binary.thresholds(emb), s"$base/bin")
    val (lo, hi) = Sq.bounds(emb)
    Sq.ensureEncoded(emb, lo, hi, s"$base/sq")
    (s"$base/bin", s"$base/sq")
  }

  private def query(id: Long) = emb.filter(col("vec_id") === id)
    .select(perturbQuery(col("embedding")).as("query_vec"))

  test("wide-open funnel (l1 = l2 = corpus) == exact top-k") {
    val (bin, sq) = dirs
    val q = query(42)
    val got = Cascade.topK(spark, bin, sq, emb, q, k = 10, l1 = 250, l2 = 250)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), round(l2Distance(col("embedding"), col("query_vec")), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
  }

  test("narrowed funnel results are a subset of the widest gate's survivors") {
    val (bin, sq) = dirs
    val q = query(7)
    val l1Set = Binary.hammingTopK(spark, bin, q, 60)
      .collect().map(_.getLong(0)).toSet
    val funnel = Cascade.topK(spark, bin, sq, emb, q, k = 10, l1 = 60, l2 = 25)
      .collect().map(_.getLong(0)).toSeq
    assert(funnel.toSet.subsetOf(l1Set))
    assert(funnel.length === 10)
  }

  test("tombstones drop at the widest gate and reach no stage") {
    val (bin, sq) = dirs
    Tombstones.record(spark, bin, emb.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id"))
    val q = query(7)
    val got = Cascade.topK(spark, bin, sq, emb, q, k = 10, l1 = 60, l2 = 25,
        excluded = Tombstones.ids(spark, bin))
      .collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty && got.forall(_ % 3 != 0))
  }

  test("declarative flat funnel == layout-served funnel (one logical plan, no collects)") {
    val (bin, sq) = dirs
    val q = query(42)
    val flat = Cascade.topKFlat(emb, q, k = 10, l1 = 60, l2 = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = Cascade.topK(spark, bin, sq, emb, q, k = 10, l1 = 60, l2 = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(flat === served,
      "in-plan encode funnel must match the persisted-layout funnel stage for stage")
  }

  test("batch funnel == single-query funnel, per query") {
    val (bin, sq) = dirs
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
      .cache()
    val batch = Cascade.topKBatch(spark, bin, sq, emb, qs, k = 10, l1 = 60, l2 = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1))).toMap
    (0L until 5L).foreach { qid =>
      val single = Cascade.topK(spark, bin, sq, emb,
          qs.filter(col("query_id") === qid).select("query_vec"),
          k = 10, l1 = 60, l2 = 25)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(t => (t._2, t._1)).toSeq
      assert(batch(qid).toSeq === single, s"query $qid: batch != single")
    }
  }

  test("single-query funnel is one logical plan: semi-join gates, no id In-literals") {
    val (bin, sq) = dirs
    val df = Cascade.topK(spark, bin, sq, emb, query(42), k = 10, l1 = 60, l2 = 25)
    val opt = df.queryExecution.optimizedPlan.toString
    // the former shape collected each stage and re-injected ids as an
    // O(l1) isin literal list — both gates must now be semi-joins
    assert(!opt.contains("vec_id#") || !"""vec_id#\d+ IN \(""".r.findFirstIn(opt).isDefined,
      s"stage gate regressed to an In-literal of ids:\n$opt")
    val semis = "LeftSemi".r.findAllIn(opt).length
    assert(semis >= 2, s"expected both stage gates as semi-joins, found $semis:\n$opt")
  }

  test("flat funnel rejects a multi-row queries frame (batch form covers Q > 1)") {
    val qs2 = emb.filter(col("vec_id") < 2)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val e = intercept[IllegalArgumentException] {
      Cascade.topKFlat(emb, qs2, k = 5, l1 = 20, l2 = 10)
    }
    assert(e.getMessage.contains("exactly one query row"))
  }

  test("funnel shape is validated") {
    val (bin, sq) = dirs
    val e = intercept[IllegalArgumentException] {
      Cascade.topK(spark, bin, sq, emb, query(1), k = 10, l1 = 20, l2 = 50)
    }
    assert(e.getMessage.contains("narrow"))
  }
}
