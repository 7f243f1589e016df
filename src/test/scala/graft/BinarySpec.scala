package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.{Binary, Tombstones}

/** Binary (sign) quantization invariants: packing round-trip against a
  * per-bit reference, metric properties, batch ≡ single, the funnel
  * recovering exact results, frozen-threshold inserts and tombstones.
  */
class BinarySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val emb = (0L until 300L).map { i =>
    val rnd = new scala.util.Random(i * 17 + 3)
    (i, Array.fill(48)(rnd.nextFloat() * 10f - 5f)) // 48 dims → words of 32 + 16 bits
  }.toDF("vec_id", "embedding").cache()

  private lazy val thr = Binary.thresholds(emb)

  private def query(id: Long) = emb.filter(col("vec_id") === id)
    .select(perturbQuery(col("embedding")).as("query_vec"))

  private def layout(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"bin_$tag").toString + "/sigs"
    Binary.ensureEncoded(emb, thr, dir)
    dir
  }

  test("signature packing round-trips against a per-bit reference") {
    val sigs = emb.select(col("vec_id"), Binary.signatureCol(col("embedding"), thr).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val raw = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    raw.foreach { case (id, xs) =>
      val bits = xs.indices.map(i => xs(i).toDouble > thr(i))
      val words = bits.grouped(Binary.BitsPerWord).map(_.zipWithIndex
        .map { case (b, j) => if (b) 1L << j else 0L }.sum).toSeq
      assert(sigs(id) === words, s"vec $id: packed words disagree with per-bit reference")
    }
  }

  test("hamming is a metric on signatures: self-distance 0, symmetry") {
    val dir = layout("metric")
    // a query equal to a stored vector binarizes identically → hamming 0
    val q = emb.filter(col("vec_id") === 7)
      .select(transform(col("embedding"), x => x.cast("double")).as("query_vec"))
    val top = Binary.hammingTopK(spark, dir, q, 1).collect()(0)
    assert(top.getLong(0) === 7L && top.getInt(1) === 0)
  }

  test("batch hamming == single-query hamming, per query") {
    val dir = layout("batch")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
      .cache()
    val batch = Binary.hammingTopKBatch(spark, dir, qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toInt))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1))).toMap
    (0L until 5L).foreach { qid =>
      val single = Binary.hammingTopK(spark, dir,
          qs.filter(col("query_id") === qid).select("query_vec"), k = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(t => (t._2, t._1)).toSeq
      assert(batch(qid).toSeq === single, s"query $qid: batch != single")
    }
  }

  test("the funnel: a wide-enough hamming shortlist + exact rerank == exact top-k") {
    val dir = layout("funnel")
    val q = query(42)
    val exact = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), round(l2Distance(col("embedding"), col("query_vec")), 6).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10).collect().map(_.getLong(0)).toSeq
    val got = Binary.hammingRerankTopK(spark, dir, emb, q, k = 10, shortlist = 300)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact, "corpus-wide shortlist must recover the exact ranking")
  }

  test("frozen-threshold insert: grown table == single-pass encode") {
    val base = java.nio.file.Files.createTempDirectory("bin_ins").toString
    val grown = s"$base/grown"
    Binary.ensureEncoded(emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), thr, grown)
    Binary.insertInto(spark, grown, emb.filter(pmod(col("vec_id"), lit(5)) === 0))
    val whole = layout("ins_whole")
    val q = query(17)
    val a = Binary.hammingTopK(spark, grown, q, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val b = Binary.hammingTopK(spark, whole, q, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a === b)
  }

  test("tombstones: excluded ids reach no hamming result") {
    val dir = layout("del")
    Tombstones.record(spark, dir, emb.filter(pmod(col("vec_id"), lit(7)) === 0).select("vec_id"))
    val got = Binary.hammingTopK(spark, dir, query(3), 10,
        excluded = Tombstones.ids(spark, dir))
      .collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty && got.forall(_ % 7 != 0))
  }
}
