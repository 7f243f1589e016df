package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Pq

/** Product-quantization invariants: code shape, determinism, and the
  * ADC decomposition identity (‖q − recon(v)‖² = Σ_s ‖q_s − cb_s‖²).
  */
class PqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val SubDim = 4 // dim 16 fixture → 4 subspaces of 4
  private val C = 8

  private lazy val emb = (0L until 100L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, Array.fill(16)(rnd.nextFloat() * 100f))
  }.toDF("vec_id", "embedding").cache()

  private lazy val books = Pq.codebooks(emb, M, SubDim, C, iters = 1).cache()

  test("encode: exactly one code per (vector, subspace), codes within [0, C)") {
    val enc = Pq.encode(emb, books, M, SubDim).cache()
    assert(enc.count() === 100L * M)
    assert(enc.groupBy("vec_id", "subspace").count().filter(col("count") > 1).count() === 0)
    val range = enc.agg(min("code"), max("code")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < C)
  }

  test("codebooks and codes are deterministic across runs") {
    val again = Pq.codebooks(emb, M, SubDim, C, iters = 1)
    assert(books.collect().map(_.toSeq).toSet === again.collect().map(_.toSeq).toSet)
    val c1 = Pq.codesAsString(Pq.codesArray(emb, books, M, SubDim)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val c2 = Pq.codesAsString(Pq.codesArray(emb, books, M, SubDim)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(c1 === c2)
  }

  test("codesArray agrees with the exploded encode and is a pure map-side plan") {
    val fromArr = Pq.codesAsString(Pq.codesArray(emb, books, M, SubDim)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val fromEnc = Pq.encode(emb, books, M, SubDim)
      .groupBy("vec_id")
      .agg(concat_ws("_",
        transform(array_sort(collect_list(struct(col("subspace"), col("code")))),
          x => x.getField("code").cast("string"))).as("codes"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fromArr === fromEnc)
    // the encode itself must be shuffle-free: literal-codebook argmin
    // projection, no join/window/Exchange anywhere in the plan
    val plan = Pq.codesArray(emb, books, M, SubDim).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan must have no Exchange:\n$plan")
  }

  test("ADC distance equals direct distance to the quantized reconstruction") {
    val q = emb.filter(col("vec_id") === 7)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val adc = Pq.adcTopK(emb, books, q, M, SubDim, k = 100).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val direct = Pq.reconstruct(emb, books, M, SubDim)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), l2Distance(col("recon"), col("query_vec")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(adc.size === 100)
    adc.foreach { case (id, d) =>
      assert(math.abs(d - direct(id)) < 1e-5,
        s"ADC distance for $id ($d) != direct reconstruction distance (${direct(id)})")
    }
  }

  test("codebooksCached rejects a memo key that does not identify the scanned table") {
    val dir = java.nio.file.Files.createTempDirectory("pq_memo").toString
    emb.write.parquet(s"$dir/emb.parquet")
    val onDisk = spark.read.parquet(s"$dir/emb.parquet")
    // the scanned path as key: accepted, memoized
    assert(Pq.codebooksCached(onDisk, M, SubDim, C, 1, s"$dir/emb.parquet").count()
      === M.toLong * C)
    // a key naming a different table: must fail loudly, never silently
    // serve codebooks trained on other data
    val e = intercept[IllegalArgumentException] {
      Pq.codebooksCached(onDisk, M, SubDim, C, 1, "/some/other/table")
    }
    assert(e.getMessage.contains("does not identify"))
  }

  test("ADC ranks the quantized space correctly: self-query's own cell wins at c = N") {
    // with one centroid per vector (c = N on a tiny set), quantization
    // is lossless and ADC == exact kNN
    val tiny = emb.filter(col("vec_id") < 8).cache()
    val losslessBooks = Pq.codebooks(tiny, M, SubDim, c = 8, iters = 0)
    val q = tiny.filter(col("vec_id") === 3)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val adc = Pq.adcTopK(tiny, losslessBooks, q, M, SubDim, k = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = tiny.crossJoin(broadcast(q))
      .select(col("vec_id"), round(l2Distance(col("embedding"), col("query_vec")), 6).as("d"))
      .orderBy(col("d"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(adc.map(_._1) === exact.map(_._1), "lossless quantization must reproduce exact ranking")
  }
}
