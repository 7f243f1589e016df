package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Unit + property tests for the vector scalar functions — the
  * `PriorityQueueTest` analog plus metric-space laws (SURVEY.md §5.2).
  */
class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def dist(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a.toArray, b.toArray)).toDF("a", "b")
      .select(l2Distance(col("a"), col("b")).as("d"))
      .head().getDouble(0)

  test("l2Distance matches hand-computed values (hnsw.cc:74-83 semantics)") {
    assert(dist(Seq(0f, 0f, 0f), Seq(3f, 4f, 0f)) === 5.0)
    assert(dist(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) === 0.0)
    // the reference PriorityQueueTest fixture: probe (1,2,3) vs (2,4,6), (4,8,12)
    val d1 = dist(Seq(1f, 2f, 3f), Seq(2f, 4f, 6f))
    val d2 = dist(Seq(1f, 2f, 3f), Seq(4f, 8f, 12f))
    assert(d1 < d2, "nearest-first ordering of the PriorityQueueTest candidates")
  }

  test("metric laws on random float vectors (fixed seed)") {
    val rnd = new scala.util.Random(3) // the reference's seed, hnsw.cc:329
    def vec() = Array.fill(8)(rnd.nextFloat() * 200f - 100f)
    val rows = Seq.fill(20)((vec(), vec(), vec()))
    val out = rows.toDF("a", "b", "c")
      .select(
        l2Distance(col("a"), col("b")).as("dab"),
        l2Distance(col("b"), col("a")).as("dba"),
        l2Distance(col("a"), col("a")).as("daa"),
        l2Distance(col("a"), col("c")).as("dac"),
        l2Distance(col("c"), col("b")).as("dcb"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9, "symmetry")
      assert(r.getDouble(2) === 0.0, "identity")
      assert(r.getDouble(0) <= r.getDouble(3) + r.getDouble(4) + 1e-9, "triangle inequality")
    }
  }

  test("cosineSimilarity of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .select(round(cosineSimilarity(col("a"), col("b")), 9).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, 0.0))
  }

  test("perturbQuery applies (+1, -1, unchanged...) — hnsw.cc:352-356") {
    val out = Seq(Tuple1(Array(10f, 20f, 30f, 40f))).toDF("e")
      .select(perturbQuery(col("e")).as("q"))
      .head().getSeq[Double](0)
    assert(out === Seq(11.0, 19.0, 30.0, 40.0))
  }

  test("SQL surface: l2_distance/dot_product registered via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT l2_distance(array(0D, 0D), array(3D, 4D)) AS d, " +
        "dot_product(array(1D, 2D), array(3D, 4D)) AS p")
      .head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 11.0)
  }

  test("dimension mismatch surfaces as null, not silent truncation (SURVEY.md §1.4)") {
    val d = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
      .select(l2Distance(col("a"), col("b")).as("d"))
      .head()
    assert(d.isNullAt(0))
  }

  test("null array ELEMENT surfaces as null too — never read as 0.0") {
    // same stance as the dim-mismatch rule, for every codegen expression
    val withHole = Seq[Option[Float]](Some(1f), None, Some(3f))
    val clean = Seq[Option[Float]](Some(1f), Some(2f), Some(3f))
    val rows = Seq((withHole, clean), (clean, clean)).toDF("a", "b")
      .select(l2Distance(col("a"), col("b")).as("d"),
        dotProduct(col("a"), col("b")).as("p"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "a null element must poison the fold, not contribute 0.0")
    assert(rows(1).getDouble(0) === 0.0 && rows(1).getDouble(1) === 14.0,
      "nullable-typed but dense arrays still compute")
    // PQ encode + LUT: m=3 subspaces of 1 dim, 2 centroids each
    val books = Seq.fill(3)(Seq(Seq(0.0), Seq(10.0)))
    val pq = Seq(Tuple1(withHole), Tuple1(clean)).toDF("v")
      .select(pqEncode(col("v"), books).as("codes"), pqLut(col("v"), books).as("lut"))
      .collect()
    assert(pq(0).isNullAt(0) && pq(0).isNullAt(1),
      "pq_encode/pq_lut must yield null on a null element")
    assert(pq(1).getSeq[Int](0) === Seq(0, 0, 0))
    assert(pq(1).getSeq[Double](1).length === 6)
  }
}
