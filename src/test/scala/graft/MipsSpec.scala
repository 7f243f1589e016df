package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.{Ivf, Knn}

/** Max-inner-product search invariants: the augmented-vector reduction
  * (`aug(x) = [x, sqrt(M² − ‖x‖²)]`, `aug(q) = [q, 0]`) makes L2 NN on
  * the augmented space EQUAL max-inner-product on the raw space, and
  * the full-beam (nprobe = C) index path must reproduce the exact
  * brute-force MIPS ranking bit-for-bit.
  */
class MipsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val C = 8

  private lazy val emb = (0L until 100L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, Array.fill(16)(rnd.nextFloat() * 100f))
  }.toDF("vec_id", "embedding").cache()

  private lazy val query = emb.filter(col("vec_id") === 3L)
    .select(perturbQuery(col("embedding")).as("query_vec"))

  test("augmented: extra coordinate is sqrt(M^2 - |x|^2), clamped, never NaN") {
    val aug = Ivf.augmented(emb).cache()
    val rows = aug.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(rows.forall(_._2.length === 17), "one appended coordinate")
    assert(rows.forall(!_._2.exists(_.isNaN)), "clamp must prevent NaN on the max-norm row")
    // the augmented norm is M for every row (that is the point of the
    // reduction): ‖aug(x)‖² = ‖x‖² + (M²−‖x‖²) = M²
    val norms = rows.map(_._2.map(x => x * x).sum)
    val m2 = norms.max
    assert(norms.forall(n => math.abs(n - m2) / m2 < 1e-9),
      "all augmented vectors must lie on the radius-M sphere")
    // at least one row (the max-norm one) has extra == exactly 0
    assert(rows.exists(_._2.last == 0.0))
  }

  test("augmented-space L2 ordering == raw inner-product ordering (the reduction identity)") {
    val aug = Ivf.augmented(emb)
    val qa = Ivf.augmentedQuery(query)
    val byAugL2 = aug.crossJoin(broadcast(qa))
      .select(col("vec_id"), l2DistanceSq(col("embedding"), col("query_vec")).as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    val byIp = emb.crossJoin(broadcast(query))
      .select(col("vec_id"), dotProduct(col("embedding"), col("query_vec")).as("ip"))
      .orderBy(col("ip").desc, col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(byAugL2 === byIp,
      "ascending augmented L2 must be exactly descending inner product")
  }

  test("full-beam (nprobe = C) indexed MIPS == exact brute-force MIPS, scores included") {
    val dir = java.nio.file.Files.createTempDirectory("mips_full").toString
    Ivf.ensurePartitionedMips(emb, C, s"$dir/idx")
    val got = Ivf.mipsTopKPartitioned(spark, s"$dir/idx", query, k = 10, nprobe = C)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Knn.mipsTopK(emb.crossJoin(broadcast(query)), col("query_vec"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact, "full-beam index MIPS must reproduce the exact ranking and scores")
  }

  test("batch MIPS at full beam == exact per query; scores are true inner products") {
    val dir = java.nio.file.Files.createTempDirectory("mips_batch").toString
    Ivf.ensurePartitionedMips(emb, C, s"$dir/idx")
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    val got = Ivf.mipsTopKPartitionedBatch(spark, s"$dir/idx", qs, k = 10, nprobe = C)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = (0L until 8L).flatMap { qid =>
      val q = emb.filter(col("vec_id") === qid)
        .select(perturbQuery(col("embedding")).as("query_vec"))
      Knn.mipsTopK(emb.crossJoin(broadcast(q)), col("query_vec"), 10)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(got === exact)
  }

  test("partial probe returns a subset of candidates ranked identically to exact on overlap") {
    val dir = java.nio.file.Files.createTempDirectory("mips_part").toString
    Ivf.ensurePartitionedMips(emb, C, s"$dir/idx")
    val got = Ivf.mipsTopKPartitioned(spark, s"$dir/idx", query, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 10)
    // scores must be TRUE inner products (no augmented-space artifacts)
    val ips = emb.crossJoin(broadcast(query))
      .select(col("vec_id"), round(dotProduct(col("embedding"), col("query_vec")), 6).as("ip"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.foreach { case (id, ip) => assert(ips(id) === ip, s"vec $id score mismatch") }
  }

  test("mipsRangeSearch == brute-force dot filter; norm-varied clusters prune") {
    // two spatial blobs with very different norms: a small-norm blob
    // near the origin and a large-norm blob far out — the dot floor
    // can only be cleared by the far blob, and the augmented-space
    // bound (using per-cell max norm²) must prune the near blob's
    // cells. Norms vary, so MIPS ≠ cosine here.
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 120L).map { i =>
      val scale = if (i % 2 == 0) 1f else 100f
      (i, Array.fill(8)(scale + rnd.nextFloat()))
    }.toDF("vec_id", "embedding").cache()
    val dir = java.nio.file.Files.createTempDirectory("mips_range").toString
    Ivf.ensurePartitionedMips(vecs, C, dir)
    val q = vecs.filter(col("vec_id") === 1L)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val minDot = 70000.0 // far-blob pair dots ~ 8·100.5² ≈ 80k; near-blob pairs ~ 1.2k

    val got = Ivf.mipsRangeSearch(spark, dir, q, minDot)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = vecs.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotProduct(col("embedding"), col("query_vec")), 6).as("ip"))
      .filter(col("ip") >= minDot)
      .orderBy(col("ip").desc, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected, "pruned MIPS range must equal brute force")
    assert(got.nonEmpty && got.forall(_._1 % 2 == 1),
      "only the large-norm blob can clear the floor")

    // pruning evidence: re-derive the eligible set the way
    // mipsRangeSearch does and confirm some cell was skipped
    val qa = Ivf.augmentedQuery(q)
    val cents = spark.read.parquet(s"$dir/_centroids")
    val radii = spark.read.parquet(s"$dir/_radii")
    val lb = l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
    val rsq = dotProduct(col("query_vec"), col("query_vec")) + col("normsq") -
      lit(2.0 * minDot) + lit(1e-6)
    val eligible = cents.join(radii, col("centroid_id") === col("cell"))
      .crossJoin(broadcast(qa))
      .filter(lb <= lit(0.0) || lb * lb <= rsq)
      .count()
    assert(eligible < cents.count(),
      s"norm-varied fixture must prune: $eligible of ${cents.count()} cells eligible")
  }
}
