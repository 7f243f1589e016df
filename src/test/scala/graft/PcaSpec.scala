package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA invariants: the eigensolver (orthonormality, determinism, real
  * eigen-pairs of the exact covariance), projection/reconstruction
  * (monotone MSE, exactness at k = d, distance preservation under the
  * full rotation), the approx-covariance scale twin's error bound, and
  * variance capture on a structured fixture.
  */
class PcaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val D = 12

  // structured fixture: 3 latent directions carry ~100× the variance
  // of the ambient noise — the geometry PCA exists for
  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    val basis = Array.fill(3)(Array.fill(D)(rnd.nextGaussian()))
    (0L until 400L).map { i =>
      val coef = Array.fill(3)(rnd.nextGaussian() * 10)
      val x = Array.tabulate(D)(d =>
        (0 until 3).map(b => coef(b) * basis(b)(d)).sum + rnd.nextGaussian() * 0.1)
      (i, x.map(_.toFloat))
    }.toDF("vec_id", "embedding").cache()
  }

  private lazy val mu = Pca.means(emb)

  private lazy val cov: Array[Array[Double]] = {
    val m = Array.ofDim[Double](D, D)
    Pca.covariance(emb, roundTo = 12).collect()
      .foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    m
  }

  test("covariance is symmetric with non-negative diagonal") {
    for (i <- 0 until D; j <- 0 until D)
      assert(math.abs(cov(i)(j) - cov(j)(i)) < 1e-9, s"cov($i,$j) asymmetric")
    for (i <- 0 until D) assert(cov(i)(i) >= 0)
  }

  test("covariance plan: pair expansion is generator-chained, never a self-join") {
    val p = Pca.covariance(emb).queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the d² pair expansion must not shuffle-join the exploded relation to itself:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the d-row mean relation must join broadcast:\n$p")
  }

  test("principal components are orthonormal eigenvectors, descending eigenvalues, deterministic") {
    val (comps, evs) = Pca.principalComponents(cov, D)
    for (a <- 0 until D; b <- 0 until D) {
      val dot = (0 until D).map(i => comps(a)(i) * comps(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$a, v$b> = $dot")
    }
    assert(evs === evs.sortBy(-_), "eigenvalues must come descending")
    // eigen-pair property: Cov·v ≈ λ·v
    for (c <- 0 until D; i <- 0 until D) {
      val av = (0 until D).map(j => cov(i)(j) * comps(c)(j)).sum
      assert(math.abs(av - evs(c) * comps(c)(i)) < 1e-6,
        s"component $c is not an eigenvector at row $i")
    }
    val (again, _) = Pca.principalComponents(cov, D)
    assert(comps === again, "fixed-sweep Jacobi must be bit-reproducible")
  }

  test("3 latent directions: top-3 components capture >99% of variance") {
    val (_, evs) = Pca.principalComponents(cov, D)
    val total = evs.sum
    assert(evs.take(3).sum / total > 0.99,
      s"explained(3) = ${evs.take(3).sum / total}")
  }

  private def mse(k: Int): Double = {
    val (comps, _) = Pca.principalComponents(cov, k)
    val recon = Pca.reconstruct(Pca.project(emb, mu, comps), mu, comps)
    emb.join(recon, Seq("vec_id"))
      .select(aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")), col("recon"),
          (x, r) => (x - r) * (x - r)),
        lit(0.0), (acc, t) => acc + t).as("e"))
      .agg(avg("e")).head().getDouble(0)
  }

  test("reconstruction MSE falls monotonically with k and vanishes at k = d") {
    val errs = Seq(1, 3, 6, D).map(mse)
    assert(errs.zip(errs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"MSE must be monotone non-increasing in k: $errs")
    assert(errs.last < 1e-9, s"k = d reconstruction must be exact, got ${errs.last}")
    assert(errs(1) < errs.head, "adding latent directions must strictly help here")
  }

  test("full-rotation projection preserves pairwise distances") {
    val (comps, _) = Pca.principalComponents(cov, D)
    val proj = Pca.project(emb, mu, comps)
    val a = emb.filter(col("vec_id") === 3).select(col("embedding")).head().getSeq[Float](0)
    val b = emb.filter(col("vec_id") === 77).select(col("embedding")).head().getSeq[Float](0)
    val pa = proj.filter(col("vec_id") === 3).head().getSeq[Double](1)
    val pb = proj.filter(col("vec_id") === 77).head().getSeq[Double](1)
    val dRaw = math.sqrt((0 until D).map(i => math.pow(a(i) - b(i), 2)).sum)
    val dProj = math.sqrt((0 until D).map(i => math.pow(pa(i) - pb(i), 2)).sum)
    assert(math.abs(dRaw - dProj) < 1e-4,
      s"orthogonal projection must preserve distances: $dRaw vs $dProj")
  }

  test("PCA-reduced search funnel: shortlist in k=4 projected space + full-space rerank == exact top-k") {
    // the dim-reduction serving story: search in the projected space
    // (4/12 of the arithmetic and storage), recover exactness by
    // re-ranking the shortlist with full-dimension distances — sound
    // here because the dropped components carry <1% of the variance
    val (comps, _) = Pca.principalComponents(cov, 4)
    val proj = Pca.project(emb, mu, comps).cache()
    val qRaw = emb.filter(col("vec_id") === 42)
      .select(graft.functions.VectorFunctions.perturbQuery(col("embedding")).as("query_vec"))
    val qProj = Pca.project(
        qRaw.select(lit(999999L).as("vec_id"), col("query_vec").as("embedding")),
        mu, comps)
      .select(col("proj").as("query_vec"))
    val shortlist = proj.crossJoin(broadcast(qProj))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2Distance(col("proj"), col("query_vec")).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(50)
      .select("vec_id").collect().map(_.getLong(0))
    val reranked = emb.filter(col("vec_id").isin(shortlist.map(Long.box): _*))
      .crossJoin(broadcast(qRaw))
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.l2Distance(col("embedding"), col("query_vec")), 6).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val exact = emb.crossJoin(broadcast(qRaw))
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.l2Distance(col("embedding"), col("query_vec")), 6).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(reranked === exact,
      "a 50-candidate shortlist in the 4-dim projected space must recover the exact top-10")
  }

  test("mapPartitions covariance (scale twin) matches the exact form within float tolerance") {
    val approx = Pca.covarianceApprox(emb)
    var worst = 0.0
    for (i <- 0 until D; j <- 0 until D)
      worst = math.max(worst, math.abs(approx(i)(j) - cov(i)(j)))
    assert(worst < 1e-6, s"max |approx − exact| = $worst")
  }
}
