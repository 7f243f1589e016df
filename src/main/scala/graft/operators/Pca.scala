package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** PCA over the embedding table — the dimensionality-reduction stage a
  * training-data pipeline runs before storing/indexing embeddings
  * (project d → k, keep the variance that matters, shrink every
  * downstream ANN/dedup cost by d/k). No counterpart in the reference.
  *
  * Split exactly like the engine's other exact/scale twins:
  *
  *  - [[covariance]] is the ORACLE-EXACT moment pass: the pair-exploded
  *    relation groups by (i, j) with DECIMAL(38,12) sums — partition-
  *    order invariant, so the full covariance matrix hash-checks
  *    against DuckDB. Cost is n·d² exploded rows: fine for d ≤ a few
  *    hundred, and the declared anchor at any d.
  *  - [[covarianceApprox]] is the SCALE path: one `mapPartitions` pass
  *    accumulating per-partition outer products (d² doubles of state
  *    per task, the vector table never shuffled — the form that
  *    survives d = 1024 at 100 TB), merged by a tiny reduce. Double
  *    accumulation is partition-order dependent, so it is spec-BOUNDED
  *    against the exact form, not oracled (the approx-twin contract).
  *
  * The eigen-decomposition runs DRIVER-side on the d×d matrix (d²
  * doubles — the legitimately tiny side, like centroids/codebooks):
  * deterministic cyclic Jacobi with a fixed sweep count, eigenvalue
  * ties broken by index, every eigenvector sign-normalized (first
  * component of magnitude > 1e-12 made positive) — bit-reproducible
  * across runs. Projection is k codegen dot products per row.
  */
object Pca {

  /** Exact mean vector (DECIMAL-exact per-dim sums ÷ n, the Lloyd-mean
    * arithmetic).
    */
  def means(embeddings: DataFrame): Seq[Double] =
    embeddings
      .select(posexplode(transform(col("embedding"), x => x.cast("double")))
        .as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(col("x").cast("decimal(38,12)")).cast("double")
        / count(lit(1))).as("m"))
      .orderBy("i")
      .collect().map(_.getDouble(1)).toSeq

  /** Exact covariance relation `(i, j, cov)` for all d² ordered pairs:
    * `cov = E[x_i·x_j] − μ_i·μ_j`, products summed through
    * DECIMAL(38,12), means the DECIMAL-exact form above — every value
    * deterministic and DuckDB-reproducible. The declared oracle
    * anchor; [[covarianceApprox]] is the scale twin.
    */
  def covariance(embeddings: DataFrame, roundTo: Int = 6): DataFrame = {
    // Two chained generators expand each row to its d² (i, j) pairs
    // with NO self-join: the original form joined the n·d exploded
    // relation to itself on vec_id (a full shuffle join just to pair a
    // row with itself). The decimal sums run over the identical value
    // multisets in either shape, and E[x_i] over the (i, j) group IS
    // the per-dim mean, so the d-row mean relation (same DECIMAL
    // arithmetic as [[means]]) substitutes for the per-pair exi/exj
    // sums — bit-identical output, one generator pipeline + a tiny
    // (i, j)-keyed partial agg instead of a 3-sum agg fed by a join.
    // PRE-EXPLODE SPREAD: the pair generator fans each input row out
    // d(d+1)/2× (~2080× at d=64) — partition by generated volume, not
    // scan bytes (Skew.spreadToCores); decimal sums are order-
    // invariant, so the result is bit-identical at any partition count.
    val spread = graft.functions.Skew.spreadToCores(embeddings)
    val exploded = spread
      .select(col("embedding"),
        posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("i", "x")))
    // SYMMETRY: generate only the upper triangle (j ≥ i) — the second
    // generator expands the SLICE from index i on, halving both the
    // generated rows and the DECIMAL aggregation (n·d(d+1)/2 instead of
    // n·d²); the lower triangle is mirrored from the same aggregated
    // values afterwards, so the output is bit-identical (x·y = y·x and
    // the (i, j) group's value multiset equals (j, i)'s).
    val pairs = exploded
      .select(col("i"), col("x"),
        posexplode(transform(
          slice(col("embedding"), col("i") + 1, size(col("embedding")) - col("i")),
          y => y.cast("double"))).as(Seq("jo", "y")))
      .select(col("i"), col("x"), (col("i") + col("jo")).as("j"), col("y"))
    val tri = pairs.groupBy("i", "j")
      .agg((sum((col("x") * col("y")).cast("decimal(38,12)")).cast("double")
        / count(lit(1))).as("exy"))
    val exy = tri.union(
      tri.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("exy")))
    val mu = embeddings
      .select(posexplode(transform(col("embedding"), x => x.cast("double")))
        .as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(col("x").cast("decimal(38,12)")).cast("double")
        / count(lit(1))).as("m"))
    exy
      .join(broadcast(mu.select(col("i"), col("m").as("exi"))), Seq("i"))
      .join(broadcast(mu.select(col("i").as("j"), col("m").as("exj"))), Seq("j"))
      .select(col("i"), col("j"),
        round(col("exy") - col("exi") * col("exj"), roundTo).as("cov"))
  }

  /** Scale-path covariance: per-partition outer-product accumulation
    * (d² doubles of state per task), merged on the driver — ONE narrow
    * pass, no shuffle of the vector table, no n·d² explosion. Double
    * sums are partition-order dependent: spec-bounded against
    * [[covariance]], not oracled.
    */
  def covarianceApprox(embeddings: DataFrame): Array[Array[Double]] = {
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    val (sums, prods, n) = embeddings.select(col("embedding"))
      .rdd.mapPartitions { rows =>
        val s = new Array[Double](d)
        val p = Array.ofDim[Double](d, d)
        var cnt = 0L
        rows.foreach { r =>
          val v = r.getSeq[Float](0)
          var i = 0
          while (i < d) {
            val xi = v(i).toDouble
            s(i) += xi
            var j = 0
            while (j < d) { p(i)(j) += xi * v(j).toDouble; j += 1 }
            i += 1
          }
          cnt += 1
        }
        Iterator.single((s, p, cnt))
      }.reduce { (a, b) =>
        val s = Array.tabulate(d)(i => a._1(i) + b._1(i))
        val p = Array.tabulate(d, d)((i, j) => a._2(i)(j) + b._2(i)(j))
        (s, p, a._3 + b._3)
      }
    Array.tabulate(d, d)((i, j) => prods(i)(j) / n - (sums(i) / n) * (sums(j) / n))
  }

  /** Top-k principal components of a d×d symmetric matrix via
    * deterministic cyclic Jacobi (fixed `sweeps`, rotations in fixed
    * (p,q) order, eigenvalue ties broken by original index, each
    * eigenvector sign-normalized). Returns k rows of d doubles,
    * descending eigenvalue order, with the eigenvalues.
    */
  def principalComponents(cov: Array[Array[Double]], k: Int,
                          sweeps: Int = 30): (Seq[Seq[Double]], Seq[Double]) = {
    val d = cov.length
    require(cov.forall(_.length == d), "covariance matrix must be square")
    require(k >= 1 && k <= d, s"k=$k must be in [1, $d]")
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i)).take(k)
    val comps = order.map { c =>
      val vec = (0 until d).map(v(_)(c))
      val lead = vec.find(x => math.abs(x) > 1e-12).getOrElse(1.0)
      val sgn = if (lead < 0) -1.0 else 1.0
      vec.map(_ * sgn)
    }
    (comps, order.map(i => a(i)(i)))
  }

  /** Project rows onto components: `proj(c) = Σ_i (x_i − μ_i)·w_c_i`,
    * one codegen dot chain per component — a narrow map-side pass.
    */
  def project(embeddings: DataFrame, mu: Seq[Double],
              components: Seq[Seq[Double]]): DataFrame = {
    val d = mu.length
    require(components.forall(_.length == d), "component dims must match means")
    val projCols = components.map { w =>
      (0 until d).map(i => (col("embedding").getItem(i).cast("double") - lit(mu(i))) * lit(w(i)))
        .reduce(_ + _)
    }
    embeddings.select(col("vec_id"), array(projCols: _*).as("proj"))
  }

  /** Reconstruction from a k-projection: `x̂ = μ + Σ_c proj_c·w_c`
    * (spec surface: MSE must fall as k grows; exact at k = d).
    */
  def reconstruct(projected: DataFrame, mu: Seq[Double],
                  components: Seq[Seq[Double]]): DataFrame = {
    val d = mu.length
    val reconCols = (0 until d).map { i =>
      components.indices
        .map(c => col("proj").getItem(c) * lit(components(c)(i)))
        .foldLeft(lit(mu(i)): Column)(_ + _)
    }
    projected.select(col("vec_id"), array(reconCols: _*).as("recon"))
  }
}
