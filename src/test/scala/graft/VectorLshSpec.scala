package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, VectorLsh}

/** Random-hyperplane LSH invariants: deterministic signatures, no
  * false positives after verification, and usable candidate recall on
  * an embedding-like Gaussian corpus.
  */
class VectorLshSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private lazy val gauss = (0L until 300L).map { i =>
    val rnd = new scala.util.Random(i + 7)
    (i, Array.fill(dim)(rnd.nextGaussian().toFloat))
  }.toDF("vec_id", "embedding").cache()

  test("signatures are deterministic and use all numBits bits") {
    val s1 = VectorLsh.signatures(gauss, dim).collect().map(r => (r.getLong(0), r.getLong(1)))
    val s2 = VectorLsh.signatures(gauss, dim).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.sortBy(_._1).toSeq === s2.sortBy(_._1).toSeq)
    assert(s1.forall { case (_, sig) => sig >= 0 && sig < (1L << VectorLsh.numBits) })
    // bits actually vary across the corpus (hyperplanes aren't degenerate)
    val orAll = s1.map(_._2).reduce(_ | _)
    assert(orAll === (1L << VectorLsh.numBits) - 1)
  }

  test("verified LSH pairs ⊆ brute-force pairs, with high candidate recall") {
    val brute = Dedup.embeddingNearDups(gauss, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorLsh.pairs(gauss, dim, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute), "cosine verification must kill every false positive")
    // sign-LSH recall at cos 0.6 (θ≈53°): per-band (1-θ/π)² ≈ 0.49,
    // 8 bands → ~0.995 expected; assert a loose floor
    assert(lsh.size.toDouble / brute.size >= 0.8,
      s"candidate recall ${lsh.size}/${brute.size} too low")
  }

  test("semDedup groups within-cell near-dups and keeps the member farthest from its centroid") {
    import graft.operators.Ivf
    // ids 0/1 seed the two cells along the axes; 2-4 live in cell-x
    // (2 and 3 a planted near-identical pair), 5/6 a pair in cell-y
    val emb = Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(10f, 0.1f), 3L -> Seq(10.001f, 0.1f), 4L -> Seq(8f, 3f),
      5L -> Seq(0.1f, 9f), 6L -> Seq(0.1f, 9.002f))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, Ivf.kmeans(emb, 2, 2), tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length === 7, "every vector is labeled")
    val byCluster = out.groupBy(_._2)
    // exactly one keeper per cluster, and it's the argmin of (cos_centroid, id)
    for ((_, members) <- byCluster) {
      assert(members.count(_._4 == 1) === 1)
      val keeper = members.minBy(m => (m._3, m._1))
      assert(keeper._4 === 1, s"keep must be the farthest-from-centroid member: $members")
    }
    val cluster = out.map(r => r._1 -> r._2).toMap
    assert(cluster(2L) === cluster(3L), "planted near-identical pair must share a cluster")
    assert(cluster(5L) === cluster(6L))
    assert(cluster(2L) !== cluster(5L), "cross-cell directions must not merge")
    assert(byCluster(cluster(4L)).length === 1 || cluster(4L) === cluster(2L),
      "id 4 is either a singleton or (if tau admits) grouped in its own cell only")
  }
}
