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
}
