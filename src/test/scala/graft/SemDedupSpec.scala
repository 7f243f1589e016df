package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Multi-probe IVF-cell blocking on a NON-degenerate geometry: the
  * r17 fixture's four near-dup groups each spread across a cosine
  * cone, and c = 8 cells force k-means to split groups — so
  * single-probe blocking demonstrably loses connectivity and
  * multi-probe restores the brute result. This is the recall
  * machinery the 100-TB path relies on, pinned on a fixture where
  * near ≠ equal (the r16 one-hot fixture made probes=1 trivially
  * lossless).
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, "")).toDF("doc_id", "text")
  }

  private def labelSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("multi-probe blocked semdedup == brute on the spread fixture; closed form holds") {
    val assets = Multimodal.semAssetsFromDocuments(docs(40)).cache()
    val brute = labelSet(Multimodal.imageSemanticDedup(assets, dim = 9, threshold = 0.99))
    // the closed form the oracle uses: cluster = doc_id % 4
    assert(brute === (0L until 40L).map(i => (i, i % 4, i < 4)).toSet,
      "brute clusters must be the four spread groups")
    val multi = labelSet(Multimodal.imageSemanticDedup(assets, dim = 9,
      threshold = 0.99, blocked = true, c = 8, probes = 2))
    assert(multi === brute, "probes = 2 must restore the brute result")
    assets.unpersist()
  }

  test("single-probe blocking LOSES connectivity on the same fixture (the knob earns its keep)") {
    val assets = Multimodal.semAssetsFromDocuments(docs(40)).cache()
    val single = labelSet(Multimodal.imageSemanticDedup(assets, dim = 9,
      threshold = 0.99, blocked = true, c = 8, probes = 1))
    // 8 cells over 4 groups: at least one group splits, and with one
    // probe the split halves never meet — more than 4 keepers survive
    val keepers = single.count(_._3)
    assert(keepers > 4,
      s"probes = 1 should fragment at least one group (got $keepers keepers); " +
        "if this ever holds at 4, the fixture has degenerated and must be re-spread")
    assets.unpersist()
  }

  test("blocked pair stage at the embedding tier: probes=2 finds every brute pair on the fixture features") {
    // the same property at the PAIR level (below the component
    // labeling): extract the fixture's real pixel features and compare
    // the raw pair sets — multi-probe recovers the full brute relation
    val assets = Multimodal.semAssetsFromDocuments(docs(32)).cache()
    val feats = Multimodal.extractFeatures(assets, dim = 9)
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
      .cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(Dedup.embeddingNearDups(feats, 0.99))
    val multi = pairSet(Dedup.embeddingNearDupsBlocked(feats, 0.99, c = 8, probes = 2))
    val single = pairSet(Dedup.embeddingNearDupsBlocked(feats, 0.99, c = 8, probes = 1))
    assert(multi === brute, "probes = 2 must recover the full pair relation here")
    assert(single.subsetOf(brute) && single.size < brute.size,
      s"probes = 1 must lose pairs on the spread geometry " +
        s"(got ${single.size} of ${brute.size})")
    feats.unpersist(); assets.unpersist()
  }
}
