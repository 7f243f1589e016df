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

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

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

  test("incremental embedding store: exchange-free probe, match/keep labels, absorb + replay idempotent") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val tbl = "emb_store_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_cents")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(new java.io.File(wh, tbl)); rmAll(new java.io.File(wh, tbl + "_cents"))
    val assets = Multimodal.semAssetsFromDocuments(docs(40)).cache()
    val feats = Multimodal.extractFeatures(assets, dim = 9)
      .select(col("asset_id").as("vec_id"), col("features").as("embedding")).cache()
    // store = groups 0 and 1; batch = groups 1 (redundant), 2, 3 (novel)
    Dedup.writeEmbeddingStore(feats.filter(col("vec_id") % 4 <= 1), tbl, c = 8, buckets = 4)
    val batch = feats.filter(col("vec_id") % 4 >= 1)
    val labeled = Dedup.incrementalEmbeddingDedup(spark, tbl, batch, 0.99,
        probes = 2, absorb = false)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    labeled.foreach { case (id, (m, k)) =>
      assert(m === (id % 4 == 1), s"vec $id matched_store")
      assert(k === (id % 4 >= 2 && id == id % 4), s"vec $id kept")
    }
    assert(labeled.keySet === (0L until 40L).filter(_ % 4 >= 1).toSet)
    // plan pin: the candidate join's store side reads pre-partitioned
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val df = Dedup.embeddingStoreCandidates(spark, tbl, batch, probes = 2)
      val smj = df.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }
        .getOrElse(fail("expected a sort-merge candidate join against the store:\n" +
          df.queryExecution.executedPlan.toString))
      assert(smj.right.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
        s"store side must read pre-partitioned by bucket:\n${smj.right}")
    }
    // absorb appends exactly the kept reps; a replayed batch keeps nothing
    Dedup.incrementalEmbeddingDedup(spark, tbl, batch, 0.99, probes = 2)
    val n1 = spark.table(tbl).count()
    assert(n1 === 20L + 2L, "store grew by the two novel-group representatives")
    val replay = Dedup.incrementalEmbeddingDedup(spark, tbl, batch, 0.99, probes = 2)
    assert(replay.filter(col("kept")).count() === 0L,
      "every replayed vector matches its own stored copy")
    assert(spark.table(tbl).count() === n1, "replay must not grow the store")
    // incremental ∪ stored reps ≡ batch semdedup reps over the union
    val unionReps = labelSet(Multimodal.imageSemanticDedup(assets, dim = 9,
      threshold = 0.99)).filter(_._3).map(_._1)
    assert(unionReps === Set(0L, 1L, 2L, 3L))
    // a layout mismatch refuses instead of silently missing
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('graft.embstore.layout' = 'future-v9')")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingStoreCandidates(spark, tbl, batch).count()
    }
    assert(e.getMessage.contains("rebuild"))
    feats.unpersist(); assets.unpersist()
    spark.sql(s"DROP TABLE IF EXISTS $tbl"); spark.sql(s"DROP TABLE IF EXISTS ${tbl}_cents")
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
