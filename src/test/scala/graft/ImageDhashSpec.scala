package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.ImageCodec

/** Perceptual image near-dup (dHash + the 8×8-bit Hamming band funnel):
  * the gradient-sign hash must survive re-encoding and grid-aligned
  * rescale, flag planted perturbations as NEAR, keep distinct content
  * apart, and the band join must find EVERY pair the brute-force
  * Hamming scan finds (pigeonhole-exact to distance 7).
  */
class ImageDhashSpec extends AnyFunSuite {
  import TestSpark.spark

  // a deterministic structured test image: per-cell luma from the id
  private def img(id: Long, scale: Int, flip: Set[(Int, Int)] = Set.empty): ImageCodec.Decoded = {
    val px = Array.tabulate(9 * scale * 8 * scale) { i =>
      val cx = (i % (9 * scale)) / scale
      val cy = (i / (9 * scale)) / scale
      val g =
        if (flip((cx, cy))) 255
        else (10 + graft.functions.Portable.md5IntOf(s"$id:$cx:$cy:spec") % 230).toInt
      0xff000000 | (g << 16) | (g << 8) | g
    }
    ImageCodec.Decoded(9 * scale, 8 * scale, 3, px)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash invariances: re-encode (PNG/BMP) and grid-aligned rescale are exact; perturbation is near") {
    val base = img(7L, 4)
    val h = ImageCodec.dhash(base)
    // real encode → decode → hash, both containers
    val viaPng = ImageCodec.decode(ImageCodec.encodePng(36, 32, base.argb)).get
    val viaBmp = ImageCodec.decode(ImageCodec.encodeBmp(36, 32, base.argb)).get
    assert(ImageCodec.dhash(viaPng) === h, "PNG round trip must preserve the hash")
    assert(ImageCodec.dhash(viaBmp) === h, "BMP re-encode must preserve the hash")
    // genuine 2× rescale of the same field
    assert(ImageCodec.dhash(img(7L, 8)) === h, "grid-aligned rescale must preserve the hash")
    // one-cell perturbation moves at most the bits its comparisons touch
    assert(hamming(ImageCodec.dhash(img(7L, 4, flip = Set((0, 0)))), h) <= 1)
    assert(hamming(ImageCodec.dhash(img(7L, 4, flip = Set((3, 2)))), h) <= 2,
      "an interior cell touches exactly its two adjacent comparisons")
    // distinct content is far apart
    assert(hamming(ImageCodec.dhash(img(8L, 4)), h) > 12)
    // bit-string form mirrors the Long bit for bit
    val bits = ImageCodec.dhashBits(h)
    assert(bits.length === 64)
    (0 until 64).foreach(i =>
      assert((bits.charAt(i) == '1') === (((h >>> i) & 1L) == 1L)))
  }

  test("luma is exact on gray pixels and weighs channels per ITU-R 601") {
    assert(ImageCodec.luma(0xff000000 | (200 << 16) | (200 << 8) | 200) === 200)
    assert(ImageCodec.luma(0xffff0000) === 299 * 255 / 1000)
    assert(ImageCodec.luma(0xff00ff00) === 587 * 255 / 1000)
    assert(ImageCodec.luma(0xff0000ff) === 114 * 255 / 1000)
  }

  test("band funnel finds exactly the brute-force pairs; undecodable assets poison-skip") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, "")).toDF("doc_id", "text")
    val assets = Multimodal.dhashAssetsFromDocuments(docs)
    // one corrupt payload row: must flag decoded=false and never pair
    val poisoned = assets.unionByName(
      Seq((999L, Array[Byte](1, 2, 3), "image/png", 4, 4))
        .toDF("asset_id", "media", "mime", "width", "height"))
    val hashes = Multimodal.imageDhash(poisoned).cache()
    assert(hashes.filter(col("asset_id") === 999L && !col("decoded")).count() === 1L)
    val got = Multimodal.imageNearDupPairs(hashes, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the decoded hash set
    val hs = hashes.filter(col("decoded")).select("asset_id", "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i1, h1) <- hs; (i2, h2) <- hs
      if i1 < i2 && hamming(h1, h2) <= 7
    } yield (i1, i2, hamming(h1, h2))).toSet
    assert(got === brute, "band join must be exactly the brute-force pair set to Hamming 7")
    assert(got.nonEmpty && got.forall { case (a, b, _) => a / 10 == b / 10 },
      "only planted same-doc variants may pair")
    // keep-one composition: representatives over the pair graph
    val clusters = graft.operators.Dedup.nearDupClusters(
      hashes.filter(col("decoded")).select(col("asset_id").as("doc_id"), lit("").as("text")),
      Multimodal.imageNearDupPairs(hashes, 7).select(col("id1"), col("id2")))
    val reps = graft.operators.Dedup.clusterRepresentatives(
      clusters,
      hashes.filter(col("decoded"))
        .select(col("asset_id").as("doc_id"), lit(1.0).as("quality")))
    // every planted variant group collapses to ONE representative
    assert(reps.filter(col("n_members") > 1).count() === 40L)
    hashes.unpersist()
  }

  test("banded dHash store: store side exchange-free; keep semantics; absorb + replay idempotent") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, "")).toDF("doc_id", "text")
    val assets = Multimodal.dhashAssetsFromDocuments(docs)
    // store = base assets of docs < 20; batch = everything else
    val isStored = col("asset_id") % 10 === 0 && col("asset_id") < 200
    val tbl = "dhash_store_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // a previous crashed run's warehouse dir survives the catalog drop
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(new java.io.File(wh, tbl))
    Multimodal.writeDhashStore(Multimodal.imageDhash(assets.filter(isStored)), tbl,
      buckets = 4)
    val batch = Multimodal.imageDhash(assets.filter(!isStored)).cache()
    val kept = Multimodal.incrementalImageNearDup(spark, tbl, batch, 6, absorb = false)
      .collect().map(_.getLong(0)).toSet
    // kept = exactly the novel docs' (20..29) base assets
    assert(kept === (20L until 30L).map(_ * 10).toSet,
      s"stored docs' variants drop, novel twins keep min id — got $kept")
    // plan pin: the candidate join's store side reads pre-partitioned
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val df = Multimodal.dhashStoreCandidates(spark, tbl,
        batch.filter(col("decoded")).select("asset_id", "dhash"))
      val smj = df.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }
        .getOrElse(fail("expected a sort-merge candidate join against the store:\n" +
          df.queryExecution.executedPlan.toString))
      assert(smj.right.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
        s"store side must read pre-partitioned by bucket:\n${smj.right}")
    }
    // absorb + replay: second absorb of the same batch keeps nothing,
    // appends nothing
    assert(Multimodal.incrementalImageNearDup(spark, tbl, batch, 6)
      .collect().map(_.getLong(0)).toSet === kept)
    val n1 = spark.table(tbl).count()
    assert(Multimodal.incrementalImageNearDup(spark, tbl, batch, 6).collect().isEmpty,
      "a replayed batch's assets are all within Hamming 0 of their stored copies")
    assert(spark.table(tbl).count() === n1, "replay must not grow the store")
    batch.unpersist()
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("video frame dHash: gray-palette GIF round-trips exactly; rescale/clip share frames; corrupt skips") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, "")).toDF("doc_id", "text")
    val assets = Multimodal.videoDhashAssetsFromDocuments(docs)
    val fh = Multimodal.videoFrameDhash(assets).cache()
    // per-asset frame counts: base 4, rescale 4, clip 3
    val counts = fh.groupBy("asset_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 20L).foreach { d =>
      assert(counts(d * 10) === 4L)
      if (d % 2 == 0) assert(counts(d * 10 + 1) === 4L)
      if (d % 5 == 0) assert(counts(d * 10 + 3) === 3L)
    }
    // the rescaled re-encode's per-frame hashes equal the base's
    val byAsset = fh.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toMap }
    (0L until 20L by 2).foreach { d =>
      assert(byAsset(d * 10) === byAsset(d * 10 + 1),
        s"thumbnail re-encode must preserve every frame hash for doc $d")
    }
    // the clip's frame k is the source's frame k+1
    (0L until 20L by 5).foreach { d =>
      (0 until 3).foreach(k =>
        assert(byAsset(d * 10 + 3)(k) === byAsset(d * 10)(k + 1)))
    }
    // shared-frame pairs equal the planted closed form
    val pairs = Multimodal.videoNearDupPairs(fh, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want =
      (0L until 20L by 2).map(d => (d * 10, d * 10 + 1, 4L)).toSet ++
        (0L until 20L by 5).map(d => (d * 10, d * 10 + 3, 3L)) ++
        (0L until 20L by 10).map(d => (d * 10 + 1, d * 10 + 3, 3L))
    assert(pairs === want)
    // corrupt payload: no rows, no throw
    val poisoned = Seq((999L, Array[Byte](9, 9, 9), "image/gif", 4, 4))
      .toDF("asset_id", "media", "mime", "width", "height")
    assert(Multimodal.videoFrameDhash(poisoned).count() === 0L)
    fh.unpersist()
  }

  test("acoustic fingerprint: container re-encode and sample-and-hold resample exact; perturbation near; uneven windows deterministic") {
    import graft.operators.Multimodal.AudioCodec
    def clip(id: Long, scale: Int, perturb: Boolean = false): AudioCodec.DecodedAudio = {
      val samples = Array.tabulate(65 * 16 * scale) { i =>
        val b = i / (16 * scale)
        if (perturb && b == 0) 15000.toShort
        else (graft.functions.Portable.md5IntOf(s"$id:$b:afpspec") % 20000 - 10000).toShort
      }
      AudioCodec.DecodedAudio(8000.0 * scale, 1, samples)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = clip(3L, 1)
    val h = AudioCodec.afingerprint(base)
    // real encode → decode → fingerprint through BOTH containers
    val viaWav = AudioCodec.decode(AudioCodec.encodeWav(8000f, 1, base.samples)).get
    val viaAiff = AudioCodec.decode(AudioCodec.encodeAiff(8000f, 1, base.samples)).get
    assert(AudioCodec.afingerprint(viaWav) === h, "WAV round trip must preserve the print")
    assert(AudioCodec.afingerprint(viaAiff) === h, "AIFF re-encode must preserve the print")
    // genuine 2× sample-and-hold resample
    assert(AudioCodec.afingerprint(clip(3L, 2)) === h,
      "window-aligned resample must preserve the print")
    // one-block perturbation: at most bit 0 moves — and TO 1
    val hp = AudioCodec.afingerprint(clip(3L, 1, perturb = true))
    assert(hamming(hp, h) <= 1 && (hp & 1L) === 1L)
    // distinct content far apart
    assert(hamming(AudioCodec.afingerprint(clip(4L, 1)), h) > 12)
    // uneven window lengths (n not divisible by 65): deterministic and
    // equal to the exact cross-multiplied mean comparison
    val odd = AudioCodec.DecodedAudio(8000.0, 1,
      Array.tabulate(1003)(i => ((i * 37) % 3000 - 1500).toShort))
    val sums = new Array[Long](65); val lens = new Array[Long](65)
    odd.samples.indices.foreach { i =>
      val b = (i.toLong * 65 / 1003).toInt
      sums(b) += math.abs(odd.samples(i).toInt); lens(b) += 1
    }
    val want = (0 until 64).foldLeft(0L) { (acc, k) =>
      if (sums(k) * lens(k + 1) > sums(k + 1) * lens(k)) acc | (1L << k) else acc
    }
    assert(AudioCodec.afingerprint(odd) === want)
    assert(AudioCodec.afingerprint(AudioCodec.DecodedAudio(8000.0, 1, Array.empty)) === 0L)
  }

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
