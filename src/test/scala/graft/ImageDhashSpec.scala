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

  test("density guard: dup mass collapses, over-dense band buckets cap, recall holds through clean bands") {
    import spark.implicits._
    def h64(s: String): Long =
      (graft.functions.Portable.md5IntOf(s + ":hi") << 32) |
        graft.functions.Portable.md5IntOf(s + ":lo")
    // --- exact-dup mass: 128 distinct hashes × 8 copies = 1024 assets.
    // Candidates are evaluated at REPRESENTATIVE level: volume scales
    // with 128², never 1024² — dup mass exits the funnel entirely.
    val dupAssets = (0 until 128).flatMap { i =>
      (0 until 8).map(j => (i * 8L + j, h64(s"dup$i"), true))
    }.toDF("asset_id", "dhash", "decoded")
    val repCands = graft.operators.Multimodal.dhashBandCandidates(
      dupAssets.select("dhash").distinct()).count()
    val naiveFloor = 1024L * 1024L / 32L // what unguarded 8-bit banding pays
    assert(repCands < naiveFloor / 10,
      s"rep-level candidates ($repCands) must sit far under the N²/32 floor ($naiveFloor)")
    // correctness unchanged: pairs == brute force over the dup corpus
    val got = graft.operators.Multimodal.imageNearDupPairs(dupAssets, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = dupAssets.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i1, v1) <- hs; (i2, v2) <- hs
      if i1 < i2 && java.lang.Long.bitCount(v1 ^ v2) <= 7
    } yield (i1, i2, java.lang.Long.bitCount(v1 ^ v2))).toSet
    assert(got === brute, "collapse+expand must reproduce the exact pair set")
    // --- hot-key adversary: 300 pairwise-distant hashes ALL sharing
    // bands 0 AND 1 (the all-identical-band shape under the band-PAIR
    // key layout) + 10 planted near pairs at Hamming 1. The shared
    // (0,1)-pair bucket alone would be 300²/2 candidates; the df cap
    // skips it, and the planted pairs still surface through their
    // many other clean, under-cap pair keys.
    val hot = (0 until 300).map(i => (i.toLong, (h64(s"hot$i") << 16) | 0x4242L, true))
    val planted = (0 until 10).map(i => (1000L + i, hot(i)._2 ^ (1L << 63), true))
    val adv = (hot ++ planted).toDF("asset_id", "dhash", "decoded")
    val uncapped = graft.operators.Multimodal.dhashBandCandidates(
      adv.select("dhash").distinct(), bandDfCap = Int.MaxValue).count()
    val capped = graft.operators.Multimodal.dhashBandCandidates(
      adv.select("dhash").distinct(), bandDfCap = 100).count()
    assert(uncapped > 40000L, s"the hot key must dominate uncapped volume ($uncapped)")
    assert(capped < 8000L, s"the df cap must remove the structural bucket ($capped)")
    val pairsCapped = graft.operators.Multimodal.imageNearDupPairs(adv, 6, bandDfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsCapped === (0 until 10).map(i => (i.toLong, 1000L + i)).toSet,
      "every planted near pair must survive the cap via a clean band")
  }

  test("store probe volume: a batch hash touches ~28·|store|/2¹⁶ reps, not |store|/32") {
    import spark.implicits._
    def h64(s: String): Long =
      (graft.functions.Portable.md5IntOf(s + ":hi") << 32) |
        graft.functions.Portable.md5IntOf(s + ":lo")
    val tbl = "dhash_probe_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(new java.io.File(wh, tbl))
    val store = (0 until 2000).map(i => (i.toLong, h64(s"store$i"), true))
      .toDF("asset_id", "dhash", "decoded")
    Multimodal.writeDhashStore(store, tbl, buckets = 4)
    // 100 probe hashes: 90 distant + 10 near-dups of stored reps
    val probes = ((0 until 90).map(i => (5000L + i, h64(s"probe$i"))) ++
      (0 until 10).map(i => (6000L + i, h64(s"store$i") ^ 1L)))
      .toDF("asset_id", "dhash")
    val cands = Multimodal.dhashStoreCandidates(spark, tbl, probes)
    val volume = cands.count()
    // old 8-bit floor: 100 probes × |store|/32 ≈ 6,250 touched reps;
    // pair keys: 100 × 28 × 2000/65536 ≈ 85 expected random collisions
    // + the 10 planted matches' shared keys
    assert(volume < 1500L,
      s"probe volume must be combination-key bounded, got $volume (old floor ≈ 6250)")
    // and the planted near-dups are all caught at Hamming ≤ 6
    val matched = cands
      .filter(bit_count(col("dhash").bitwiseXOR(col("rep_hash"))) <= 6)
      .select("dhash").distinct().count()
    assert(matched === 10L, "every planted near-dup must match its stored rep")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MJPEG-in-MP4 twin: sample-table walk yields the GIF twin's frame hashes; corrupt tables skip") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, "")).toDF("doc_id", "text")
    val gif = Multimodal.videoFrameDhash(Multimodal.videoDhashAssetsFromDocuments(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    val mp4Assets = Multimodal.mp4DhashAssetsFromDocuments(docs).cache()
    val mp4 = Multimodal.videoFrameDhash(mp4Assets)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    assert(mp4 === gif,
      "q=1.0 JPEG samples through stsd/stsz/stsc/stco must hash bit-equal to the GIF twin")
    // corrupt sample tables damage-skip the asset, never throw
    val bytes = mp4Assets.filter(col("asset_id") === 0L)
      .select("media").collect().head.getAs[Array[Byte]](0)
    val s = new String(bytes.map(b => (b & 0xff).toChar))
    // garble the stsz box's sample count field
    val at = s.indexOf("stsz")
    assert(at > 0)
    val broken = bytes.clone()
    broken(at + 12) = 0x7f.toByte // count becomes ~2G: refused by the cap
    assert(Multimodal.Mp4Codec.extractSamples(broken) === None)
    // truncating the file under the stco offsets: out-of-bounds → None
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 200)
    assert(Multimodal.Mp4Codec.extractSamples(cut) === None)
    // and parseMeta still serves the intact container's metadata
    val meta = Multimodal.Mp4Codec.parseMeta(bytes)
    assert(meta.exists(m => m.tracks.exists(t => t.handler == "vide" && t.codec == "jpeg")))
    mp4Assets.unpersist()
  }

  test("store layout version: a pre-band-pair (or future-layout) store fails fast at probe time") {
    import spark.implicits._
    val tbl = "dhash_layout_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(new java.io.File(wh, tbl))
    val store = (0 until 50).map(i => (i.toLong, i.toLong * 7919L, true))
      .toDF("asset_id", "dhash", "decoded")
    Multimodal.writeDhashStore(store, tbl, buckets = 4)
    val probes = Seq((1000L, 3L)).toDF("asset_id", "dhash")
    // the stamped store probes fine
    Multimodal.dhashStoreCandidates(spark, tbl, probes).count()
    // a store written under another layout (simulated by re-stamping —
    // the r15 single-band tables carried no property at all, which the
    // assert reports as '<absent>') must refuse, not silently miss
    spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('graft.dhash.layout' = 'single-band-8-v1')")
    val e = intercept[IllegalArgumentException] {
      Multimodal.dhashStoreCandidates(spark, tbl, probes).count()
    }
    assert(e.getMessage.contains("rebuild the store"),
      s"layout mismatch must name the remedy: ${e.getMessage}")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("stop-frame cap: an ubiquitous frame is removed before the self-join; genuine overlap still pairs") {
    import spark.implicits._
    def h64(s: String): Long =
      (graft.functions.Portable.md5IntOf(s + ":hi") << 32) |
        graft.functions.Portable.md5IntOf(s + ":lo")
    val black = h64("black-stop-frame")
    // 200 videos: 3 unique frames each + the shared black frame;
    // videos 0 and 1 additionally share two genuine frames
    val rows = (0L until 200L).flatMap { v =>
      val own = (0 until 3).map(f => (v, f, h64(s"v$v:f$f")))
      val shared =
        if (v <= 1) Seq((v, 3, h64("shared:a")), (v, 4, h64("shared:b"))) else Seq.empty
      own ++ shared :+ ((v, 9, black))
    }.map { case (v, f, h) =>
      (v, f, h, graft.operators.Multimodal.ImageCodec.dhashBits(h))
    }.toDF("asset_id", "frame_ix", "dhash", "dhash_bits")
    // minShared=1 makes the hot key's damage visible in the OUTPUT:
    // uncapped, every video pairs with every other via the black frame
    val unc = graft.operators.Multimodal.videoNearDupPairs(rows, minShared = 1,
      frameDfCap = 1 << 20).count()
    assert(unc === 200L * 199L / 2,
      "uncapped, the ubiquitous frame alone pairs all videos quadratically")
    val capped = graft.operators.Multimodal.videoNearDupPairs(rows, minShared = 1,
      frameDfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((0L, 1L, 2L)),
      "capped, only the genuinely-overlapping pair remains (its own 2 shared frames)")
    // and at the declared minShared=2 the capped output is identical
    val def2 = graft.operators.Multimodal.videoNearDupPairs(rows, minShared = 2,
      frameDfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(def2 === Set((0L, 1L, 2L)))
  }

  test("MJPEG-in-AVI twin: q=1.0 JPEG is bit-exact on block-constant gray; frame hashes equal the GIF twin's") {
    import spark.implicits._
    import graft.operators.Multimodal.VideoCodec
    // block-constant gray at quality 1.0 round-trips EXACTLY (all-ones
    // quant table, DC-only blocks) — the property the fixture builds on
    val cells = Array.tabulate(9 * 8 * 8 * 8) { i =>
      val cx = (i % 72) / 8; val cy = (i / 72) / 8
      val g = (10 + graft.functions.Portable.md5IntOf(s"jq:$cx:$cy") % 230).toInt
      0xff000000 | (g << 16) | (g << 8) | g
    }
    val back = ImageCodec.decode(VideoCodec.encodeJpeg(72, 64, cells, 1.0f)).get
    assert(back.argb.map(_ & 0xffffff).toSeq === cells.map(_ & 0xffffff).toSeq,
      "quality-1.0 JPEG must round-trip block-constant gray exactly")
    // the MJPEG corpus carries the SAME per-frame hash formulas as the
    // GIF corpus — one oracle pins both containers
    val docs = (0L until 12L).map(i => (i, "")).toDF("doc_id", "text")
    def frameHashes(assets: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.videoFrameDhash(assets)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaGif = frameHashes(
      graft.operators.Multimodal.videoDhashAssetsFromDocuments(docs))
    val viaMjpeg = frameHashes(
      graft.operators.Multimodal.mjpegDhashAssetsFromDocuments(docs))
    assert(viaMjpeg.keySet === viaGif.keySet,
      "same asset/frame structure (base, 2× re-render, clip)")
    viaMjpeg.foreach { case (k, h) =>
      assert(h === viaGif(k), s"frame $k must hash identically across containers") }
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
