package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Deterministic sampling invariants: reproducibility, stability under
  * corpus growth, split partition laws, and the domain-mix rate
  * formula (binding stratum kept whole, output mixture ≈ targets).
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // skewed strata: 600 a, 300 b, 100 c
  private lazy val docs = ((0L until 600L).map(i => (i, "a")) ++
    (600L until 900L).map(i => (i, "b")) ++
    (900L until 1000L).map(i => (i, "c")))
    .toDF("doc_id", "lang").cache()

  test("bernoulli: deterministic, ~rate fraction kept, subset of input") {
    val s1 = Sampling.bernoulli(docs, col("doc_id"), 0.3).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.bernoulli(docs, col("doc_id"), 0.3).collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    assert(s1.size > 200 && s1.size < 400, s"kept ${s1.size} of 1000 at rate 0.3")
    // membership is a pure function of the id: sampling a SUBSET of the
    // corpus keeps exactly the intersection (rows don't flip when the
    // corpus around them changes — the stable-eval-split property)
    val sub = Sampling.bernoulli(docs.filter(col("doc_id") < 500), col("doc_id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(sub === s1.filter(_ < 500))
  }

  test("splitLabel: total disjoint partition with ~0.9/0.05/0.05 fractions") {
    val labeled = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 0.9, 0.05).as("split")).cache()
    assert(labeled.count() === 1000)
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 850 && counts("train") < 950, s"train=${counts("train")}")
    assert(counts("val") > 20 && counts("val") < 80, s"val=${counts("val")}")
    assert(counts("test") > 20 && counts("test") < 80, s"test=${counts("test")}")
  }

  test("composed stages are independent: split after bernoulli keeps all three labels") {
    // each operator draws from its own salt's stream — without that,
    // every row surviving bernoulli(0.5) has a low hash and would land
    // in 'train' ([0, 0.9)), leaving val/test EMPTY
    val kept = Sampling.bernoulli(docs, col("doc_id"), 0.5)
    val counts = kept.select(Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet === Set("train", "val", "test"),
      s"val/test must survive composition: $counts")
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9, s"$counts")
    assert(counts("val") / n > 0.03 && counts("test") / n > 0.03, s"$counts")
  }

  test("mixRates: binding stratum rate is 1.0 and rates follow t·K/n") {
    val targets = Map("a" -> 0.5, "b" -> 0.2, "c" -> 0.3)
    val rates = Sampling.mixRates(docs, col("lang"), targets)
    // K = min(600/0.5, 300/0.2, 100/0.3) = min(1200, 1500, 333.3) → c binds
    val k = 100.0 / 0.3
    assert(rates("c") === 1.0)
    assert(rates("a") === 0.5 * k / 600.0)
    assert(rates("b") === 0.2 * k / 300.0)
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
  }

  test("epochMix: floor copies for all, fractional extra for a hash share; e<1 downsamples") {
    val epochs = Map("a" -> 0.5, "b" -> 2.25, "c" -> 1.0)
    val mixed = Sampling.epochMix(docs, col("lang"), col("doc_id"), epochs).cache()
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c: exactly one copy each; b: 2n plus a ~quarter extra; a: ~half kept
    assert(byLang("c") === 100)
    assert(byLang("b") >= 2 * 300 && byLang("b") <= 3 * 300, s"b=${byLang("b")}")
    assert(byLang("b") > 630 && byLang("b") < 700, s"b=${byLang("b")} not ~2.25x")
    assert(byLang("a") > 240 && byLang("a") < 360, s"a=${byLang("a")} not ~0.5x")
    // copy_idx dense from 0 per doc; deterministic across runs
    val bad = mixed.groupBy("doc_id").agg(min("copy_idx").as("mn"),
      max("copy_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(bad === 0)
    val again = Sampling.epochMix(docs, col("lang"), col("doc_id"), epochs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === mixed.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("sampling operators apply unchanged to streams (stateless narrow ops)") {
    // bernoulli/splitLabel are pure row-local column logic — the same
    // DataFrame code runs under Structured Streaming with no watermark
    // or state, and a micro-batched stream yields exactly the batch set
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = Sampling.bernoulli(mem.toDF().toDF("doc_id", "lang"),
        col("doc_id"), 0.3)
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
    val q = streamed.writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    try {
      val rows = (0L until 300L).map(i => (i, s"g${i % 3}"))
      mem.addData(rows.take(150): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(150): _*)
      q.processAllAvailable()
      val got = spark.table("sample_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = Sampling.bernoulli(rows.toDF("doc_id", "lang"), col("doc_id"), 0.3)
        .select(col("doc_id"), Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stratifiedExact: exactly min(n, |stratum|) per stratum, deterministic, hash-order membership") {
    val out = Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 200)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val perStratum = out.groupBy(_._2).view.mapValues(_.length).toMap
    // a:600 b:300 -> capped at 200; c:100 -> whole stratum
    assert(perStratum === Map("a" -> 200, "b" -> 200, "c" -> 100))
    val again = Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 200)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq === again.sorted.toSeq, "exact sample must be deterministic")
    // membership IS the n lowest salted hashes of each stratum
    val hashes = docs.select(col("doc_id"), col("lang"),
        graft.functions.Portable.unitHashSalted(col("doc_id"), "stratified").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = hashes.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(200).toSeq
    }.map(r => (r._1, r._2)).toSet
    assert(out.toSet === expected)
  }

  test("domainMix: output mixture approximates targets; untargeted strata dropped") {
    val targets = Map("a" -> 0.5, "b" -> 0.5) // c untargeted → dropped
    val mixed = Sampling.domainMix(docs, col("lang"), col("doc_id"), targets).cache()
    val counts = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("c"), "stratum without a target must be dropped")
    // b binds (300/0.5 = 600 < 1200): kept whole; a subsampled to ~300
    assert(counts("b") === 300)
    assert(counts("a") > 240 && counts("a") < 360, s"a=${counts("a")}")
    // kept rows are a subset of the input rows
    assert(mixed.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("weightedBernoulli: keep rate tracks per-row weight; 0 drops all, 1 keeps all") {
    // weights by stratum: a→0.0, b→1.0, c→0.5
    val w = when(col("lang") === "a", 0.0)
      .when(col("lang") === "b", 1.0).otherwise(0.5)
    val kept = Sampling.weightedBernoulli(docs, col("doc_id"), w)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("a"), "weight 0 must drop every row")
    assert(counts("b") === 300L, "weight 1 must keep every row")
    assert(counts("c") > 25 && counts("c") < 75, s"c=${counts.get("c")} of 100 at weight 0.5")
    // deterministic: same draw twice
    val again = Sampling.weightedBernoulli(docs, col("doc_id"), w)
    assert(kept.collect().map(_.getLong(0)).toSet === again.collect().map(_.getLong(0)).toSet)
    // a row's fate is independent of the weight OTHER rows carry: the
    // c-stratum survivors under the mixed weight equal the survivors
    // of a uniform-0.5 draw restricted to c
    val uniform = Sampling.weightedBernoulli(docs, col("doc_id"), lit(0.5))
      .filter(col("lang") === "c").collect().map(_.getLong(0)).toSet
    assert(kept.filter(col("lang") === "c").collect().map(_.getLong(0)).toSet === uniform)
  }

  test("leakageSafeSplit: near-dup families never straddle splits; singletons == per-doc split") {
    import graft.operators.Dedup
    // pairs: (0,1), (1,2) one family; (10,11) another; rest singletons
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val clusters = Dedup.nearDupClusters(docs.select("doc_id"), pairs)
    val split = Sampling.leakageSafeSplit(docs, clusters, 0.6, 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size === 40, "split must be total")
    // every paired doc shares its family's split
    Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L)).foreach { case (a, b) =>
      assert(split(a)._2 === split(b)._2, s"docs $a and $b must co-split")
    }
    // singleton: cluster_id = own id, label = plain per-doc split
    val plain = docs.filter(col("doc_id") >= 20)
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id"), 0.6, 0.2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, s) =>
      assert(split(id)._1 === id && split(id)._2 === s,
        s"singleton $id must split exactly like the per-doc label")
    }
  }

  test("trainingShards: total cover, dense in-shard positions, deterministic, one exchange") {
    val sharded = Sampling.trainingShards(docs, col("doc_id"), 8)
      .select("doc_id", "shard_id", "shard_pos")
    val rows = sharded.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length === 1000, "every row lands in exactly one shard")
    assert(rows.map(_._2).toSet === (0 until 8).toSet, "all shards populated")
    // positions are 0..n_s-1 dense per shard (the streaming-read contract)
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq === (0 until g.length), s"shard $s positions not dense")
    }
    // shard sizes are hash-balanced (uniform over 8 shards, 1000 rows)
    val sizes = rows.groupBy(_._2).values.map(_.size)
    assert(sizes.min > 60 && sizes.max < 190, s"shard sizes $sizes")
    // order is pseudo-random, not id order: some shard must rank a
    // larger id before a smaller one
    assert(rows.groupBy(_._2).values.exists { g =>
      val byPos = g.sortBy(_._3).map(_._1)
      byPos.zip(byPos.tail).exists { case (a, b) => a > b }
    }, "in-shard order must not be id order")
    // deterministic under different input partitioning
    val again = Sampling.trainingShards(docs.repartition(17), col("doc_id"), 8)
      .select("doc_id", "shard_id", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // exactly one exchange: the shard_id window partitioning (fresh
    // frame — an executed AQE plan prints initial + final sections and
    // would double-count)
    val p = Sampling.trainingShards(docs, col("doc_id"), 8)
      .select("doc_id", "shard_id", "shard_pos")
      .queryExecution.executedPlan.toString
    val n = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(n === 1, s"expected the single shard_id exchange, got $n:\n$p")
  }

  test("temperatureMix: T=1 is the identity mixture; T=2 flattens the head") {
    // T = 1: targets equal the corpus mixture, so every rate is 1
    val t1 = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), 1.0)
    assert(t1.count() === 1000, "T = 1 must keep the corpus unchanged")
    // T = 2: the binding (smallest-n/target) stratum keeps everything,
    // the 600-row head downsamples hardest
    val t2 = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), 2.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t2("c") === 100L, "the smallest stratum is binding — kept whole")
    // expected: targets ∝ sqrt(p) → (.462,.327,.189)·k with k = 100/.189
    // → a≈244, b≈173 in expectation under Bernoulli keeps
    assert(t2("a") > 195 && t2("a") < 295, s"head kept ${t2("a")} of 600")
    assert(t2("b") > 130 && t2("b") < 215, s"mid kept ${t2("b")} of 300")
    // flattening: output shares are strictly closer to uniform than input
    val total = t2.values.sum.toDouble
    assert(t2("a") / total < 0.6 - 1e-9 && t2("c") / total > 0.1 + 1e-9)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(docs.repartition(11), col("lang"),
      col("doc_id"), 2.0).collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), 2.0)
      .collect().map(_.getLong(0)).toSet
    assert(again === first)
  }

  // tiny controlled corpus for DSIR: target docs are about "x", source
  // docs split between x-ish (should up-weight) and y-ish (down-weight)
  private lazy val dsirDocs = Seq(
    (0L, "x x x x", "tgt"), (1L, "x x y x", "tgt"),
    (2L, "x x x x", "src"), (3L, "x x x y", "src"),
    (4L, "y y y y", "src"), (5L, "y y x y", "src"),
    (6L, "x y x y", "src"))
    .toDF("doc_id", "text", "source").cache()

  test("dsirWeights: log importance ratio matches a driver-side model") {
    import graft.functions.Portable
    val B = 16
    val got = Sampling.dsirWeights(dsirDocs, col("source") === "tgt", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side reference: same grams, same md5 buckets, same smoothing
    val corpus = Seq(
      (0L, "x x x x", true), (1L, "x x y x", true),
      (2L, "x x x x", false), (3L, "x x x y", false),
      (4L, "y y y y", false), (5L, "y y x y", false),
      (6L, "x y x y", false))
    def grams(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w ++ w.zip(w.tail).map { case (a, b) => s"$a $b" }
    }
    def bucket(g: String): Long = Portable.md5IntOf(g) % B
    val all = corpus.flatMap { case (id, t, tgt) => grams(t).map(g => (id, tgt, bucket(g))) }
    val tc = all.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val sc = all.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tt, st) = (tc.values.sum, sc.values.sum)
    def lam(b: Long): BigDecimal = {
      val v = math.log((tc.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        math.log((sc.getOrElse(b, 0L) + 1.0) / (st + B))
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = all.groupBy(_._1).view.mapValues(
      gs => gs.map(g => lam(g._3)).sum.setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toMap
    assert(got === want, "engine weights must equal the reference model exactly")
    // the x-duplicate of the target scores above the y-ish source docs
    assert(got(2L) > got(4L) && got(3L) > got(4L),
      "target-like source docs must out-weight off-target ones")
    // partitioning invariance: DECIMAL sums are associative
    val again = Sampling.dsirWeights(dsirDocs.repartition(13),
      col("source") === "tgt", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === got)
  }

  test("dsirScorer: frozen-literal scoring == dsirWeights; unseen buckets smoothed; streams") {
    val score = Sampling.dsirScorer(dsirDocs, col("source") === "tgt", buckets = 16)
    val got = score(dsirDocs).select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Sampling.dsirWeights(dsirDocs, col("source") === "tgt", buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want, "the frozen scorer must bit-equal the fitted weights")
    // a doc of entirely novel grams may still hash into FITTED buckets
    // (16 buckets) — the invariant is: it scores, deterministically,
    // through literal lookups with the smoothed fallback for misses
    val novel = Seq((99L, "zq wv uu ts")).toDF("doc_id", "text")
    val n1 = score(novel).select("weight").head().getDouble(0)
    assert(score(novel).select("weight").head().getDouble(0) === n1)
    // streaming: the scorer is a stateless narrow projection
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = score(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "weight")
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("append").start()
    try {
      mem.addData((0L, "x x x x"), (4L, "y y y y"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_scores").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === Map(0L -> want(0L), 4L -> want(4L)),
      "streamed scores must equal the batch fit on the same texts")
  }

  test("streaming DSIR: folded increments == batch dsirWeights at every window boundary") {
    import graft.streaming.StreamingCuration
    val modelDir = java.nio.file.Files.createTempDirectory("dsir_model").toString + "/m"
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingCuration.maintainDsirModel(
      mem.toDF().toDF("doc_id", "text", "source"),
      col("source") === "tgt", modelDir, buckets = 16)
    val all = dsirDocs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val batches = Seq(all.take(2), all.slice(2, 5), all.drop(5)) // 3 micro-batches
    try {
      var seen = Seq.empty[(Long, String, String)]
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        // window boundary: refreshed-λ scorer == batch fit on the union
        val scorer = StreamingCuration.dsirScorerFromDir(spark, modelDir, buckets = 16)
        val got = scorer(dsirDocs).select("doc_id", "weight").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val want = Sampling.dsirWeights(
            seen.toDF("doc_id", "text", "source"), col("source") === "tgt", buckets = 16)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        // dsirWeights scores the docs it was fit on; compare on those ids
        assert(want.keySet.forall(id => got(id) === want(id)),
          s"boundary after ${seen.length} docs: streamed model must bit-equal the batch fit")
      }
    } finally q.stop()
  }

  test("dsirResample: deterministic Gumbel-top-k over the source slice") {
    val s1 = Sampling.dsirResample(dsirDocs, col("source") === "tgt", k = 3,
      buckets = 16).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s1.length === 3)
    assert(s1.map(_._1).toSet.subsetOf(Set(2L, 3L, 4L, 5L, 6L)),
      "resample draws from the source slice only")
    assert(s1.map(_._2).toSeq === s1.map(_._2).sorted(Ordering[Double].reverse).toSeq,
      "rows come back score-descending")
    val s2 = Sampling.dsirResample(dsirDocs.repartition(7),
      col("source") === "tgt", k = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq, "draw is a pure function of ids + salt")
    // a different salt is an independent draw: k=all keeps the set equal
    val all = Sampling.dsirResample(dsirDocs, col("source") === "tgt", k = 5,
      buckets = 16, salt = "other").collect().map(_.getLong(0)).toSet
    assert(all === Set(2L, 3L, 4L, 5L, 6L))
  }
}
