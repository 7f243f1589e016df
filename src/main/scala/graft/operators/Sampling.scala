package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deterministic sampling for training-data pipelines: Bernoulli
  * subsampling, train/val/test splitting, and domain mixing (re-weight
  * corpus strata to target mixture proportions). No counterpart in the
  * reference (vector-only surface); standard corpus-curation stages.
  *
  * Everything keys on [[Portable.unitHashSalted]] — a pure function of
  * the row's id and an operator salt — instead of an RNG: no per-task
  * seed state, identical results at any partitioning/parallelism/retry,
  * and a row's membership never changes when the corpus around it grows
  * (the property that keeps eval splits stable across dataset
  * versions). Each operator draws from its own salt's stream, so
  * COMPOSED stages behave like independent draws — without distinct
  * salts, `bernoulli(0.3)` followed by `splitLabel(0.9, 0.05)` would
  * label every surviving row `train` (the filter keeps exactly the
  * low-hash rows). Purely narrow map-side filters — no shuffle at any
  * scale; the one aggregation ([[mixRates]]) moves C stratum counts to
  * the driver, the legitimate small side.
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep the row iff
    * `unitHashSalted(key, salt) < rate`. Expected fraction `rate`,
    * exact reproducibility, zero shuffle. Pass a custom `salt` to make
    * repeated subsampling stages independent of each other.
    */
  def bernoulli(df: DataFrame, key: Column, rate: Double,
                salt: String = "bernoulli"): DataFrame =
    df.filter(Portable.unitHashSalted(key, salt) < lit(rate))

  /** WEIGHT-proportional deterministic sample: keep the row iff
    * `unitHashSalted(key, salt) < weight`, where `weight` is a
    * per-row column in [0, 1] (a quality score, a source boost). The
    * quality-weighted curation draw — high-quality documents survive
    * proportionally more often — with [[bernoulli]]'s contract intact:
    * pure row-local filter, zero shuffle, reproducible (a row's fate
    * depends only on its own key and weight), and composable with the
    * other stages through its own salt. Weights outside [0, 1] clamp
    * to always-drop/always-keep rather than failing.
    */
  def weightedBernoulli(df: DataFrame, key: Column, weight: Column,
                        salt: String = "weighted"): DataFrame =
    df.filter(Portable.unitHashSalted(key, salt) < weight)

  /** Deterministic split label (`train` / `val` / `test`) by hash
    * range: `[0, trainFrac)` → train, `[trainFrac, trainFrac+valFrac)`
    * → val, rest → test. A row's split never changes when other rows
    * are added or removed, and the `split` salt keeps the assignment
    * independent of any upstream sampling stage.
    */
  def splitLabel(key: Column, trainFrac: Double, valFrac: Double,
                 salt: String = "split"): Column = {
    val u = Portable.unitHashSalted(key, salt)
    when(u < lit(trainFrac), lit("train"))
      .when(u < lit(trainFrac + valFrac), lit("val"))
      .otherwise(lit("test"))
  }

  /** LEAKAGE-SAFE split: label by near-dup CLUSTER, not by document —
    * a per-doc split puts two near-duplicates on opposite sides of the
    * train/test boundary and the eval silently measures memorization.
    * `clusters(doc_id, cluster_id)` is [[Dedup.nearDupClusters]]'
    * total labeling (singletons label themselves), so hashing the
    * cluster id keeps every duplicate family on ONE side, and a
    * singleton's assignment equals the plain per-doc split of its own
    * id (cluster_id = doc_id) — adding near-dup edges only ever MERGES
    * families onto the min-id member's side, it never reshuffles
    * unrelated docs.
    *
    * Scale shape: one doc_id-keyed equi-join + a narrow hash label —
    * the cluster relation is the artifact the dedup pass already
    * produced; no new corpus-scale work.
    */
  def leakageSafeSplit(documents: DataFrame, clusters: DataFrame,
                       trainFrac: Double, valFrac: Double,
                       salt: String = "split"): DataFrame =
    documents.select("doc_id")
      .join(clusters, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        splitLabel(col("cluster_id"), trainFrac, valFrac, salt).as("split"))

  /** Per-stratum keep rates that hit the target mixture `targets`
    * (stratum → proportion) at the LARGEST achievable total:
    * `K = min_s n_s / t_s` (the binding stratum is kept whole) and
    * `rate_s = min(1, t_s · K / n_s)`. Strata present in the data but
    * absent from `targets` get no rate (dropped by [[domainMix]]).
    *
    * One count aggregation; C stratum counts collect to the driver.
    * The arithmetic is plain IEEE doubles in a fixed expression shape
    * (`n/t` for K, `t*K/n` for the rate) so an engine mirroring the
    * shape reproduces the rates bit-for-bit — which keeps
    * [[domainMix]] oracle-checkable.
    */
  def mixRates(df: DataFrame, strata: Column, targets: Map[String, Double])
      : Map[String, Double] = {
    val counts = df.groupBy(strata.as("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val present = targets.filter { case (s, _) => counts.contains(s) }
    require(present.nonEmpty, s"no target stratum present in data: ${targets.keys}")
    val k = present.map { case (s, t) => counts(s) / t }.min
    present.map { case (s, t) => s -> math.min(1.0, t * k / counts(s)) }
  }

  /** Domain mixing: subsample each stratum at its [[mixRates]] rate so
    * the output's mixture matches `targets` (in expectation) at the
    * largest achievable size. Strata not in `targets` are dropped.
    * After the one counting pass, a narrow map-side filter.
    */
  def domainMix(df: DataFrame, strata: Column, key: Column,
                targets: Map[String, Double],
                salt: String = "mix"): DataFrame = {
    val rates = mixRates(df, strata, targets)
    // deterministic CASE order; the hash > 0 always, so rate 0 == drop
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (s, r)) => when(strata === lit(s), lit(r)).otherwise(acc) }
    df.filter(Portable.unitHashSalted(key, salt) < rate)
  }

  /** Freeze a fitted DSIR model as PLAN LITERALS and score any document
    * frame statelessly — the bm25Scorer / Classifier.scorer convention:
    * fit λ on the reference corpus once (a ≤`buckets`-row collect, the
    * bounded-sidecar contract), then scoring is ONE narrow projection
    * per row (grams → buckets → λ-map lookups → DECIMAL fold), so a
    * document STREAM scores with no state and no join — and
    * bit-equals [[dsirWeights]] on the same rows (the driver replicates
    * Spark's double→DECIMAL(38,12) HALF_UP cast, and decimal addition
    * is exact and associative). Buckets never seen in the reference
    * score at the smoothed unseen value `ln(1/(T+B)) − ln(1/(S+B))` —
    * the tc = sc = 0 case of the same formula.
    */
  def dsirScorer(reference: DataFrame, isTarget: Column,
                 buckets: Int = 256): DataFrame => DataFrame =
    dsirScorerFromCounts(
      dsirModelIncrement(reference, isTarget, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      buckets)

  /** One micro-batch's DSIR model increment: per-bucket target/source
    * gram counts `(b, tc, sc)` — ≤ `buckets` rows regardless of batch
    * size, and MERGEABLE (counts of a union = per-bucket sums), so a
    * stream can append each batch's increment as immutable files (the
    * CMS maintenance pattern) and fold them back into exactly the model
    * a batch fit over the union would produce. Shared by [[dsirScorer]]
    * (single-batch fit) and the streaming maintenance in
    * [[graft.streaming.StreamingCuration.maintainDsirModel]].
    */
  def dsirModelIncrement(reference: DataFrame, isTarget: Column,
                         buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    gramBuckets(reference.select(col("doc_id"),
        isTarget.as("is_target"), col("text")), buckets)
      .groupBy("b").agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("sc"))
  }

  /** Assemble the frozen stateless scorer from FOLDED per-bucket counts
    * (the [[dsirModelIncrement]] rows, summed per bucket across
    * increments). Identical λ assembly to a direct [[dsirScorer]] fit:
    * integer count sums are exact, so fold-then-freeze bit-equals
    * fit-on-the-union at every maintenance window boundary.
    */
  def dsirScorerFromCounts(counts: Seq[(Long, Long, Long)],
                           buckets: Int): DataFrame => DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val tt = counts.map(_._2).sum
    val st = counts.map(_._3).sum
    def lamOf(tc: Long, sc: Long): java.math.BigDecimal =
      BigDecimal(math.log((tc + 1.0) / (tt + buckets.toDouble)) -
          math.log((sc + 1.0) / (st + buckets.toDouble)))
        .setScale(12, scala.math.BigDecimal.RoundingMode.HALF_UP).bigDecimal
    val lamMap = counts.map { case (b, tc, sc) => b -> lamOf(tc, sc) }.toMap
    val unseen = lamOf(0L, 0L)

    docs => {
      val t = split(col("text"), " ")
      val n = size(t)
      val bigrams = zip_with(
        slice(t, lit(1), greatest(n - 1, lit(0))),
        slice(t, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      val lamOfGram = (g: Column) =>
        coalesce(
          element_at(typedLit(lamMap), pmod(Portable.md5Int(g), lit(buckets.toLong))),
          typedLit(unseen)).cast("decimal(38,12)")
      val score = aggregate(
        transform(concat(t, bigrams), lamOfGram),
        typedLit(java.math.BigDecimal.ZERO).cast("decimal(38,12)"),
        (acc, x) => (acc + x).cast("decimal(38,12)"))
      docs.withColumn("weight", round(score.cast("double"), 6))
    }
  }

  /** The hashed unigram+bigram bucket stream shared by [[dsirWeights]]
    * and [[dsirScorer]]'s model fit: one row per (doc, gram) with its
    * bucket id; pass-through of every non-text column.
    */
  private def gramBuckets(docs: DataFrame, buckets: Int): DataFrame = {
    val n = size(col("t"))
    val bigrams = zip_with(
      slice(col("t"), lit(1), greatest(n - 1, lit(0))),
      slice(col("t"), lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // ~2·tokens explode with an md5 per gram — per-row crypto work
    // dwarfs scan bytes, so widen first (Skew.spreadToCores; hashes
    // and the downstream grouped sums are partition-order invariant)
    graft.functions.Skew.spreadToCores(docs)
      .withColumn("t", split(col("text"), " "))
      .withColumn("g", explode(concat(col("t"), bigrams)))
      .withColumn("b", pmod(Portable.md5Int(col("g")), lit(buckets.toLong)))
      .drop("t", "g", "text")
  }

  /** TEMPERATURE-flattened domain mixing (the multilingual
    * sampling-temperature knob, mT5/XLM-R style): derived targets
    * `target_s ∝ (n_s/N)^(1/T)` over the strata present, then
    * [[domainMix]] downsampling to that mixture at the largest
    * achievable size. T = 1 reproduces the corpus mixture (every rate
    * degenerates to 1), T → ∞ approaches uniform — the heavy-head
    * flattening every multilingual / multi-source training mix uses.
    * Costs one counting pass (C stratum counts to the driver — the
    * [[mixRates]] bounded contract) and then a narrow map-side filter.
    */
  def temperatureMix(df: DataFrame, strata: Column, key: Column,
                     temperature: Double,
                     salt: String = "tmix"): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val counts = df.groupBy(strata.as("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    require(counts.nonEmpty, "temperatureMix needs at least one stratum")
    val total = counts.values.sum
    // pow is the one op here with no cross-libm bit-for-bit guarantee
    // (unlike the +,/,min shape contract of mixRates) — truncate it
    // through DECIMAL(38,12) HALF_UP, the same discipline the ln-based
    // operators use, so a last-ulp libm divergence can't shift a rate
    // and flip a boundary-straddling doc on another engine
    val flat = counts.view
      .mapValues(n => BigDecimal(math.pow(n / total, 1.0 / temperature))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val z = flat.values.sum
    domainMix(df, strata, key, flat.view.mapValues(_ / z).toMap, salt)
  }

  /** Epoch-style mixing with UPSAMPLING: each stratum's rows appear
    * `epochs(s)` times in expectation — `floor(e)` full copies plus one
    * extra copy for the deterministic `e − floor(e)` fraction of keys
    * (so `e < 1` degrades to a Bernoulli downsample, and e.g. `e = 2.25`
    * repeats every row twice and a quarter of rows a third time — the
    * "N epochs of a high-value source per training pass" knob). Output
    * adds `copy_idx` (0-based) so downstream packing/shuffling treats
    * copies as distinct rows. Strata not in `epochs` are dropped.
    * Narrow map-side explode — no shuffle; output rows = Σ eₛ·nₛ.
    */
  /** EXACT-count stratified sample: exactly min(n, |stratum|) rows per
    * stratum, chosen by salted-hash order (ties → key) — the "carve
    * 10k eval docs per language" op, where [[bernoulli]]'s
    * expected-fraction guarantee isn't enough. Rank-based, so
    * membership is NOT stable under corpus growth (a new low-hash row
    * displaces the current rank-n one) — inherent to exact counts;
    * use [[bernoulli]] when stability matters more than exactness.
    *
    * Scale shape: row_number with a CONSTANT cutoff compiles to
    * WindowGroupLimit — every map partition pre-truncates to its local
    * top-n per stratum BEFORE the exchange, so the shuffle carries at
    * most n rows per (stratum, partition), never a stratum's full
    * population (the stratum-skew hazard of naive per-group ranking).
    */
  def stratifiedExact(df: DataFrame, strata: Column, key: Column, n: Int,
                      salt: String = "stratified"): DataFrame = {
    val w = Window.partitionBy(strata)
      .orderBy(Portable.unitHashSalted(key, salt), key)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
  }

  /** Deterministic global training shuffle: assign every row to one of
    * `numShards` shards and a pseudo-random position WITHIN its shard —
    * the reproducible read order a training run consumes (shard files
    * streamed in `shard_pos` order give the same example sequence on
    * every rerun, at any cluster parallelism). Shard membership is
    * `floor(unitHash · N)` (uniform, row-local); in-shard order ranks
    * by an INDEPENDENT salt's hash so position is not correlated with
    * the membership draw. Exactly ONE exchange (the shard_id window
    * partitioning); each shard sorts only its own slice, so the sort
    * parallelism is `numShards` — size shards to executor memory
    * (100 TB / 10k shards = 10 GB spill-safe sorts), never one global
    * sort.
    */
  def trainingShards(df: DataFrame, key: Column, numShards: Int,
                     salt: String = "shards"): DataFrame = {
    require(numShards >= 1, s"numShards must be positive, got $numShards")
    val shard = floor(Portable.unitHashSalted(key, salt) * numShards).cast("int")
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(Portable.unitHashSalted(key, salt + "_pos"), key)
    df.withColumn("shard_id", shard)
      .withColumn("shard_pos", row_number().over(w) - 1)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — published):
    * represent every document as a bag of HASHED n-grams (unigrams +
    * word bigrams folded into `buckets` via the portable md5 hash), fit
    * add-one-smoothed bucket models on the TARGET slice (the
    * distribution you want more of) and the SOURCE remainder, and weight
    * each document by its log importance ratio
    * `Σ_grams [ln p_target(b) − ln p_source(b)]`. Output
    * `(doc_id, weight)` for every document.
    *
    * Determinism: each bucket's log-ratio is truncated to
    * DECIMAL(38,12) (the bigram-NLL discipline — truncation absorbs
    * last-ulp libm differences between engines) and per-doc sums run in
    * DECIMAL, exact and associative at any partitioning; the output
    * rounds to 6 places.
    *
    * Scale shape: narrow explode of the gram stream, ONE hash-agg
    * bounded by `buckets` keys for the models (map-side combine does
    * the heavy lifting — the shuffle is ≤ buckets rows per task),
    * totals as a 1-row broadcast cross join, and the λ table —
    * `buckets` rows — broadcast to the per-gram join, so the only
    * doc-keyed shuffle is the final per-doc sum. No driver action
    * anywhere; model size is corpus-independent by construction (the
    * paper's point: hashing bounds the vocabulary).
    */
  def dsirWeights(documents: DataFrame, isTarget: Column,
                  buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bucketed = gramBuckets(documents.select(col("doc_id"),
      isTarget.as("is_target"), col("text")), buckets)
    val counts = bucketed.groupBy("b").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("sc"))
    val totals = counts.agg(sum("tc").as("tt"), sum("sc").as("st"))
    val lam = counts.crossJoin(broadcast(totals)).select(col("b"),
      (log((col("tc") + lit(1.0)) / (col("tt") + lit(buckets.toDouble))) -
        log((col("sc") + lit(1.0)) / (col("st") + lit(buckets.toDouble))))
        .cast("decimal(38,12)").as("lam"))
    bucketed.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(round(sum(col("lam")).cast("double"), 6).as("weight"))
  }

  /** Gumbel-top-k importance RESAMPLING over [[dsirWeights]]: select
    * `k` documents from the SOURCE slice without replacement with
    * probability ∝ exp(weight) — i.e. ∝ the importance ratio — via the
    * Gumbel-max trick: score = weight + Gumbel(u) with
    * `u = unitHashSalted(doc_id, salt)`, and the k largest scores ARE a
    * weighted sample without replacement. Portable-hash noise makes the
    * draw deterministic (replayable, partitioning-independent) and
    * oracle-able; the top-k is a bounded TakeOrdered, never a global
    * sort.
    */
  def dsirResample(documents: DataFrame, isTarget: Column, k: Int,
                   buckets: Int = 256, salt: String = "dsir"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = dsirWeights(documents, isTarget, buckets)
    val u = Portable.unitHashSalted(col("doc_id"), salt)
    val gumbel = (-log(-log(u))).cast("decimal(38,12)")
    documents.filter(!isTarget).select(col("doc_id"))
      .join(w, Seq("doc_id"))
      .select(col("doc_id"), col("weight"),
        round((col("weight").cast("decimal(38,12)") + gumbel).cast("double"), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def epochMix(df: DataFrame, strata: Column, key: Column,
               epochs: Map[String, Double],
               salt: String = "epoch"): DataFrame = {
    val e = epochs.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (s, v)) => when(strata === lit(s), lit(v)).otherwise(acc) }
    val extra = when(Portable.unitHashSalted(key, salt) < e - floor(e), 1L).otherwise(0L)
    df.withColumn("n_copies", (floor(e) + extra).cast("long"))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }
}
