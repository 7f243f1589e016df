package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** In-engine TRAINABLE quality/relevance classifier — a linear model
  * fit by `rounds` unrolled full-batch gradient-descent passes, run as
  * declarative rounds (the [[Bpe]] pattern: each round is one
  * aggregation; the whole training run is a single lazy plan with no
  * driver-side math). The pipeline story: label a slice of the corpus
  * (here: contains a topical anchor term), featurize cheaply (per-row
  * term frequencies), train IN the engine, then score the full corpus
  * with the frozen weights — no export to an external trainer for the
  * simple relevance/quality gates that guard a 100-TB ingest.
  *
  * Model: p(x) = σ̃(w·x) with the ALGEBRAIC sigmoid
  *   σ̃(m) = 0.5 + 0.5·m/(1+|m|)
  * rather than the logistic 1/(1+e^{-m}). Deliberate: σ̃ uses only
  * +, ×, ÷, |·| — all IEEE-754 correctly-rounded in every engine —
  * so per-row probabilities are BIT-IDENTICAL across engines, whereas
  * exp() carries no cross-libm rounding guarantee (the same reasoning
  * that keeps exp out of every oracle-hashed path in this codebase).
  * σ̃ is the standard "fast sigmoid" squashing function; the update
  * below is plain least-effort gradient descent on the squared error
  * of σ̃ — the point is the in-engine training HARNESS, not logistic
  * maximum likelihood.
  *
  * Update (per round, learning rate η):
  *   g_j = Σ_d (p_d − y_d)·x_{jd} / N        w_j ← w_j − η·g_j
  *
  * Determinism contract (how the oracle hash survives partitioning):
  *  - weights live in DECIMAL(18,12); margins are exact decimal
  *    arithmetic (weight × small-int feature) cast to double once;
  *  - each row's gradient contribution (p−y)·x_j is IEEE double math,
  *    truncated to DECIMAL(38,12) BEFORE the sum — the sum is then
  *    exact and partition-order-free;
  *  - the step η·(Σ/N) is double math over exact inputs, cast back to
  *    DECIMAL(18,12) — one deterministic rounding per weight per round.
  *
  * Scale shape: featurization is a narrow projection; each round is
  * ONE hash aggregate over it producing a single row (map-side
  * partial sums; the shuffle carries one row per task), crossJoined
  * back as a broadcast. `rounds` is a constant (6 here), so the plan
  * is `rounds` sequential scans of the narrow feature projection — at
  * 100 TB the feature projection is what a real run would checkpoint
  * once, and every round after that is column-pruned scan + one-row
  * agg. Weights never exceed one broadcastable row.
  */
object Classifier {

  /** Narrow feature projection: `(doc_id, y, x1..xF)` — y = 1.0 iff
    * the document contains `labelTerm`; x_j = tf(featTerms(j)).
    */
  def features(documents: DataFrame, labelTerm: String,
               featTerms: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val xCols = featTerms.zipWithIndex.map { case (t, j) =>
      size(filter(toks, x => x === t)).cast("long").as(s"x${j + 1}")
    }
    documents.select(
      col("doc_id") +:
        when(array_contains(toks, labelTerm), 1.0).otherwise(0.0).as("y") +:
        xCols: _*)
  }

  /** The algebraic sigmoid σ̃(m) = 0.5 + 0.5·m/(1+|m|). */
  def squash(m: Column): Column =
    lit(0.5) + lit(0.5) * m / (lit(1.0) + abs(m))

  /** Margin w·x as EXACT decimal arithmetic, cast to double once.
    * Feature columns are capped at DECIMAL(6,0) so the product/sum
    * chain stays inside both engines' 38-digit ceiling.
    */
  private def marginCol(nFeat: Int): Column =
    cast18(
      (1 to nFeat).foldLeft(col("w0")) { (acc, j) =>
        acc + col(s"w$j") * col(s"x$j").cast("decimal(6,0)")
      }).cast("double")

  private def cast18(c: Column): Column = c.cast("decimal(18,12)")

  /** Train for `rounds` full-batch GD rounds from w = 0. Returns the
    * ONE-ROW weights frame `(w0..wF)` as DECIMAL(18,12) — the whole
    * chain is lazy; nothing executes until the caller acts.
    */
  def train(documents: DataFrame, labelTerm: String, featTerms: Seq[String],
            rounds: Int, lr: Double = 0.5): DataFrame = {
    require(rounds >= 1, "at least one training round")
    require(featTerms.nonEmpty && featTerms.size <= 16,
      "1..16 features: the weights row and margin expression grow with F")
    val nFeat = featTerms.size
    // LAZY localCheckpoint (r17): every GD round's gradient aggregation
    // embeds the features subtree, so an uncut corpus is re-scanned and
    // re-tokenized once per round (6× here) inside the one composed
    // plan. The cut materializes on round 1's aggregation and rounds
    // 2..k read blocks — the chain stays lazy (nothing executes until
    // the caller acts); features are 2+F small columns per doc.
    // localCheckpoint, not persist(): persist is plan-keyed, so its
    // blocks would serve the NEXT run of the same query (cross-run
    // caching the bench contract forbids); the checkpoint is RDD-keyed
    // and private to this run.
    val feats = features(documents, labelTerm, featTerms).localCheckpoint(false)
    val zero = lit(0).cast("decimal(18,12)")
    var w: DataFrame = feats.sparkSession.range(1)
      .select((0 to nFeat).map(j => zero.as(s"w$j")): _*)
    for (_ <- 1 to rounds) {
      val p = squash(marginCol(nFeat))
      val gradCols = (0 to nFeat).map { j =>
        val xj = if (j == 0) lit(1.0) else col(s"x$j").cast("double")
        sum(((p - col("y")) * xj).cast("decimal(38,12)")).as(s"g$j")
      }
      val carryW = (0 to nFeat).map(j => max(col(s"w$j")).as(s"w$j"))
      val g = feats.crossJoin(broadcast(w))
        .agg(count(lit(1)).as("n"), (gradCols ++ carryW): _*)
      w = g.select((0 to nFeat).map { j =>
        cast18(col(s"w$j") -
          cast18(lit(lr) * (col(s"g$j").cast("double") / col("n").cast("double"))))
          .as(s"w$j")
      }: _*)
    }
    w
  }

  /** Corpus scored under the trained weights:
    * `(doc_id, y, score)` with score = σ̃(w·x) rounded to 6 dp.
    */
  def scores(documents: DataFrame, labelTerm: String, featTerms: Seq[String],
             rounds: Int, lr: Double = 0.5): DataFrame = {
    val w = train(documents, labelTerm, featTerms, rounds, lr)
    features(documents, labelTerm, featTerms)
      .crossJoin(broadcast(w))
      .select(col("doc_id"), col("y"),
        round(squash(marginCol(featTerms.size)), 6).as("score"))
  }

  /** Trained weights as doubles for the declared query surface:
    * one row, `(w0..wF)` rounded to 6 dp.
    */
  def weights(documents: DataFrame, labelTerm: String, featTerms: Seq[String],
              rounds: Int, lr: Double = 0.5): DataFrame = {
    val w = train(documents, labelTerm, featTerms, rounds, lr)
    w.select((0 to featTerms.size).map(j =>
      round(col(s"w$j").cast("double"), 6).as(s"w$j")): _*)
  }

  /** STREAMING-ready scorer (the bm25Scorer pattern): train ONCE on
    * the (batch) reference corpus, collect the weights, and freeze
    * them into the returned column as LITERALS — scoring an incoming
    * document stream is then a stateless narrow projection over
    * `text` (no agg, no join): `readStream → select(score) → route`
    * is the ingest-time quality/relevance gate. Identical arithmetic
    * to [[scores]] (decimal margin from the same frozen decimals →
    * double → σ̃ → round), so batch and streamed scores are equal —
    * spec-pinned. Weight staleness is the caller's retrain policy,
    * exactly like an ANN index generation.
    */
  def scorer(referenceCorpus: DataFrame, labelTerm: String,
             featTerms: Seq[String], rounds: Int, lr: Double = 0.5): Column = {
    val row = train(referenceCorpus, labelTerm, featTerms, rounds, lr).head()
    val toks = tokens(col("text"))
    val margin = cast18(
      featTerms.zipWithIndex.foldLeft(
        lit(row.getDecimal(0)).cast("decimal(18,12)"): Column) { case (acc, (t, j0)) =>
        acc + lit(row.getDecimal(j0 + 1)).cast("decimal(18,12)") *
          size(filter(toks, x => x === t)).cast("decimal(6,0)")
      }).cast("double")
    round(squash(margin), 6)
  }
}
