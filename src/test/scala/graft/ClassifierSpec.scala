package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** Laws for the in-engine GD classifier: the algebraic sigmoid's
  * range/monotonicity, learning on a separable fixture, the
  * scores/weights consistency, and — the property the oracle hash
  * rides on — bit-identical training results at ANY partition count.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val featTerms = Seq("good", "bad")

  // Separable fixture: label term "pos" co-occurs with "good"; docs
  // without it carry "bad". Varied repetition so tf features spread.
  private lazy val docs = (0L until 120L).map { i =>
    val rep = 1 + (i % 4).toInt
    val text =
      if (i % 3 == 0) ("good " * rep).trim + " filler pos"
      else ("bad " * rep).trim + " filler"
    (i, text)
  }.toDF("doc_id", "text").cache()

  test("squash is the algebraic sigmoid: bounded to (0,1), monotone, 0 -> 0.5") {
    val xs = Seq(-100.0, -2.0, -0.5, 0.0, 0.5, 2.0, 100.0).toDF("m")
      .select(Classifier.squash(col("m")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(xs == xs.sorted, "monotone in the margin")
    assert(xs.forall(p => p > 0 && p < 1))
    assert(xs(3) == 0.5)
  }

  test("training separates the separable fixture: positive-term weight up, loss down") {
    val w = Classifier.train(docs, "pos", featTerms, rounds = 6).head()
    val w1 = w.getDecimal(1).doubleValue() // "good" tf weight
    val w2 = w.getDecimal(2).doubleValue() // "bad" tf weight
    assert(w1 > 0, s"weight on the co-occurring term must rise (got $w1)")
    assert(w2 < 0, s"weight on the negative term must fall (got $w2)")
    // scores order the classes correctly
    val s = Classifier.scores(docs, "pos", featTerms, rounds = 6)
    val byClass = s.groupBy("y").agg(avg("score").as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(byClass(1.0) > byClass(0.0) + 0.2,
      s"mean positive score must clearly exceed mean negative (got $byClass)")
  }

  test("training is partition-order-free: identical weights at 1 and 7 partitions") {
    val a = Classifier.train(docs.repartition(1), "pos", featTerms, rounds = 4).head()
    val b = Classifier.train(docs.repartition(7), "pos", featTerms, rounds = 4).head()
    (0 to featTerms.size).foreach { j =>
      assert(a.getDecimal(j) == b.getDecimal(j),
        s"w$j drifted across partitionings: ${a.getDecimal(j)} vs ${b.getDecimal(j)}")
    }
  }

  test("scores are squash(margin) under the trained weights, rounded") {
    val w = Classifier.train(docs, "pos", featTerms, rounds = 3).head()
    val ws = (0 to featTerms.size).map(j => w.getDecimal(j))
    val feats = Classifier.features(docs, "pos", featTerms).collect()
    val expected = feats.map { r =>
      val m = (ws(0).add(ws(1).multiply(java.math.BigDecimal.valueOf(r.getLong(2))))
        .add(ws(2).multiply(java.math.BigDecimal.valueOf(r.getLong(3)))))
        .doubleValue()
      val p = 0.5 + 0.5 * m / (1.0 + math.abs(m))
      r.getLong(0) -> BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    Classifier.scores(docs, "pos", featTerms, rounds = 3).collect().foreach { r =>
      assert(r.getDouble(2) == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: ${r.getDouble(2)} != ${expected(r.getLong(0))}")
    }
  }

  test("scorer (frozen weights) == batch scores, and runs on a stream statelessly") {
    val batch = Classifier.scores(docs, "pos", featTerms, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val frozen = Classifier.scorer(docs, "pos", featTerms, rounds = 4)
    val viaCol = docs.select(col("doc_id"), frozen.as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCol === batch, "frozen-literal scorer must equal the crossJoined form")
    // same column over a document stream: stateless narrow projection
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), frozen.as("score"))
    val q = streamed.writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      mem.addData((7L, "good good filler pos"), (8L, "bad filler"))
      q.processAllAvailable()
      val got = spark.table("clf_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expect = Seq((7L, "good good filler pos"), (8L, "bad filler"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), frozen.as("score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === expect, "streamed scores must equal batch scores row-for-row")
    } finally q.stop()
  }

  test("training plan has no corpus-keyed exchange: one-row aggregates + broadcasts only") {
    val plan = Classifier.scores(docs, "pos", featTerms, rounds = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"GD rounds must shuffle only one-row partial sums (SinglePartition), never corpus keys:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "the weights row must broadcast back onto the feature projection")
  }

  test("feature/rounds guards fail fast") {
    intercept[IllegalArgumentException] {
      Classifier.train(docs, "pos", Seq.empty, rounds = 2)
    }
    intercept[IllegalArgumentException] {
      Classifier.train(docs, "pos", featTerms, rounds = 0)
    }
  }
}
