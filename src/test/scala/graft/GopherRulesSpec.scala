package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The Gopher rule bundle (Rae et al. 2021 table A1, the subset that
  * isn't line-structured): each signal computed independently here in
  * driver-side Scala and compared against the operator's codegen
  * columns, plus per-rule kill cases for the composite flag.
  */
class GopherRulesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
                  minWords: Int = 50, minStop: Int = 2) =
    TextAnalysis.gopherRules(
        rows.toDF("doc_id", "text"), minWords = minWords, minStopwords = minStop)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getBoolean(5))))
      .toMap

  test("signals match independent computation") {
    val text = "the quick brown fox jumps over a lazy dog of doom"
    val m = run(Seq((1L, text)), minWords = 5)
    val words = text.split(" ")
    val meanLen = math.rint(words.map(_.length).sum.toDouble / words.length * 1e6) / 1e6
    val fracAlpha = 1.0 // every word has a letter
    val nStop = words.count(Set("the", "a", "and", "of", "to"))
    assert(m(1L) == ((words.length, meanLen, fracAlpha, nStop, true)))
  }

  test("each rule kills the composite on its own") {
    val passing = "the cat and the hat went to a very fine show today yes" // 13 words
    val rows = Seq(
      1L -> passing,                                        // passes at minWords=5
      2L -> "the a of",                                     // too few words
      3L -> ("the of " + Seq.fill(20)("incomprehensibilities").mkString(" ")), // mean len > 10
      4L -> ("the of " + Seq.fill(20)("aa 11 22 33 44").mkString(" ")),        // alpha frac < 0.8
      5L -> "cat hat bat mat sat rat fat pat vat gnat")     // no stopwords
    val m = run(rows, minWords = 5)
    assert(m(1L)._5, "baseline doc must pass")
    for (id <- 2L to 5L) assert(!m(id)._5, s"doc $id must fail its rule")
    // and the failing signal is the expected one
    assert(m(2L)._1 < 5)
    assert(m(3L)._2 > 10.0)
    assert(m(4L)._3 < 0.8)
    assert(m(5L)._4 < 2)
  }

  test("plan stays narrow: no exchange, scan-fused projection") {
    val df = TextAnalysis.gopherRules(
      Seq((1L, "the a to")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRules must not shuffle:\n$plan")
  }
}
