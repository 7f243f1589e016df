package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.StreamingCuration

/** Mergeable per-source quality-quantile sketch: increments fold to the
  * single-pass sketch exactly (quality is rounded to 6 decimals, so the
  * 1e-6 bins are lossless), thresholds are the exact type-1 quantile,
  * and the sketch-served gate boundary-sandwiches the exact
  * interpolated gate.
  */
class QualitySketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001").cache()

  private def thrMap(t: org.apache.spark.sql.DataFrame): Map[String, Double] =
    t.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("increment-merged sketch == single-pass sketch (thresholds identical)") {
    val parts = Seq(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      docs.filter(pmod(col("doc_id"), lit(3)) === 2))
    val merged = parts.map(TextAnalysis.qualitySketch)
      .reduce(_ unionByName _)
      .groupBy("source", "qbin").agg(sum("c").as("c"))
    val single = TextAnalysis.qualitySketch(docs)
    assert(merged.collect().map(_.toSeq).toSet === single.collect().map(_.toSeq).toSet,
      "cell-wise summed increments must equal the one-shot sketch")
    assert(thrMap(TextAnalysis.thresholdsFromSketch(merged, 0.75))
      === thrMap(TextAnalysis.thresholdsFromSketch(single, 0.75)))
  }

  test("sketch threshold is the exact type-1 (lower) per-source quantile") {
    val scored = docs.select(col("source"),
      TextAnalysis.qualityCol(
        graft.functions.TextFunctions.tokens(col("text")), col("n_chars")).as("quality"))
    val p = 0.75
    val expected = scored.collect().groupBy(_.getString(0)).map { case (s, rows) =>
      val qs = rows.map(_.getDouble(1)).sorted
      s -> qs(math.ceil(p * qs.length).toInt - 1)
    }
    val got = thrMap(TextAnalysis.thresholdsFromSketch(
      TextAnalysis.qualitySketch(docs), p))
    assert(got === expected, "binned rank must reproduce the exact lower quantile")
  }

  test("sketch-served gate boundary-sandwiches the exact interpolated gate") {
    val sketch = TextAnalysis.qualitySketch(docs)
    val keptSketch = TextAnalysis.qualityGateFromSketch(docs, sketch, 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptExact = TextAnalysis.qualityGate(docs, 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptExact.subsetOf(keptSketch),
      "type-1 threshold <= interpolated threshold: the sketch gate keeps a superset")
    // extras sit exactly AT the type-1 threshold (one quality value wide)
    val thr = thrMap(TextAnalysis.thresholdsFromSketch(sketch, 0.75))
    val extras = TextAnalysis.qualityGateFromSketch(docs, sketch, 0.75)
      .filter(!col("doc_id").isin(keptExact.toSeq: _*))
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(extras.forall { case (s, q) => q == thr(s) },
      s"every extra kept row must sit at its source's threshold: ${extras.toSeq}")
  }

  test("streaming maintenance: micro-batch increments serve the batch thresholds") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val fixture = docs.select("doc_id", "text", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dir = java.nio.file.Files.createTempDirectory("qsketch").toString + "/sk"
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = StreamingCuration.maintainQualitySketch(
      mem.toDF().toDF("doc_id", "text", "source", "n_chars"), dir)
    try {
      val (a, b) = fixture.splitAt(fixture.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = thrMap(TextAnalysis.thresholdsFromSketch(
      TextAnalysis.qualitySketchFromDir(spark, dir), 0.75))
    val batch = thrMap(TextAnalysis.thresholdsFromSketch(
      TextAnalysis.qualitySketch(docs), 0.75))
    assert(streamed === batch,
      "thresholds from streamed increments must equal the single-pass sketch's")
  }
}
