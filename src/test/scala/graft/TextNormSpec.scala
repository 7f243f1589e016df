package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNormKernels
import graft.operators.{CorpusPipeline, TextAnalysis}
import graft.streaming.StreamingCuration

/** Fix-text stage: cp1252 mojibake repair + NFC/NFKC normalization
  * ([[graft.functions.TextNormKernels]]) and the full HTML 4.01
  * named-entity table it composes with.
  */
class TextNormSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(i: Int) = Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d")

  test("mojibake repair: single and double encodings recover; clean text is untouchable") {
    def fix(s: String) = TextNormKernels.fixMojibake(s)
    // UTF-8 'caf\u00E9' (63 61 66 C3 A9) read as cp1252 \u2192 "caf\u00C3\u00A9"
    assert(fix("caf\u00C3\u00A9") === "caf\u00E9")
    // the cp1252 0x80-block case: '\u2014' (E2 80 94) read as cp1252 \u2192 "\u00E2\u20AC\u201D"
    assert(fix("a \u00E2\u20AC\u201D b") === "a \u2014 b")
    // DOUBLE mojibake: encode '\u00E9' twice
    val once = new String("\u00E9".getBytes("UTF-8"), "windows-1252")
    val twice = new String(once.getBytes("UTF-8"), "windows-1252")
    assert(fix(twice) === "\u00E9")
    // correctly-decoded text is structurally unrepairable \u2192 untouched
    assert(fix("caf\u00E9") === "caf\u00E9")
    assert(fix("plain ascii") === "plain ascii")
    assert(fix("\u4F60\u597D") === "\u4F60\u597D") // CJK: chars outside cp1252 \u2192 untouched
    // a lone high byte is not valid UTF-8 \u2192 untouched
    assert(fix("\u00E9") === "\u00E9")
  }

  test("normalization: NFC composes, NFKC additionally folds compatibility forms") {
    assert(TextNormKernels.fixText("ne\u0301e", nfkc = false) === "n\u00E9e")
    assert(TextNormKernels.fixText("\uFB01le \uFF21", nfkc = true) === "file A")
    // NFC alone leaves compatibility forms be
    assert(TextNormKernels.fixText("\uFB01le", nfkc = false) === "\uFB01le")
    // NBSP folds to a space under NFKC (post-HTML text hygiene)
    assert(TextNormKernels.fixText("a\u00A0b", nfkc = true) === "a b")
    // repair THEN normalize composes: mojibake'd decomposed sequence
    // (latin-1 read \u2014 0x81 is undefined in real cp1252 and Java decodes
    // it to U+FFFD, which is exactly the damage the repair must refuse;
    // the latin-1 reading is the repairable one)
    val moji = new String("ne\u0301e".getBytes("UTF-8"), "ISO-8859-1")
    assert(TextNormKernels.fixText(moji, nfkc = true) === "n\u00E9e")
  }

  test("full HTML 4.01 entity table: every block decodes; unknown and HTML5-only names stay literal") {
    import org.apache.spark.unsafe.types.UTF8String
    def ext(s: String) = graft.functions.HtmlKernels.visibleText(UTF8String.fromString(s)).toString
    assert(ext("caf&eacute;") === "caf\u00E9")
    assert(ext("&Agrave;&yuml;") === "\u00C0\u00FF") // Latin-1 block ends
    assert(ext("&alpha;&sigmaf;&Omega;&piv;") === "\u03B1\u03C2\u03A9\u03D6")
    assert(ext("&hellip;&trade;&rArr;&there4;&hearts;") === "\u2026\u2122\u21D2\u2234\u2665")
    assert(ext("&OElig;&euro;&mdash;&permil;") === "\u0152\u20AC\u2014\u2030")
    assert(ext("x&nbsp;y") === "x y") // extraction semantics: word separator
    assert(ext("&notanentity; &CounterClockwiseContourIntegral;")
      === "&notanentity; &CounterClockwiseContourIntegral;")
    assert(graft.functions.HtmlKernels.namedEntities.size >= 250,
      "the table must carry the full HTML 4.01 list")
  }

  test("fix_text SQL registration + curate(normalize) \u2261 curate over pre-fixed text") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT fix_text('caf\u00C3\u00A9')").head.getString(0)
      === "caf\u00E9")
    assert(spark.sql("SELECT fix_text('\uFB01ne')").head.getString(0) === "fine")
    // MIXED damage declines repair (the whole-string contract: a
    // ligature is not cp1252-mappable, so the string is provably not a
    // cp1252 reading) but still NFKC-folds
    assert(spark.sql("SELECT fix_text('caf\u00C3\u00A9 \uFB01ne')").head.getString(0)
      === "caf\u00C3\u00A9 fine")
    // corpus with injected damage: the normalize flag must curate
    // exactly like running the kernel as a pre-pass
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" caf\u00C3\u00A9 the the")))
          .otherwise(col("text")))
    val prefixed = docs.withColumn("text", TextAnalysis.fixText(col("text")))
    def stats(d: org.apache.spark.sql.DataFrame, normalize: Boolean) =
      CorpusPipeline.curate(d, "en", 0.1, 0.5, normalize = normalize)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats(docs, normalize = true) === stats(prefixed, normalize = false),
      "the normalize flag must equal an explicit fix-text pre-pass")
  }

  test("curateStream(normalize) twin \u2261 batch stages over damaged text") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 60)
      .select("doc_id", "text", "n_chars")
      .collect().map { r =>
        val id = r.getLong(0)
        val tx = r.getString(1) +
          (if (id % 4 == 0) " caf\u00C3\u00A9"
           else if (id % 4 == 1) " \uFB01ne" else "")
        (id, tx, r.getLong(2))
      }.sortBy(_._1)
    val mem = MemoryStream[(Timestamp, Long, String, Long)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text", "n_chars")
    val q = StreamingCuration.curateStream(docs, lang = "en", minQuality = 0.3,
        watermark = "1 hour", normalize = true)
      .writeStream.format("memory").queryName("norm_curated_out")
      .outputMode("append").start()
    try {
      mem.addData(fixture.zipWithIndex.map { case ((id, tx, nc), i) =>
        (t(i), id, tx, nc)
      }.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("norm_curated_out").select("text").collect()
        .map(_.getString(0)).toSet
      val batchDocs = fixture.toSeq.toDF("doc_id", "text", "n_chars")
        .withColumn("text", TextAnalysis.fixText(col("text")))
      val kept1 = CorpusPipeline.filtered(batchDocs, "en", 0.3)
      val batch = kept1.join(graft.operators.Dedup.exactKept(kept1), Seq("doc_id"))
        .select("text").collect().map(_.getString(0)).toSet
      assert(batch.nonEmpty)
      assert(streamed === batch,
        "normalized streaming curation must keep exactly the batch stages' texts")
      assert(streamed.exists(_.contains("caf\u00E9")),
        "repaired text must be what survives, not the damaged form")
    } finally q.stop()
  }
}
