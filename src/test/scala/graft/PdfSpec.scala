package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfCodec

/** From-spec PDF text extraction: every structural variant (literal /
  * Flate / Contents-array / TJ / Identity-H+ToUnicode) across both
  * file layouts (classic xref table, xref stream + packed ObjStm,
  * with and without PNG predictor 12) must extract the closed-form
  * text; damage must skip, and a destroyed xref must fall back to the
  * brute object scan.
  */
class PdfSpec extends AnyFunSuite {

  private val text = "the quick brown fox jumps over the lazy dog"

  test("every variant x layout extracts the closed-form text") {
    (0L until 20L).filter(_ % 9 != 7).foreach { id =>
      val pdf = PdfCodec.pdfOf(id, text)
      val got = PdfCodec.extractText(pdf)
      assert(got === Some(PdfCodec.shownTextOf(id, text)),
        s"doc $id (variant ${id % 5}, layout ${id % 2}, predictor ${id % 4 == 3})")
    }
  }

  test("literal-string escapes round-trip: parens, backslash, control chars") {
    val tricky = "parens (nested (deep)) back\\slash tab\there nl\nthere"
    // v0 literal and v3 TJ-array both route through escapeLiteral
    Seq(0L, 3L).foreach { id =>
      val got = PdfCodec.extractText(PdfCodec.pdfOf(id, tricky))
      assert(got === Some(PdfCodec.shownTextOf(id, tricky)), s"variant $id")
    }
  }

  test("Identity-H: bfchar and offset bfrange both map; odd trailing byte ignored") {
    val cmap = PdfCodec.parseToUnicode(
      ("""1 beginbfchar
         |<0001> <0041>
         |endbfchar
         |2 beginbfrange
         |<0010> <001F> <0061>
         |<0100> <01FF> <2460>
         |endbfrange""").stripMargin.getBytes("ISO-8859-1"))
    assert(cmap.map(0x0001) === Some("A"))
    assert(cmap.map(0x0010) === Some("a"))
    assert(cmap.map(0x001F) === Some("p"))
    assert(cmap.map(0x0105) === Some("⑥"))
    assert(cmap.map(0x9999) === None)
  }

  test("damage skips: garbage body, truncation, corrupt content stream") {
    // the planted corpus damage variant
    assert(PdfCodec.extractText(PdfCodec.pdfOf(7L, text)) === None)
    // not a PDF at all
    assert(PdfCodec.extractText("hello world".getBytes("UTF-8")) === None)
    assert(PdfCodec.extractText(Array.empty[Byte]) === None)
    // a valid PDF truncated mid-file must not throw
    val whole = PdfCodec.pdfOf(0L, text)
    (1 until 10).foreach { k =>
      PdfCodec.extractText(java.util.Arrays.copyOfRange(whole, 0, whole.length * k / 10))
    }
    // Flate content stream corrupted in place: the page damage-skips,
    // the document yields no text -> None
    val flate = PdfCodec.pdfOf(6L, text) // v1: Flate content, classic layout
    val s = new String(flate, "ISO-8859-1")
    val at = s.indexOf("stream\n") + 7
    val broken = flate.clone()
    (at until math.min(at + 12, broken.length)).foreach(i => broken(i) = 'X'.toByte)
    assert(PdfCodec.extractText(broken) === None)
  }

  test("destroyed xref falls back to the brute object scan") {
    val pdf = PdfCodec.pdfOf(0L, text) // classic layout
    val s = new String(pdf, "ISO-8859-1")
    val at = s.lastIndexOf("startxref")
    val broken = pdf.clone()
    // overwrite the startxref offset digits with an out-of-range value
    val numStart = at + "startxref\n".length
    (numStart until numStart + 4).foreach(i => broken(i) = '9'.toByte)
    assert(PdfCodec.extractText(broken) === Some(PdfCodec.shownTextOf(0L, text)),
      "a damaged cross-reference must recover through the object scan")
  }

  test("PNG predictor decode: Up-filtered rows reconstruct exactly") {
    val cols = 7
    val rows = Array.tabulate(4 * cols)(i => ((i * 37 + 11) & 0xff).toByte)
    val pred = new java.io.ByteArrayOutputStream()
    (0 until 4).foreach { r =>
      pred.write(2)
      (0 until cols).foreach { i =>
        val up = if (r > 0) rows((r - 1) * cols + i) & 0xff else 0
        pred.write(((rows(r * cols + i) & 0xff) - up) & 0xff)
      }
    }
    assert(PdfCodec.unpredictPng(pred.toByteArray, cols).toSeq === rows.toSeq)
  }
}
