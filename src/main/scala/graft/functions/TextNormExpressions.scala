package graft.functions

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text normalization / encoding repair — the fix-text stage every real
  * pipeline runs between HTML extraction and language ID (the ftfy
  * contract, JDK-only):
  *
  *  1. MOJIBAKE REPAIR: text that was UTF-8 on the wire but decoded as
  *     Latin-1/cp1252 somewhere upstream ("cafÃ©") round-trips back —
  *     map every char to its cp1252 byte and re-decode STRICT UTF-8;
  *     the repair applies only when the whole string maps and decodes
  *     cleanly (a genuine "é" is the byte 0xE9, invalid alone as UTF-8,
  *     so correctly-decoded text is untouchable by construction). Two
  *     rounds, for double-encoded text.
  *  2. UNICODE NORMALIZATION: `java.text.Normalizer` NFC (canonical
  *     compose — combining sequences collapse) or NFKC (adds
  *     compatibility folding: ligatures, fullwidth forms, NBSP → space)
  *     — the form the published dedup/lang-ID stages assume.
  *
  * Deterministic per-row string → string; no locale, no RNG.
  */
object TextNormKernels {

  /** cp1252's 0x80–0x9F graphical block (the non-Latin-1 positions):
    * char → byte, for the reverse mapping the repair needs.
    */
  private val cp1252Reverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](40)
    val pts = Array(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    pts.foreach { case (b, cp) => m.put(cp.toChar, b) }
    m
  }

  /** One repair attempt: null when the string is not a clean cp1252
    * reading of valid UTF-8 bytes (i.e. not mojibake).
    */
  private def tryRepair(s: String): String = {
    var hasHigh = false
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) hasHigh = true
      if (c < 0x100) bytes(i) = c.toByte
      else {
        val b = cp1252Reverse.get(c)
        if (b == null) return null
        bytes(i) = b.byteValue()
      }
      i += 1
    }
    if (!hasHigh) return null // pure ASCII: nothing to repair
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Repair up to two rounds of UTF-8-as-cp1252 mojibake; text that is
    * not mojibake passes through untouched.
    */
  def fixMojibake(s: String): String = {
    var cur = s
    var rounds = 0
    var repaired = tryRepair(cur)
    while (repaired != null && rounds < 2) {
      cur = repaired
      rounds += 1
      repaired = if (rounds < 2) tryRepair(cur) else null
    }
    cur
  }

  /** The full fix-text stage: mojibake repair, then NFC or NFKC. */
  def fixText(s: String, nfkc: Boolean): String =
    java.text.Normalizer.normalize(fixMojibake(s),
      if (nfkc) java.text.Normalizer.Form.NFKC else java.text.Normalizer.Form.NFC)

  def fixTextU(s: UTF8String, nfkc: Boolean): UTF8String =
    UTF8String.fromString(fixText(s.toString, nfkc))
}

/** `fix_text(text[, nfkc]) → string`: [[TextNormKernels.fixText]] as a
  * codegen Catalyst expression — one static kernel call inside
  * whole-stage codegen, shuffle-free wherever it is projected.
  */
case class FixTextExpr(child: Expression, nfkc: Boolean = true)
    extends UnaryExpression {

  override def prettyName: String = "fix_text"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    TextNormKernels.fixTextU(s.asInstanceOf[UTF8String], nfkc)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextNormKernels.fixTextU($s, $nfkc)")

  override protected def withNewChildInternal(newChild: Expression): FixTextExpr =
    copy(child = newChild)
}
