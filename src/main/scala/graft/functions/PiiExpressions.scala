package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Regex span kernel shared by the interpreted and generated paths of
  * [[RegexpSpansExpr]]. One `Matcher` sweep per row; offsets are Java
  * `String` char indices (== byte offsets on the ASCII corpora these
  * operators curate).
  */
object PiiKernels {
  def spans(s: UTF8String, p: Pattern): ArrayData = {
    val str = s.toString
    val m = p.matcher(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (m.find()) {
      out += InternalRow(m.start(), m.end(), UTF8String.fromString(m.group()))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Luhn mod-10 over the digits of `s`, ignoring spaces and dashes:
    * true iff the digit count is in [12, 19] (the PAN length range),
    * no other characters appear, and the checksum holds. One pass,
    * right-to-left, no allocation.
    */
  def luhnValid(s: UTF8String): Boolean = {
    val str = s.toString
    var sum = 0
    var nDigits = 0
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        val d = c - '0'
        val v = if ((nDigits & 1) == 1) { val t = d * 2; if (t > 9) t - 9 else t }
          else d
        sum += v
        nDigits += 1
      } else if (c != ' ' && c != '-') return false
      i -= 1
    }
    nDigits >= 12 && nDigits <= 19 && sum % 10 == 0
  }
}

/** All match spans of a constant regex over a string column in one
  * matcher sweep: `array<struct<start int, stop int, pii string>>`
  * ([start, stop) char offsets, leftmost-first match order — Java
  * `Matcher.find` semantics, same as RE2 for the lookaround-free
  * PII patterns this engine ships).
  *
  * The pattern child must be foldable (compiled once at plan build,
  * shipped as a reference object); the per-row call is one static
  * method inside whole-stage codegen — same shape as Spark's own
  * `RegExpExtractAll`.
  */
case class RegexpSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "regexp_spans"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("stop", IntegerType, nullable = false),
    StructField("pii", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName pattern must be a literal")
    else if (right.eval() == null)
      // A foldable NULL (e.g. CAST(NULL AS STRING)) passes the type check
      // but would NPE when the lazy matcher compiles — reject at analysis,
      // matching Spark's own RegExpExtractAll behavior.
      TypeCheckResult.TypeCheckFailure(s"$prettyName pattern must not be null")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val pattern: Pattern =
    Pattern.compile(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, p: Any): Any =
    PiiKernels.spans(s.asInstanceOf[UTF8String], pattern)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", pattern, classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.functions.PiiKernels.spans($s, $patRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpSpansExpr =
    copy(left = newLeft, right = newRight)
}

/** Luhn checksum validation for card-shaped PII candidates:
  * `luhn_check(str) → boolean`. True iff the string holds 12-19 digits
  * (spaces and dashes allowed as separators, anything else fails) whose
  * Luhn mod-10 checksum is zero — upgrades the regex card rule from
  * "digit-shaped" to "checksum-valid", the standard false-positive
  * filter for PAN detection. Codegen: one static kernel call inside
  * whole-stage codegen, no allocation per row.
  */
case class LuhnCheckExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "luhn_check"

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    PiiKernels.luhnValid(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.PiiKernels.luhnValid($s)")

  override protected def withNewChildInternal(newChild: Expression): LuhnCheckExpr =
    copy(child = newChild)
}
