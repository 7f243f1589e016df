package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4:
  * "custom Catalyst BinaryExpression with doGenCode emitting a primitive
  * loop" — the perf upgrade over the zip_with/aggregate formulation,
  * which allocates an intermediate array per row).
  *
  * Both expressions fold the two arrays element-in-order with a double
  * accumulator — bit-identical to the higher-order-function versions
  * they replace (same IEEE ops in the same order), so every DuckDB
  * oracle stays valid. Inputs may be array<float> or array<double>
  * (embeddings are float32 at rest, query vectors are double);
  * mismatched lengths yield null (the engine's explicit stance against
  * the reference's silent zero-padding, hnsw.cc:29-31/66-72 —
  * SURVEY.md §1.4.1).
  *
  * `doGenCode` keeps the loop inside whole-stage codegen: the generated
  * Java reads primitives straight out of Tungsten `ArrayData` with no
  * boxing and no allocation.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Scala fold step (interpreted path). */
  protected def step(a: Double, b: Double): Double

  /** Java fold step: statement(s) accumulating into `s` from doubles `ax`, `bx`. */
  protected def javaStep(ax: String, bx: String, s: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      val lf = isFloat(left); val rf = isFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        val av = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val bv = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        s += step(av, bv)
        i += 1
      }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val aGet = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bGet = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { ${javaStep(aGet, bGet, s)} }
        ${ev.value} = $s;
      }"""
    })
}

/** Σ (aᵢ - bᵢ)² — squared L2; `sqrt` applied by the caller
  * (reference `Vector::Distance`, hnsw.cc:74-83).
  */
case class L2DistanceSqExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "l2_distance_sq"
  override protected def step(a: Double, b: Double): Double = { val d = a - b; d * d }
  override protected def javaStep(ax: String, bx: String, s: String): String =
    s"final double d = $ax - $bx; $s += d * d;"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2DistanceSqExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ — dot product (cosine building block). */
case class DotProductExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "dot_product"
  override protected def step(a: Double, b: Double): Double = a * b
  override protected def javaStep(ax: String, bx: String, s: String): String =
    s"$s += $ax * $bx;"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
