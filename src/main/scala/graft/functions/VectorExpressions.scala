package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
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
  * SURVEY.md §1.4.1), and so does a null ELEMENT — reading one as
  * 0.0/garbage would be the same silent corruption in disguise. The
  * per-element null check is emitted only when the input type says
  * `containsNull=true`; arrays whose schema guarantees dense elements
  * pay nothing.
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

  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
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
      val lnul = mayHaveNullElems(left); val rnul = mayHaveNullElems(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        if ((lnul && a.isNullAt(i)) || (rnul && b.isNullAt(i))) return null
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
      // specialized away entirely when the schema says containsNull=false
      val nullChecks = Seq(
        if (mayHaveNullElems(left)) Some(s"$a.isNullAt($i)") else None,
        if (mayHaveNullElems(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val elemGuard = if (nullChecks.isEmpty) ""
        else s"if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { $elemGuard ${javaStep(aGet, bGet, s)} }
        if (!${ev.isNull}) { ${ev.value} = $s; }
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

/** All m PQ codes of one vector in a single codegen pass: for each
  * subspace `s`, the id of the nearest codebook centroid to elements
  * `[s·subDim, (s+1)·subDim)` of the input, squared-L2, double
  * accumulation element-in-order, ties to the smaller centroid id —
  * bit-identical to the `array_min(array(struct(dist, cid)…))` literal
  * formulation it replaces, but the codebooks ride as ONE reference
  * object (`books[s][cid][i]`, flattened to a `double[]`) instead of
  * m·c struct literals in the plan. At production codebook sizes
  * (m=16, c=256 → 4096 argmin candidates) the literal form risks
  * plan-size/codegen-method limits; this form is O(1) plan nodes
  * regardless of m·c and the whole encode stays one whole-stage-codegen
  * projection (no join, no shuffle — the shape PQ encode needs over
  * 100 TB of vectors).
  *
  * Input may be array<float> (embeddings at rest) or array<double>
  * (normalized/query-side). A vector whose length ≠ m·subDim yields
  * null — the engine's explicit stance against the reference's silent
  * zero-padding (hnsw.cc:29-31/66-72, SURVEY.md §1.4.1).
  */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val c = books.headOption.map(_.length).getOrElse(0)
  private val subDim = books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  require(m > 0 && c > 0 && subDim > 0, "pq_encode needs a non-empty m x c x subDim codebook")
  require(books.forall(b => b.length == c && b.forall(_.length == subDim)),
    "pq_encode codebook must be rectangular: every subspace c centroids of subDim dims")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // Render a compact descriptor instead of m·c·subDim doubles — plan
  // strings (explain/UI/logs) must not grow with codebook size.
  override def flatArguments: Iterator[Any] =
    Iterator(child, s"books(m=$m, c=$c, subDim=$subDim)")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  // Flattened [s][cid][i] -> [(s*c + cid)*subDim + i]; one JVM object
  // shared by every row (and shipped once per task via the codegen
  // reference table), never serialized into the plan tree.
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * c * subDim)
    var s = 0
    while (s < m) {
      var cid = 0
      while (cid < c) {
        val cv = books(s)(cid)
        var i = 0
        while (i < subDim) { a((s * c + cid) * subDim + i) = cv(i); i += 1 }
        cid += 1
      }
      s += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) null
    // a null ELEMENT yields null too — never read as 0.0 (same stance
    // as the dim-mismatch rule; check skipped when containsNull=false)
    else if (mayHaveNullElems && (0 until m * subDim).exists(a.isNullAt)) null
    else {
      val fl = isFloat
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = Double.PositiveInfinity
        var bc = 0
        var cid = 0
        while (cid < c) {
          val base = (s * c + cid) * subDim
          var acc = 0.0
          var i = 0
          while (i < subDim) {
            val av = if (fl) a.getFloat(s * subDim + i).toDouble else a.getDouble(s * subDim + i)
            val d = av - flat(base + i)
            acc += d * d
            i += 1
          }
          if (acc < best) { best = acc; bc = cid }
          cid += 1
        }
        codes(s) = bc
        s += 1
      }
      UnsafeArrayData.fromPrimitiveArray(codes)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val cid = ctx.freshName("cid"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bc = ctx.freshName("bc")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val get = if (isFloat) s"(double) $a.getFloat($s * $subDim + $i)"
                else s"$a.getDouble($s * $subDim + $i)"
      // null-element pre-scan, specialized away when containsNull=false
      val j = ctx.freshName("j")
      val nullScan = if (!mayHaveNullElems) "" else
        s"for (int $j = 0; $j < ${m * subDim}; $j++) " +
          s"{ if ($a.isNullAt($j)) { ${ev.isNull} = true; break; } }"
      s"""
      if ($a.numElements() != ${m * subDim}) {
        ${ev.isNull} = true;
      } else {
        $nullScan
        if (!${ev.isNull}) {
          final int[] $codes = new int[$m];
          for (int $s = 0; $s < $m; $s++) {
            double $best = Double.POSITIVE_INFINITY; int $bc = 0;
            for (int $cid = 0; $cid < $c; $cid++) {
              final int $base = ($s * $c + $cid) * $subDim;
              double $acc = 0.0;
              for (int $i = 0; $i < $subDim; $i++) {
                final double $d = $get - $booksRef[$base + $i];
                $acc += $d * $d;
              }
              if ($acc < $best) { $best = $acc; $bc = $cid; }
            }
            $codes[$s] = $bc;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
        }
      }"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** The per-query ADC lookup table, computed ON THE EXECUTORS: for a
  * query vector, returns the FLATTENED m·c double array with
  * `lut[s·c + j] = ‖query_s − books[s][j]‖²` (squared L2 of subspace
  * `s` of the query against centroid `j`, double accumulation
  * element-in-order — the same IEEE ops in the same order as
  * [[L2DistanceSqExpr]] and the driver-side LUT of the single-query
  * ADC path, so batch and single serving score identically).
  *
  * This is what makes BATCH ADC distributed: Q queries each produce
  * their own m·c-double LUT row map-side (no driver loop, no Q·m·c
  * plan literals), which then broadcast-joins against the stored code
  * table. Codebooks ride as one reference object, exactly like
  * [[PqEncodeExpr]]. A query whose length ≠ m·subDim yields null, and
  * so does one carrying a null element (same stance as the encode).
  */
case class PqLutExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val c = books.headOption.map(_.length).getOrElse(0)
  private val subDim = books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  require(m > 0 && c > 0 && subDim > 0, "pq_lut needs a non-empty m x c x subDim codebook")
  require(books.forall(b => b.length == c && b.forall(_.length == subDim)),
    "pq_lut codebook must be rectangular: every subspace c centroids of subDim dims")

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def flatArguments: Iterator[Any] =
    Iterator(child, s"books(m=$m, c=$c, subDim=$subDim)")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * c * subDim)
    var s = 0
    while (s < m) {
      var cid = 0
      while (cid < c) {
        val cv = books(s)(cid)
        var i = 0
        while (i < subDim) { a((s * c + cid) * subDim + i) = cv(i); i += 1 }
        cid += 1
      }
      s += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) null
    else if (mayHaveNullElems && (0 until m * subDim).exists(a.isNullAt)) null
    else {
      val fl = isFloat
      val lut = new Array[Double](m * c)
      var s = 0
      while (s < m) {
        var cid = 0
        while (cid < c) {
          val base = (s * c + cid) * subDim
          var acc = 0.0
          var i = 0
          while (i < subDim) {
            val qv = if (fl) a.getFloat(s * subDim + i).toDouble else a.getDouble(s * subDim + i)
            val d = qv - flat(base + i)
            acc += d * d
            i += 1
          }
          lut(s * c + cid) = acc
          cid += 1
        }
        s += 1
      }
      UnsafeArrayData.fromPrimitiveArray(lut)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val lut = ctx.freshName("lut")
      val s = ctx.freshName("s"); val cid = ctx.freshName("cid"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val get = if (isFloat) s"(double) $a.getFloat($s * $subDim + $i)"
                else s"$a.getDouble($s * $subDim + $i)"
      val j = ctx.freshName("j")
      val nullScan = if (!mayHaveNullElems) "" else
        s"for (int $j = 0; $j < ${m * subDim}; $j++) " +
          s"{ if ($a.isNullAt($j)) { ${ev.isNull} = true; break; } }"
      s"""
      if ($a.numElements() != ${m * subDim}) {
        ${ev.isNull} = true;
      } else {
        $nullScan
        if (!${ev.isNull}) {
          final double[] $lut = new double[${m * c}];
          for (int $s = 0; $s < $m; $s++) {
            for (int $cid = 0; $cid < $c; $cid++) {
              final int $base = ($s * $c + $cid) * $subDim;
              double $acc = 0.0;
              for (int $i = 0; $i < $subDim; $i++) {
                final double $d = $get - $booksRef[$base + $i];
                $acc += $d * $d;
              }
              $lut[$s * $c + $cid] = $acc;
            }
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut);
        }
      }"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
