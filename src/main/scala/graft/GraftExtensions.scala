package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

import graft.functions.{DotProductExpr, L2DistanceSqExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * vector expressions as SQL functions, so `spark.sql("... l2_distance
  * (a, b) ...")` works alongside the Column API (SURVEY.md §2.1 #5 —
  * the reference's only API is direct method calls; this engine exposes
  * both DataFrame and SQL surfaces).
  *
  * Wire up with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$name requires exactly 2 arguments, got ${args.length}")
    mk(args(0), args(1))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("l2_distance"), info("l2_distance"),
      binary("l2_distance", (a, b) => Sqrt(L2DistanceSqExpr(a, b)))),
    (FunctionIdentifier("l2_distance_sq"), info("l2_distance_sq"),
      binary("l2_distance_sq", L2DistanceSqExpr(_, _))),
    (FunctionIdentifier("dot_product"), info("dot_product"),
      binary("dot_product", DotProductExpr(_, _))))

  /** Register on an already-created session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
