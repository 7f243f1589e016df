package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.L2DistanceSqExpr

/** Index-aware planning: rewrites the NAIVE exact-kNN plan shape
  *
  * {{{
  *   GlobalLimit k
  *     LocalLimit k
  *       Sort [dist ASC, ...]
  *         Project [..., round(l2_distance(embedding, query_vec), _) AS dist]
  *           Join Cross/Inner (no condition)
  *             <scan of a table with a registered IVF index>   -- vectors
  *             <query-vector side>                             -- 1 row
  * }}}
  *
  * into the IVF probe over the registered index: the vector side gains
  * an equi-join against the persisted `(vec_id, cell)` assignment table
  * (the cell semi-join — broadcastable: 2 narrow columns), and a filter
  * keeps only rows whose cell is among the query's `nprobe` nearest
  * centroids (centroids are driver-resident literals, so the probe is
  * a pure row-level expression — no extra shuffle, no subtree
  * duplication). Everything above the join — projection, sort, limit —
  * is preserved untouched, so output attributes and exprIds are
  * unchanged and the rewrite composes with TakeOrderedAndProject.
  *
  * Scale shape: the naive plan computes |table| distances and feeds
  * them all into the top-k; the rewritten plan computes distances for
  * ~nprobe/C of the rows (the survivors of the cell filter), which is
  * the IVF contract. With the assignment stored as a partition column
  * ([[graft.operators.Ivf.writePartitioned]]) the same probe becomes a
  * partition-pruned scan; this rule is the in-place form for tables
  * whose layout the user does not control.
  *
  * Correctness contract: registering an index ([[IndexCatalog]])
  * declares the approximation budget — results are EXACT for
  * `nprobe >= C` (spec-pinned) and standard IVF recall below that.
  * The rule only fires on plans whose distance expression contains the
  * engine's native [[L2DistanceSqExpr]] kernel (the Column API's
  * `l2Distance` and the SQL `l2_distance` both lower to it), never on
  * arbitrary user arithmetic.
  *
  * Wire up via `spark.experimental.extraOptimizations` or
  * `GraftExtensions` (`spark.sql.extensions`).
  */
case class IndexRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(glk,
        LocalLimit(llk, sort @ Sort(orders, true, Project(projList, join: Join), _))) =>
      tryRewrite(orders, projList, join)
        .map(r => GlobalLimit(glk,
          LocalLimit(llk, sort.copy(child = Project(projList, r)))))
        .getOrElse(gl)
  }

  private def tryRewrite(orders: Seq[SortOrder], projList: Seq[NamedExpression],
                         join: Join): Option[LogicalPlan] = join match {
    case Join(left, right, Cross | Inner, None, _) =>
      for {
        distAlias <- projList.collectFirst {
          case a: Alias if a.child.exists(_.isInstanceOf[L2DistanceSqExpr]) => a
        }
        // primary sort key must be that distance, ascending (top-k-nearest)
        head <- orders.headOption
        if head.direction == Ascending && head.child.semanticEquals(distAlias.toAttribute)
        l2 <- distAlias.child.collectFirst { case e: L2DistanceSqExpr => e }
        attrs = l2.collect { case a: AttributeReference => a }
        embAttr <- attrs.find(left.outputSet.contains)
        qAttr <- attrs.find(right.outputSet.contains)
        idAttr <- left.output.find(_.name == "vec_id")
        path <- leafPath(left)
        idx <- IndexCatalog.lookup(path)
      } yield rewrite(join, left, idAttr, qAttr, idx)
    case _ => None
  }

  /** The probe rewrite: join the scan side with the assignment table on
    * vec_id, then keep rows whose cell is in the query's nprobe nearest
    * centroids.
    */
  private def rewrite(join: Join, left: LogicalPlan, idAttr: Attribute,
                      qAttr: Attribute, idx: IndexCatalog.IvfIndex): LogicalPlan = {
    val assignRel = spark.read.parquet(idx.assignPath).queryExecution.analyzed
    val aVecId = assignRel.output.find(_.name == "vec_id")
      .getOrElse(sys.error(s"assignment table ${idx.assignPath} lacks vec_id"))
    val aCell = assignRel.output.find(_.name == "cell")
      .getOrElse(sys.error(s"assignment table ${idx.assignPath} lacks cell"))
    val newLeft = Join(left, assignRel, Inner,
      Some(EqualTo(idAttr, aVecId)), JoinHint.NONE)
    Filter(probeFilter(qAttr, aCell, idx), join.copy(left = newLeft))
  }

  /** `cell ∈ (query's nprobe nearest centroids)` as a row-level
    * predicate over resolved Catalyst nodes only (an optimizer rule
    * cannot emit unanalyzed function-API columns): the row's cell is in
    * the probe set iff FEWER THAN nprobe centroids rank strictly ahead
    * of it. Centroids are literals (C·dim doubles, driver-resident by
    * the IVF contract); ranking uses SQUARED l2 (same order as l2 —
    * sqrt is monotone) with ties broken by centroid id exactly as
    * [[graft.operators.Ivf.assignWith]] breaks them. ~2C fused
    * primitive-loop distance evals per row, all inside whole-stage
    * codegen.
    */
  private def probeFilter(qAttr: Attribute, aCell: Attribute,
                          idx: IndexCatalog.IvfIndex): Expression = {
    val dists = idx.centroids.map { case (cid, v) =>
      (Literal(cid),
        L2DistanceSqExpr(qAttr, Literal.create(v, ArrayType(DoubleType))): Expression)
    }
    // distance from the query to the centroid of THIS row's cell
    val dCell = CaseKeyWhen(aCell, dists.flatMap { case (cidLit, d) => Seq(cidLit, d) })
    val rank = dists.map { case (cidLit, d) =>
      If(Or(LessThan(d, dCell), And(EqualTo(d, dCell), LessThan(cidLit, aCell))),
        Literal(1), Literal(0)): Expression
    }.reduce(Add(_, _))
    LessThan(rank, Literal(idx.nprobe))
  }

  /** Root path of the single relation a Project/Filter chain scans. */
  private def leafPath(plan: LogicalPlan): Option[String] = plan match {
    case Project(_, child) => leafPath(child)
    case Filter(_, child) => leafPath(child)
    case SubqueryAlias(_, child) => leafPath(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case _ => None
  }
}
