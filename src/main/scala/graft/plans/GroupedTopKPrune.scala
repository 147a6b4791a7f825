package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Grouped-top-k pre-pruning: rewrite
  *
  * {{{ Filter(rn <= k, Window(rn = row_number() OVER (PARTITION BY p ORDER BY o))) }}}
  *
  * so each INPUT partition first cuts to its local top-k per group
  * before the group-keyed exchange. The naive plan shuffles the entire
  * child through |groups| reducers — the classic bottleneck when a
  * top-k-per-group query has few groups and 100 TB of input. The
  * rewrite inserts a window keyed by (p, spark_partition_id()): same
  * full data volume through the first exchange but spread over
  * groups × input-splits reducers, after which ≤ k·splits rows per
  * group reach the original window. Lossless by construction: a row
  * with global rank ≤ k within its group has rank ≤ k among the subset
  * of its group that shares its input partition (ranks only shrink
  * when rows are removed), so every survivor of the original filter
  * survives the local cut.
  *
  * Guards: single row_number window expression, deterministic
  * partition/order expressions, a non-empty order (rank without order
  * is arbitrary), k bounded (the local cut materializes k·splits rows
  * per group), and an already-pruned child is left alone (the rule
  * runs in a fixed-point batch). The same idiom appears hand-written
  * in q90/q92; this rule applies it to any user query on a session
  * built with [[graft.GraftExtensions]].
  */
object GroupedTopKPrune extends Rule[LogicalPlan] {

  private val MaxK = 10000L

  /** cond is a bound on `attr`: attr <= k, attr < k, attr = k (any
    * rank-k filter admits pruning to local rank ≤ k).
    */
  private def boundOn(cond: Expression, attr: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(attr) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(attr) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(attr) => lit(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(attr) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(attr) => lit(l).map(_ - 1)
      case EqualTo(l, a: Attribute) if a.semanticEquals(attr) => lit(l)
      case _ => None
    }
  }

  private def isRowNumberSpec(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(), _), _) => true
    case _ => false
  }

  /** The rewrite's own footprint: Project(Filter(Window(... pid ...))).
    * Matching it again would stack prunes forever in the fixed-point
    * batch.
    */
  private def alreadyPruned(p: LogicalPlan): Boolean = p match {
    case Project(_, Filter(_, Window(_, part, _, _, _))) =>
      // the local window keys on the projected pid ATTRIBUTE, so the
      // SparkPartitionID expression itself is a level further down —
      // recognize the footprint by the reserved name
      part.exists {
        case a: Attribute => a.name == "__graft_pid"
        case e => e.exists(_.isInstanceOf[SparkPartitionID])
      }
    case _ => false
  }

  /** The rewrite's own LOCAL window is itself a bounded row_number
    * filter — it must not match the pattern again.
    */
  private def isLocalCut(part: Seq[Expression]): Boolean =
    part.exists {
      case a: Attribute => a.name == "__graft_pid"
      case e => e.exists(_.isInstanceOf[SparkPartitionID])
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond,
        w @ Window(Seq(we @ Alias(WindowExpression(RowNumber(), _), _)),
          part, order, child, _))
        if isRowNumberSpec(we) && order.nonEmpty &&
          order.forall(_.deterministic) && part.forall(_.deterministic) &&
          !isLocalCut(part) && !alreadyPruned(child) =>
      boundOn(cond, we.toAttribute) match {
        case Some(k) if k >= 1 && k <= MaxK =>
          val pid = Alias(SparkPartitionID(), "__graft_pid")()
          val withPid = Project(child.output :+ pid, child)
          val localPart = part :+ pid.toAttribute
          val lrn = Alias(
            WindowExpression(RowNumber(),
              WindowSpecDefinition(localPart, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            "__graft_lrn")()
          val localWin = Window(Seq(lrn), localPart, order, withPid, None)
          // row_number is IntegerType; the literal must match exactly —
          // optimizer-made expressions get no implicit casts, and a
          // type-mismatched comparison silently unresolves the plan
          val localCut = Filter(
            LessThanOrEqual(lrn.toAttribute, Literal(k.toInt)), localWin)
          val restored = Project(child.output, localCut)
          f.copy(child = w.copy(child = restored))
        case _ => f
      }
  }
}
