package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.TopKByScore

/** Optimizer rule: rewrite the natural per-group top-k formulation
  *
  *   Filter(rn <= k, Project(..., Window(row_number() OVER
  *     (PARTITION BY p ORDER BY score DESC, id ASC) AS rn, child)))
  *
  * into the scale form
  *
  *   Project(p, id, score, rn,
  *     Generate(PosExplode(top),
  *       Aggregate(p, [p, TopKByScore(score, id, k) AS top], child)))
  *
  * The window form shuffles and sorts EVERY row of every group; the
  * aggregate form keeps k-bounded heaps with map-side combine, so the
  * shuffle carries at most k rows per group per partition. Both produce
  * identical rows (same ordering semantics, rn = heap position + 1).
  *
  * Guards: fires only when the window is a single row_number over
  * (double DESC, long ASC) attributes, the filter bound is a literal,
  * and every column the plan uses is in partition ∪ {score, id} — any
  * other shape keeps the window plan.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private case class Shape(
      rn: Attribute, part: Seq[Attribute], score: Attribute, id: Attribute,
      child: LogicalPlan, passthrough: Seq[NamedExpression])

  private def matchWindow(plan: LogicalPlan): Option[Shape] = plan match {
    case Project(projList, w: Window) =>
      matchBareWindow(w).flatMap { s =>
        // projection must be pure attributes of (part ∪ {score,id,rn})
        val ok = projList.forall {
          case a: AttributeReference =>
            (s.part :+ s.score :+ s.id :+ s.rn).exists(_.exprId == a.exprId)
          case _ => false
        }
        if (ok) Some(s.copy(passthrough = projList)) else None
      }
    case w: Window =>
      matchBareWindow(w).filter { s =>
        w.output.forall(a =>
          (s.part :+ s.score :+ s.id :+ s.rn).exists(_.exprId == a.exprId))
      }
    case _ => None
  }

  private def matchBareWindow(w: Window): Option[Shape] = w match {
    case Window(Seq(Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, SpecifiedWindowFrame(
            RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, child, _)
        if part.forall(_.isInstanceOf[AttributeReference]) =>
      order match {
        // null-safety: the window form ranks NULL score/id rows (under
        // the chosen null-ordering) while TopKByScore.update drops them.
        // The rewrite is legal only for provably null-free inputs —
        // non-nullable attributes, or a child whose constraints carry
        // IsNotNull (e.g. an explicit .isNotNull filter) — and only for
        // the default null-ordering (anything else signals the caller
        // cares about null placement).
        case Seq(
            SortOrder(score: AttributeReference, Descending, NullsLast, _),
            SortOrder(id: AttributeReference, Ascending, NullsFirst, _))
            if score.dataType == DoubleType && id.dataType == LongType &&
              provablyNotNull(score, child) && provablyNotNull(id, child) =>
          val rnAttr = w.windowOutputSet.head
          val parts = part.map(_.asInstanceOf[AttributeReference])
          // the rewrite drops every column outside part ∪ {score,id}
          val covered = (parts :+ score :+ id).map(_.exprId).toSet
          if (child.output.forall(a => covered.contains(a.exprId)))
            Some(Shape(rnAttr, parts, score, id, child, w.output))
          else None
        case _ => None
      }
    case _ => None
  }

  private def provablyNotNull(a: AttributeReference, child: LogicalPlan): Boolean =
    !a.nullable || child.constraints.exists(_.semanticEquals(IsNotNull(a)))

  private def kFromCond(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, inner) =>
      (for {
        shape <- matchWindow(inner)
        k <- kFromCond(cond, shape.rn) if k > 0
      } yield rewrite(shape, k)).getOrElse(f)
  }

  private def rewrite(s: Shape, k: Int): LogicalPlan = {
    val topK = TopKByScore(s.score, s.id, k)
    val topAlias = Alias(AggregateExpression(topK,
      org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
      isDistinct = false), "_top")()
    val agg = Aggregate(s.part, s.part :+ topAlias, s.child)
    val posAttr = AttributeReference("_pos", IntegerType, nullable = false)()
    val structAttr = AttributeReference("_entry",
      topK.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType, nullable = false)()
    val gen = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, structAttr), child = agg)
    // restore the original attribute ids so parent operators resolve
    val projections = s.passthrough.map { out =>
      if (out.exprId == s.score.exprId)
        Alias(GetStructField(structAttr, 0, Some("score")), out.name)(
          exprId = out.exprId)
      else if (out.exprId == s.id.exprId)
        Alias(GetStructField(structAttr, 1, Some("id")), out.name)(
          exprId = out.exprId)
      else if (out.exprId == s.rn.exprId)
        Alias(Add(posAttr, Literal(1)), out.name)(exprId = out.exprId)
      else out
    }
    Project(projections, gen)
  }
}
