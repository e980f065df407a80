package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrites the naive window-rank batch top-k
  *
  * {{{ Project(p) <- Filter(rank <= k) <- Window(row_number over
  *     (partition by g order by dist asc, id asc)) }}}
  *
  * into the bounded-heap aggregate
  *
  * {{{ Project(p) <- restore <- Generate(posexplode(topk)) <-
  *     Aggregate(g, topk_by_dist(dist, id, k)) }}}
  *
  * so the per-partition work is a k-heap with map-side partial
  * aggregation instead of a full sort of every scored row per group —
  * users keep writing the declarative window form and the planner swaps
  * in [[TopKByDist]].
  *
  * Guard rails (the rule bails unless ALL hold):
  *  - opt-in: `spark.graft.rewriteWindowTopK=true` (nulls in the order
  *    keys rank first under the window's NULLS FIRST but are *skipped*
  *    by the heap, so the rewrite is only safe when dist/id are non-null
  *    — which the engine's distance expressions guarantee, but Spark's
  *    nullability metadata cannot prove);
  *  - exactly one window expression: `row_number()` ordered by
  *    (dist: double ASC, id: long ASC) with non-empty partition keys;
  *  - the filter is a bare rank bound (≤ k, < k, = 1);
  *  - the projection references only partition keys, dist, id, rank.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def extractK(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, IntLit(k)) if r.semanticEquals(rank) => Some(k)
    case LessThan(r: Attribute, IntLit(k)) if r.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(IntLit(k), r: Attribute) if r.semanticEquals(rank) => Some(k)
    case EqualTo(r: Attribute, IntLit(1)) if r.semanticEquals(rank) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rewriteWindowTopK", "false").toBoolean) {
      return plan
    }
    plan.transformUp {
      case orig @ Project(projList,
        Filter(cond,
          Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(partSpec,
                Seq(SortOrder(dist: Attribute, Ascending, NullsFirst, _),
                  SortOrder(id: Attribute, Ascending, NullsFirst, _)), _)), _)),
            _, _, child, _)))
          if partSpec.nonEmpty && partSpec.forall(_.isInstanceOf[Attribute]) &&
            dist.dataType == DoubleType && id.dataType == LongType &&
            extractK(cond, alias.toAttribute).isDefined => {

        val k = extractK(cond, alias.toAttribute).get
        val partAttrs = partSpec.map(_.asInstanceOf[Attribute])
        val rankAttr = alias.toAttribute

        // The analyzer often extracts the sort key into its own alias
        // (`_w1`) while the user-facing column is a *semantically equal
        // twin* in the same child Project (SQL: `l2_distance(..) AS dist`
        // plus the same expression in ORDER BY). Collect those twins so
        // they can be rebuilt from the heap rows too.
        val childProj: Seq[NamedExpression] = child match {
          case Project(pl, _) => pl
          case _ => Nil
        }
        def sourceOf(a: Attribute): Expression =
          childProj.collectFirst { case al @ Alias(e, _) if al.exprId == a.exprId => e }
            .getOrElse(a)
        val distSource = sourceOf(dist)
        val idSource = sourceOf(id)

        sealed trait Twin
        case object DistTwin extends Twin
        case object IdTwin extends Twin
        case class PartTwin(p: Attribute) extends Twin
        val twins: Seq[(Attribute, Twin)] = childProj.collect {
          case al @ Alias(e, _)
              if al.exprId != dist.exprId && al.exprId != id.exprId &&
                !partAttrs.exists(_.exprId == al.exprId) =>
            if (e.semanticEquals(distSource)) Some(al.toAttribute -> (DistTwin: Twin))
            else if (e.semanticEquals(idSource)) Some(al.toAttribute -> (IdTwin: Twin))
            else e match {
              case p: Attribute if partAttrs.exists(_.exprId == p.exprId) =>
                Some(al.toAttribute ->
                  (PartTwin(partAttrs.find(_.exprId == p.exprId).get): Twin))
              case _ => None
            }
        }.flatten

        val allowed = AttributeSet(
          partAttrs ++ Seq(dist, id, rankAttr) ++ twins.map(_._1))
        if (!projList.forall(_.references.subsetOf(allowed))) {
          orig // unsupported projection: leave the plan untouched
        } else {
          val topkAlias = Alias(
            TopKByDist(dist, id, Literal(k)).toAggregateExpression(), "__topk")()
          val agg = Aggregate(
            partAttrs, (partAttrs: Seq[NamedExpression]) :+ topkAlias, child)

          val elemType = StructType(Seq(
            StructField("dist", DoubleType, nullable = false),
            StructField("id", LongType, nullable = false)))
          val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
          val hitAttr = AttributeReference("__hit", elemType, nullable = false)()
          val gen = Generate(PosExplode(topkAlias.toAttribute), Nil,
            outer = false, None, Seq(posAttr, hitAttr), agg)

          def distVal = GetStructField(hitAttr, 0, Some("dist"))
          def idVal = GetStructField(hitAttr, 1, Some("id"))
          // rebuild all original attributes (same exprIds) from the heap rows
          val rebuilt: Seq[NamedExpression] =
            Seq(
              Alias(distVal, dist.name)(exprId = dist.exprId),
              Alias(idVal, id.name)(exprId = id.exprId),
              Alias(Add(posAttr, Literal(1)), rankAttr.name)(exprId = rankAttr.exprId)) ++
              twins.map {
                case (a, DistTwin) => Alias(distVal, a.name)(exprId = a.exprId)
                case (a, IdTwin) => Alias(idVal, a.name)(exprId = a.exprId)
                case (a, PartTwin(p)) => Alias(p, a.name)(exprId = a.exprId)
              }
          val restore = Project(partAttrs ++ rebuilt, gen)
          Project(projList, restore)
        }
      }
    }
  }
}
