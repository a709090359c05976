package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType, StructType}

/** Optimizer rule: rewrite the window-top-1-per-key antipattern
  *
  * {{{ ... row_number() OVER (PARTITION BY k ORDER BY o) AS rn ... WHERE rn = 1 }}}
  *
  * into a partial-aggregating `min_by`/`max_by` plan:
  *
  * {{{ SELECT _top1.* FROM (SELECT min_by(struct(*), struct(o)) AS _top1 GROUP BY k) }}}
  *
  * Why: the window formulation shuffles EVERY row to its key's
  * partition and sorts there — at 100 TB the sort spills and the
  * shuffle carries the full table. The aggregate formulation combines
  * map-side (one candidate row per key per partition crosses the
  * wire) and never sorts. Spark's own `InferWindowGroupLimit` only
  * prunes each map partition to its per-key top-k before the same
  * shuffle+sort; this rewrite removes the sort entirely. The engine's
  * latest-per-key operators use the aggregate form directly
  * (`model/Runs.latestRunPerEntity`); this rule gives user-written
  * window-SQL (the reference's dashboard idiom,
  * `pipeline_discovery.py:33-41` "latest update per pipeline") the
  * same plan automatically when registered via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Safety: fires only on the exact shape
  *  - a single `row_number()` window expression consumed by a
  *    top-1 filter (`rn = 1`, `1 = rn`, `rn <= 1`, `rn < 2`);
  *  - non-empty, deterministic, map-free partition keys (Aggregate
  *    cannot group by maps; empty keys would turn zero input rows
  *    into one aggregate row);
  *  - deterministic ordering, uniformly ASC NULLS FIRST (→ `min_by`)
  *    or uniformly DESC NULLS LAST (→ `max_by`) — the two defaults —
  *    so struct-comparison null semantics match the window sort's.
  *
  * Tie behavior: `row_number` numbers ties arbitrarily; `min_by` keeps
  * one arbitrary row among equal keys — both answers lie inside the
  * query's own nondeterminism envelope.
  */
object TopOnePerKey extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    // Same shape with an attribute-only projection in between (e.g. a
    // column reorder that did not collapse): rewrite under the Project.
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall {
          case _: AttributeReference      => true
          case Alias(_: AttributeReference, _) => true
          case _                          => false
        } =>
      rewrite(cond, w).map(Project(projList, _)).getOrElse(f)
  }

  /** `rn = 1` in its accepted spellings, against the given attribute. */
  private def isTop1Filter(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
      case EqualTo(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn.exprId
      case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
      case LessThan(a: AttributeReference, Literal(2, IntegerType)) => a.exprId == rn.exprId
      case _ => false
    }

  private def hasMap(dt: DataType): Boolean = dt match {
    case _: MapType                => true
    case s: StructType             => s.fields.exists(f => hasMap(f.dataType))
    case a: ArrayType              => hasMap(a.elementType)
    case _                         => false
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val top1 = w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(RowNumber(), _), _))
          if isTop1Filter(cond, al.toAttribute) => Some(al)
      case _ => None
    }
    top1.flatMap { rnAlias =>
      val parts = w.partitionSpec
      val orders = w.orderSpec
      val partsOk = parts.nonEmpty &&
        parts.forall(p => p.deterministic && !hasMap(p.dataType))
      val allAsc = orders.forall(o =>
        o.direction == Ascending && o.nullOrdering == NullsFirst)
      val allDesc = orders.forall(o =>
        o.direction == Descending && o.nullOrdering == NullsLast)
      val ordersOk = orders.nonEmpty && orders.forall(_.child.deterministic) &&
        (allAsc || allDesc)
      if (!partsOk || !ordersOk) None
      else {
        // `InferWindowGroupLimit` may already have inserted a
        // WindowGroupLimit below the Window; its physical operator
        // needs a per-partition sort, which the aggregate form makes
        // redundant — strip it when it carries the same spec.
        val aggChild = w.child match {
          case wgl: WindowGroupLimit
              if wgl.partitionSpec == parts && wgl.orderSpec == orders =>
            wgl.child
          case c => c
        }
        val childOut = aggChild.output
        val rowStruct = CreateStruct(childOut)
        val keyStruct = CreateStruct(orders.map(_.child))
        val fn = if (allAsc) MinBy(rowStruct, keyStruct)
                 else MaxBy(rowStruct, keyStruct)
        val top1Col = Alias(fn.toAggregateExpression(), "_top1")()
        val agg = Aggregate(parts, Seq(top1Col), aggChild)
        // Reconstruct the original output (child columns + rn) under
        // the ORIGINAL exprIds so every parent reference stays bound.
        val fields = childOut.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(top1Col.toAttribute, i, Some(a.name)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        val rnCol = Alias(Literal(1, IntegerType), rnAlias.name)(
          exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
        Some(Project(fields :+ rnCol, agg))
      }
    }
  }
}
