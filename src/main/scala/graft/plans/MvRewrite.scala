package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view ROLLUP REWRITE — the serve side of the engine's
  * incremental-view story (q114 maintains aggregates incrementally;
  * this rule makes user queries USE them without being rewritten by
  * hand — the lakehouse `OPTIMIZE`/MV-routing feature, re-expressed as
  * a Catalyst optimizer rule).
  *
  * A registered MV is a persisted aggregate of a base table at FINER
  * grouping grain (e.g. per (flag, status, ship-date) with count/sum/
  * min/max). Any user aggregate over the base table whose grouping
  * keys are a SUBSET of the MV's grain and whose aggregates are
  * derivable from the MV's columns re-aggregates the MV instead:
  *
  *  - `count(*)`  → `sum(mv.cnt)`   (0-coalesced for the global case)
  *  - `sum(x)`    → `sum(mv.sum_x)`
  *  - `min(x)`    → `min(mv.min_x)` , `max(x)` → `max(mv.max_x)`
  *
  * At 100 TB the base scan is the dominant cost of every dashboard
  * rollup; the MV is O(grain) rows, so a served query reads orders of
  * magnitude less. Rollup-over-partial-aggregate is EXACT for these
  * four functions (sum/count/min/max are associative-decomposable;
  * avg must be asked for as sum/count — the rule does not synthesize
  * it). The MV artifact is content-addressed to the base table's file
  * state via [[graft.observe.IndexStore]], so a stale MV is
  * structurally impossible: a base append changes the fingerprint and
  * [[MvCatalog.register]] rebuilds before the next serve.
  *
  * Safety: the rule fires only on the exact shape — grouping
  * expressions are bare base-table columns within the MV grain;
  * every aggregate is an undistinct, unfiltered count(*)/sum/min/max
  * of a covered column; the child is the base relation (optionally
  * under a pure-attribute Project, the column-pruning residue); no
  * Filter between (a predicate could reference columns the MV lost).
  * Anything else — other tables, other functions, expressions inside
  * aggregates, DISTINCT, FILTER clauses — leaves the plan untouched.
  * Registered via `spark.experimental.extraOptimizations` (the
  * public post-batch hook, same slot as [[TopOnePerKey]]).
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered view: base-table path, its analyzed MV plan, the
    * MV grain, and the base→MV column maps per aggregate kind. */
  case class Spec(
      basePath: String,
      mvPlan: LogicalPlan,
      groupCols: Set[String],
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String],
      maxCols: Map[String, String])

  /** Registry keyed by the base table's normalized path. */
  private[plans] val specs = new ConcurrentHashMap[String, Spec]()

  def register(spec: Spec): Unit =
    specs.put(normalize(spec.basePath), spec)

  private def normalize(p: String): String = new Path(p).toUri.getPath

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (specs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        baseRelationOf(child)
          .flatMap { case (spec, cond) =>
            rewrite(agg, groups, aggExprs, spec, cond) }
          .getOrElse(agg)
    }

  /** The registered base relation under `child`, tolerating the
    * column-pruning Project (pure attributes only — an expression in
    * between could alias a computed value the MV cannot supply) and a
    * Filter whose predicate touches ONLY grain columns (a slice on a
    * grain dimension selects whole MV rows, so it pushes through the
    * rollup exactly; any other predicate references detail the MV
    * lost — bail). Returns the spec plus the translatable residual
    * predicate. */
  private def baseRelationOf(
      child: LogicalPlan): Option[(Spec, Option[Expression])] = child match {
    case l: LogicalRelation => specFor(l).map((_, None))
    case Project(projList, inner)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      baseRelationOf(inner)
    case Filter(cond, inner) if cond.deterministic =>
      baseRelationOf(inner).flatMap {
        case (spec, None)
            if cond.references.forall(a => spec.groupCols(a.name)) =>
          Some((spec, Some(cond)))
        case _ => None // stacked filters collapse before this rule runs
      }
    case _ => None
  }

  private def specFor(l: LogicalRelation): Option[Spec] = l.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption
        .flatMap(p => Option(specs.get(normalize(p.toString))))
    case _ => None
  }

  private def rewrite(
      agg: Aggregate,
      groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      spec: Spec,
      cond: Option[Expression]): Option[LogicalPlan] = {
    val mvAttr: Map[String, Attribute] =
      spec.mvPlan.output.map(a => a.name -> a).toMap

    // Grouping keys: bare columns inside the MV grain.
    val groupAttrs = groups.map {
      case a: AttributeReference if spec.groupCols(a.name) => a
      case _ => return None
    }

    // Each output: a grouping passthrough or a derivable aggregate.
    val newAggExprs = aggExprs.map {
      case a: AttributeReference if spec.groupCols(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if spec.groupCols(a.name) =>
        Alias(mvAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(
          AggregateExpression(f, Complete, false, None, _), name) =>
        val rolled: Expression = f match {
          case Count(Seq(Literal(1, _))) =>
            // count can never be NULL: coalesce covers the global
            // (group-less) aggregate over an empty MV
            Coalesce(Seq(
              Sum(mvAttr(spec.cntCol)).toAggregateExpression(),
              Literal(0L)))
          case Sum(a: AttributeReference, _) if spec.sumCols.contains(a.name) =>
            Sum(mvAttr(spec.sumCols(a.name))).toAggregateExpression()
          case Min(a: AttributeReference) if spec.minCols.contains(a.name) =>
            Min(mvAttr(spec.minCols(a.name))).toAggregateExpression()
          case Max(a: AttributeReference) if spec.maxCols.contains(a.name) =>
            Max(mvAttr(spec.maxCols(a.name))).toAggregateExpression()
          case _ => return None
        }
        Alias(rolled, name)(exprId = al.exprId)
      case _ => return None
    }

    val newGroups = groupAttrs.map(a => mvAttr(a.name))
    val source = cond match {
      case Some(c) =>
        Filter(c.transform {
          case a: AttributeReference => mvAttr(a.name)
        }, spec.mvPlan)
      case None => spec.mvPlan
    }
    Some(Aggregate(newGroups, newAggExprs, source))
  }
}

/** Build-and-register lifecycle for the shipped lineitem daily MV —
  * grain (l_returnflag, l_linestatus, ship day), covering count,
  * sum(l_quantity), min/max(l_extendedprice). The artifact lives in
  * the [[graft.observe.IndexStore]] (content-addressed to the base
  * files, retained, rebuild-on-change); registration also installs
  * [[MvRewrite]] into `spark.experimental.extraOptimizations` once
  * per session. */
object MvCatalog {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  def registerLineitemDaily(s: SparkSession, dir: String): DataFrame = {
    val basePath = s"$dir/lineitem.parquet"
    val mv = graft.observe.IndexStore.readOrBuild(
      s, "mv_lineitem_daily", basePath) {
      s.read.parquet(basePath)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          to_date(col("l_shipdate")).as("ship_day"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }
    MvRewrite.register(MvRewrite.Spec(
      basePath = basePath,
      mvPlan = mv.queryExecution.analyzed,
      groupCols = Set("l_returnflag", "l_linestatus"),
      cntCol = "cnt",
      sumCols = Map("l_quantity" -> "sum_qty"),
      minCols = Map("l_extendedprice" -> "min_price"),
      maxCols = Map("l_extendedprice" -> "max_price")))
    if (!s.experimental.extraOptimizations.contains(MvRewrite)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ MvRewrite
    }
    mv
  }
}
