package graft.observe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions.col

/** Plan lint — the 100 TB discipline PlanSpec enforces on the engine's
  * own queries, offered to the USER's queries as a relation: hand any
  * DataFrame in and get back the scale hazards its physical plan
  * carries, before a cluster burns a day discovering them. Two modes:
  * [[planLint]] reads pure plan metadata (zero jobs, pre-AQE);
  * [[executedPlanLint]] opts into executing the frame and lints the
  * AQE-final plan. The rules are exactly the invariants this repo
  * machine-checks on itself:
  *
  *  - `cartesian-product` (error): every pair of rows meets — O(n·m)
  *    at any scale; almost always a missing join key.
  *  - `single-partition-window` (error / warn / info): an
  *    unpartitioned window funnels the whole input through ONE task
  *    (the q133 trap — 100 TB through one sort buffer). Severity
  *    reads the window's INPUT: over a raw relation it is an error;
  *    over an aggregated child it is a warn (bounded by the group
  *    grain — one task still, but O(groups) rows; confirm the grain
  *    is small); under a literal limit it is info (bounded by a
  *    constant).
  *  - `broadcast-nested-loop` (warn): legitimate for a model-sized
  *    side streamed against once (the q31/q93 pattern); fatal if the
  *    "small" side is not actually small — surfaced for a human call.
  *  - `filter-not-pushed` (warn / info): a Filter holding predicates
  *    BEYOND null guards sits directly on a scan, yet nothing beyond
  *    IsNotNull reached the parquet reader — every row group is read
  *    and decoded before the predicate runs. Severity is
  *    ACTIONABILITY: `warn` when some conjunct has the pushable SHAPE
  *    (column vs literal comparison / IN / prefix) and still didn't
  *    push — something wrapped the column (a cast, a coalesce, an IF)
  *    and unwrapping it buys row-group pruning; `info` when every
  *    residual conjunct is inherently untranslatable (column-vs-
  *    column, arithmetic, UDFs, string transforms) — the decode cost
  *    is the predicate's nature, no better plan exists. A filter that
  *    is ONLY join-key null guards does not fire at all: its null
  *    guard DID push, and there was nothing else to push.
  *  - `full-width-scan` (info): the scan fetches every column of a
  *    wider relation — fine for `SELECT *`, a pruning bug otherwise.
  *  - `duplicate-source-scan` (warn / info): ONE query's plan scans
  *    the SAME file source 3+ times (warn) or exactly twice (info).
  *    Twice is often legitimate (a self-join, two genuinely different
  *    projections); three or more almost always means a derived
  *    relation fans out to several consumers and the planner
  *    re-derives it per consumer — exchange/stage reuse is NOT
  *    reliable across differently-shaped re-aggregations, so at
  *    100 TB the corpus is scanned (and re-exploded) once PER
  *    CONSUMER. Fix: materialize the small shared derivation
  *    (localCheckpoint / persisted artifact) — the q134-credit /
  *    q139-vocab lesson, both measured as ~2× wall before the fix.
  *  - `unbounded-agg-buffer` (warn / info): an aggregation whose
  *    buffer holds EVERY distinct input value of the group in one
  *    in-memory structure — exact `percentile`/`median` (a map of
  *    every distinct value), `collect_list`/`collect_set` (every
  *    row/value), `mode` (every distinct value). Invisible to the
  *    plan-shape rules: the plan is an innocent two-phase hash
  *    aggregate; the bomb is inside the agg FUNCTION, so a group
  *    whose value domain grows with the corpus (prices, user ids,
  *    free text) builds a multi-GB buffer in one task and OOMs at
  *    100 TB — the q120 lesson (its exact-percentile boundary pass
  *    was replaced by a two-pass bounded scheme this rule would have
  *    flagged). Legitimate only when the collected domain is bounded
  *    by CONSTRUCTION (an admission cap upstream, a domain that
  *    cannot grow with the corpus — doc lengths, source names, a
  *    stop-pruned posting df): grade those sites in an allowlist
  *    with the bound spelled out. Severity by the aggregation
  *    input's boundedness: `info` when the unary input chain passes
  *    a limit or another aggregate (the buffer is bounded by a
  *    constant / the upstream group grain — confirm the grain),
  *    `warn` over a raw relation. `collect_top_k` and the approx
  *    sketches (percentile_approx, HLL) never fire — their buffers
  *    are fixed-size by design, which is exactly the migration
  *    target this rule points at.
  *  - `unbounded-window-partition` (warn / info): a PARTITIONED window
  *    computing a full-history frame — a running aggregate anchored at
  *    `unboundedPreceding` (running sums, row_number/rank) or a frame
  *    reaching `unboundedFollowing` (rank-to-end, partition totals) —
  *    funnels each key's ENTIRE history through one task's sort. The
  *    q149 lesson: `partitionBy(source)` over a training corpus puts a
  *    dominant crawl source (tens of TB) through a single task, and
  *    the [[unbounded-agg-buffer]] rule cannot see it (the hazard is
  *    partition SIZE, not an agg buffer). Whether it bites is the
  *    partition KEY's cardinality — unknowable statically — so
  *    severity grades the window's input like the agg rule: `info`
  *    when the unary input chain passes a limit, an aggregate, or a
  *    rank-filter `WindowGroupLimit` (Spark's own top-k-per-partition
  *    bound — each partition is pre-truncated to k rows); `warn` over
  *    a raw relation, where the reviewer must argue the key grows
  *    with the corpus (user/doc ids — fine) or shard it (the
  *    q81/q120/E126 two-pass disciplines). Bounded sliding frames
  *    (`rowsBetween(-3, 0)`) do not fire: their output depends only
  *    on a constant neighborhood, so a shard split is always
  *    semantics-preserving — the full-history frame is what makes
  *    naive sharding WRONG and the two-pass offset scheme necessary.
  *  - `opaque-group-state` (info): a typed-API grouped operator —
  *    `mapGroups`/`flatMapGroups`/`flatMapGroupsWithState`/
  *    `transformWithState` — whose per-group behavior lives in an
  *    opaque JVM closure. Every hazard the other rules catch can hide
  *    here INVISIBLY: the plan is an innocent exchange + sort + one
  *    node, while the closure may buffer each group's slice
  *    (`rows.toSeq.sortBy` — the q149 single-task-per-source class,
  *    which survived in exactly this spot through round 8), group by a
  *    low-cardinality key (source, lang — unknowable statically: the
  *    `groupByKey` lambda erases the key's lineage, so the grouping
  *    attribute is a generated `value` column), or hold unbounded
  *    state. Info-grade by construction — the rule cannot see INTO the
  *    closure, so it marks the audit obligation rather than a proven
  *    hazard: verify the closure streams its iterator with bounded
  *    state (the [[graft.ops.Llm.mixGate]] discipline: O(1) numeric
  *    state + a bounded reorder heap, lazy end to end) and that the
  *    key's cardinality grows with the data.
  *  - `unbounded-in-row-expansion` (warn): a `transform` iterates a
  *    slice/reference of ITS OWN input array — the self-quadratic
  *    pair-emission shape (`transform(a, (x,i) -> transform(slice(a,
  *    i+1, ...), ...))`). Row width grows as the element count
  *    SQUARED, inside one row where no partitioner can split it: one
  *    pathological group (a bot account, a catalog-wide bulk order)
  *    builds a multi-GB row and OOMs its task at 100 TB. Legitimate
  *    only when the element count is provably capped UPSTREAM (an
  *    admission filter before collection — the engine's own basket
  *    operators do this); linear zips of the array against its own
  *    tail (`arrays_zip(slice(a,1,..), slice(a,2,..))`) do NOT fire.
  *
  * One row per finding: `(rule, severity, node)`, `node` = the plan
  * node's one-line rendering (truncated) so the finding points at the
  * operator, not just the rule name. */
object Lint {

  private def head(p: SparkPlan): String = {
    val s = p.simpleStringWithNodeId()
    if (s.length <= 120) s else s.take(117) + "..."
  }

  /** Lint on the PRE-AQE `sparkPlan` — zero jobs (nothing executes),
    * which is what makes the lint safe to run on anything. BOUNDARY:
    * hazards that only appear or disappear in the AQE-finalized plan
    * (runtime broadcast conversions, skew-split legs) are invisible
    * here; [[executedPlanLint]] is the opt-in that sees them, at the
    * cost of executing the query. */
  def planLint(df: DataFrame): DataFrame =
    lintPlan(df.sparkSession, df.queryExecution.sparkPlan)

  /** [[planLint]] over the AQE-FINAL physical plan: EXECUTES the query
    * (a noop-sink write materializes every stage so adaptive re-plans
    * settle), then lints what actually ran — runtime BHJ conversions,
    * AQE skew-join splits, and the final exchange layout included. Use
    * on a sampled/bounded frame during development, not on the 100 TB
    * run itself. */
  def executedPlanLint(df: DataFrame): DataFrame = {
    // Execute through THIS QueryExecution: a sink-side write would run
    // under a fresh QueryExecution built by the writer, leaving
    // df.queryExecution's adaptive plan un-finalized. Consuming toRdd
    // drives AdaptiveSparkPlanExec.getFinalPhysicalPlan in place, so
    // runtime BHJ conversions and skew splits are visible below.
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    lintPlan(df.sparkSession, finalPlan)
  }

  /** Traversal that DESCENDS THROUGH AQE wrappers: in an executed
    * plan, materialized stages sit behind `QueryStageExec` — a LEAF
    * node whose real operators live in its `plan` member, invisible
    * to `TreeNode.foreach`. Without this, executed-mode lint would
    * see only the final stage and miss every hazard below the last
    * exchange (most scans and joins). */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)(f)
      case _ => p.children.foreach(c => walk(c)(f))
    }
  }

  private def lintPlan(s: SparkSession, plan: SparkPlan): DataFrame = {
    import s.implicits._
    val findings = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String)]
    walk(plan) {
      case p: CartesianProductExec =>
        findings += (("cartesian-product", "error", head(p)))
      case p: BroadcastNestedLoopJoinExec =>
        findings += (("broadcast-nested-loop", "warn", head(p)))
      case p: WindowExec if p.partitionSpec.isEmpty =>
        // severity by input boundedness: a limit bounds rows by a
        // constant; an aggregate bounds them by the group grain; a raw
        // relation bounds nothing. Walk ONLY the unary chain feeding
        // the window — a limit/aggregate on one side of a join below
        // does NOT bound the join's output, so stop at any node with
        // more than one child instead of `exists` over the subtree.
        findings += (("single-partition-window",
          inputBoundedness(p.child), head(p)))
      case p: WindowExec
          if p.partitionSpec.nonEmpty &&
            p.windowExpression.exists(fullHistoryFrame) =>
        // partitioned + full-history frame: one task per key holds the
        // key's whole history. Bounded input (limit / aggregate /
        // rank-filter group-limit on the unary chain) caps partition
        // size → info; a raw relation leaves it to the key's
        // cardinality → warn, reviewer's call (see scaladoc).
        findings += (("unbounded-window-partition",
          if (windowInputBoundedness(p.child) == "error") "warn"
          else "info", head(p)))
      case FilterExec(cond, scan: FileSourceScanExec)
          // null-guards alone don't prune row groups: judge by the
          // TRANSLATED source filters (what parquet actually receives,
          // rendered in scan metadata), not dataFilters (the catalyst
          // predicates, which keep non-translatable expressions). A
          // comma inside a rendered filter only makes this check MORE
          // conservative (the fragment won't parse as IsNotNull).
          // Fire only when the RESIDUAL condition carries more than
          // null guards — a join-key IsNotNull filter has nothing else
          // to push and is the planner doing its job.
          if conjuncts(cond).exists(c =>
            !c.isInstanceOf[org.apache.spark.sql.catalyst.expressions
              .IsNotNull]) &&
            scan.metadata.getOrElse("PushedFilters", "[]")
            .stripPrefix("[").stripSuffix("]")
            .split(",").map(_.trim).filter(_.nonEmpty)
            .forall(_.startsWith("IsNotNull(")) &&
            scan.partitionFilters.isEmpty =>
        val actionable = conjuncts(cond).exists(pushableShaped)
        findings += (("filter-not-pushed",
          if (actionable) "warn" else "info", head(scan)))
      case scan: FileSourceScanExec
          if scan.relation.dataSchema.size > 1 &&
            scan.output.size >= scan.relation.dataSchema.size =>
        findings += (("full-width-scan", "info", head(scan)))
      case p if p.isInstanceOf[org.apache.spark.sql.execution.MapGroupsExec] ||
          p.getClass.getSimpleName.startsWith("FlatMapGroupsWithState") ||
          p.getClass.getSimpleName.startsWith("TransformWithState") =>
        // typed-API state op: the per-group behavior lives in an
        // opaque closure — see scaladoc (`opaque-group-state`)
        findings += (("opaque-group-state", "info", head(p)))
      case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          // fire once per logical aggregation: the Partial (or
          // single-phase Complete) node is where the per-task buffer
          // actually fills; the Final/Merge twin would double-report
          if agg.aggregateExpressions.exists(ae =>
            (ae.mode == org.apache.spark.sql.catalyst.expressions
              .aggregate.Partial ||
              ae.mode == org.apache.spark.sql.catalyst.expressions
                .aggregate.Complete) &&
              unboundedBuffer(ae.aggregateFunction)) =>
        findings += (("unbounded-agg-buffer",
          // buffer growth tracks the input's DISTINCT domain, one
          // notch softer than the window rule's row-count ladder:
          // bounded input → info, raw input → warn
          if (inputBoundedness(agg.children.head) == "error") "warn"
          else "info", head(agg)))
      case _ =>
    }
    // second pass, every node: the self-quadratic expansion hides in
    // ANY operator's expressions (project, generate, aggregate), so it
    // can't ride the typed matches above
    walk(plan) { p =>
      if (p.expressions.exists(selfQuadraticTransform))
        findings += (("unbounded-in-row-expansion", "warn", head(p)))
    }
    // third pass: count scans per source (by root path) — 3+ scans of
    // one source in one plan is the multi-consumer re-derivation smell
    val scanCounts = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    walk(plan) {
      case sc: FileSourceScanExec =>
        val p = sc.relation.location.rootPaths.mkString(",")
        scanCounts(p) += 1
      case _ =>
    }
    scanCounts.foreach { case (p, n) =>
      val path = if (p.length <= 100) p else "..." + p.takeRight(97)
      if (n >= 3)
        findings += (("duplicate-source-scan", "warn", s"${n}x $path"))
      else if (n == 2)
        findings += (("duplicate-source-scan", "info", s"2x $path"))
    }
    findings.toSeq.distinct
      .toDF("rule", "severity", "node")
      .orderBy(col("severity"), col("rule"), col("node"))
  }

  /** Classify how bounded the row count reaching an unpartitioned
    * window is, by walking the straight-line (unary) operator chain
    * that feeds it: the first limit met bounds by a constant (info),
    * the first aggregate bounds by the group grain (warn). A node with
    * 0 or 2+ children ends the walk — a leaf relation is unbounded,
    * and a limit/aggregate below ONE side of a join says nothing about
    * the join's output. */
  @annotation.tailrec
  private def inputBoundedness(n: SparkPlan): String = n match {
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
        _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec |
        _: org.apache.spark.sql.execution.CollectLimitExec => "info"
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      "warn"
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      inputBoundedness(q.plan) // AQE leaf wrapper — the chain continues
    case u if u.children.length == 1 => inputBoundedness(u.children.head)
    case _ => "error"
  }

  /** [[inputBoundedness]] for the PARTITIONED-window rule only, with
    * one extra bounded case: a rank-filter `WindowGroupLimit` below
    * pre-truncates every partition to its top k rows — bounded PER
    * PARTITION, which is exactly what that rule grades (Spark inserts
    * the group-limit with the flagged window's own partition spec, so
    * the keys match by construction in the rank-filter shape; a
    * group-limit keyed by a DIFFERENT chained window below is graded
    * optimistically). The single-partition-window and
    * unbounded-agg-buffer rules must NOT see this case: k rows per key
    * is k × #keys rows in TOTAL — still corpus-scaling for a global
    * window sort or an agg buffer, so sharing the case would silently
    * downgrade both rules (the q133 trap reopened). */
  @annotation.tailrec
  private def windowInputBoundedness(n: SparkPlan): String = n match {
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
      "info"
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
        _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec |
        _: org.apache.spark.sql.execution.CollectLimitExec => "info"
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      "warn"
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      windowInputBoundedness(q.plan)
    case u if u.children.length == 1 =>
      windowInputBoundedness(u.children.head)
    case _ => "error"
  }

  /** Aggregate functions whose buffer accretes every (distinct) input
    * value of the group: exact percentile/median (value→count map),
    * collect_list/collect_set (everything), mode (distinct-value
    * counts). `CollectTopK` is EXCLUDED — its heap is bounded by k —
    * as are all sketch aggregates (fixed-size buffers). */
  private def unboundedBuffer(
      f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    f match {
      case _: CollectTopK => false
      case _: PercentileBase | _: Collect[_] | _: Mode | _: Median => true
      case _ => false
    }
  }

  /** Does this (named) window expression carry a FULL-HISTORY frame —
    * one whose output at a row depends on unboundedly-distant rows of
    * the partition (`unboundedPreceding` running aggregates and ranks,
    * `unboundedFollowing` rank-to-end)? Bounded sliding frames stay
    * clean: a constant neighborhood splits across shards safely, so
    * they carry none of the q149 hazard's irreducibility. */
  private def fullHistoryFrame(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e.exists {
      case we: WindowExpression =>
        we.windowSpec.frameSpecification match {
          case f: SpecifiedWindowFrame =>
            f.lower == UnboundedPreceding ||
              f.upper == UnboundedFollowing
          case _ => false
        }
      case _ => false
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Does this predicate have the SHAPE the parquet source can
    * translate (bare column vs literal)? If yes and it still didn't
    * push, something actionable wrapped the column. */
  private def pushableShaped(c: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    c match {
      case b: BinaryComparison =>
        (b.left.isInstanceOf[AttributeReference] &&
          b.right.isInstanceOf[Literal]) ||
        (b.right.isInstanceOf[AttributeReference] &&
          b.left.isInstanceOf[Literal])
      case In(_: AttributeReference, vs) => vs.forall(_.isInstanceOf[Literal])
      case InSet(_: AttributeReference, _) => true
      case StartsWith(_: AttributeReference, _: Literal) => true
      case Not(inner) => pushableShaped(inner)
      case _ => false
    }
  }

  /** A `transform` whose function body runs another `transform` over a
    * slice/reference of the OUTER transform's own input array — per
    * element of `a`, iterate (part of) `a` again: O(|a|²) output in
    * one row. Matched structurally (the inner argument's tree contains
    * an expression semantically equal to the outer argument), so
    * nesting over a DIFFERENT array, and linear self-zips that never
    * re-iterate per element, stay clean. */
  private def selfQuadraticTransform(e: Expression): Boolean =
    e.exists {
      case outer: ArrayTransform =>
        outer.function.exists {
          case inner: ArrayTransform =>
            inner.argument.exists(_.semanticEquals(outer.argument))
          case _ => false
        }
      case _ => false
    }
}
