package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GlobalLimitExec, InputAdapter, LocalLimitExec, ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan triage for the anti-patterns that kill 100 TB jobs — the
  * programmatic form of the PLANS.md review checklist. `audit` walks a
  * query's physical plan and returns findings; `PlanAuditSpec` runs it
  * over the whole `SparkEntry` catalog so a regression in ANY query fails
  * the suite, not just the headliners with hand-written gates.
  *
  * Severities: `error` = never acceptable at corpus scale (the job is the
  * bug); `warn` = legitimate only when a side is bounded by contract —
  * a human (or a test) must vouch for it; `info` = worth a look, often
  * fine (a single-partition merge of k-rows-per-query partials is by
  * design; one over a corpus-sized child is a serialization point).
  */
object PlanDoctor {

  final case class Finding(severity: String, rule: String, detail: String) {
    override def toString = s"[$severity] $rule: $detail"
  }

  /** Audit the query's FINAL physical plan (AQE-resolved when executed). */
  def audit(df: DataFrame): Seq[Finding] = auditPlan(df.queryExecution.executedPlan)

  /** `AdaptiveSparkPlanExec` and query stages hold their physical plan as
    * a FIELD, not a child — a plain `foreach` would audit nothing inside
    * an AQE-wrapped query (i.e. most of them). */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)(f)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)(f)
      case _ => p.children.foreach(walk(_)(f))
    }
  }

  def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]

    walk(plan) {
      // |left| × |right| rows, no pruning, ever. Always a lost broadcast
      // hint or a join whose condition could not become an equi-key.
      case c: CartesianProductExec =>
        findings += Finding("error", "cartesian-product",
          s"materializes |left|x|right| rows: ${c.simpleStringWithNodeId()}")

      // Fine when the broadcast side is bounded by contract (query
      // batches, probe sets); fatal when it isn't. Flag for a human.
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("warn", "nested-loop-join",
          "BroadcastNestedLoopJoin: acceptable ONLY if the broadcast side " +
            s"is bounded by contract (${j.joinType})")

      // A shuffle INTO one partition funnels the child through a single
      // task — by design for k-rows-per-query merges, a serialization
      // point for anything corpus-sized.
      // covers SinglePartition AND numPartitions=1 hash/round-robin forms
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition ||
            e.outputPartitioning.numPartitions == 1 =>
        findings += Finding("info", "single-partition-exchange",
          "all rows funnel through one task; verify the child is bounded")

      // A Filter sitting directly on a parquet scan that pushed NOTHING
      // re-reads every row group: either the predicate is genuinely
      // un-pushable (document why) or a cast/expression blocks pushdown.
      case f: FilterExec =>
        f.child match {
          case s: FileSourceScanExec if s.metadata.get("PushedFilters")
              .exists(v => v == "[]") =>
            findings += Finding("info", "unpushed-filter",
              s"filter over ${s.tableIdentifier.map(_.toString)
                .getOrElse("scan")} pushed no predicates: ${f.condition.sql}")
          case _ => ()
        }

      // A window with NO partition keys moves every input row to one
      // task (Spark's own WindowExec WARN). Legitimate ONLY when the
      // input's row count is bounded by a VALUE domain, not the corpus —
      // mechanically: every window order key is a grouping key of the
      // aggregate directly below (rows = distinct values of the ordered
      // domain; the `lmBuckets`/`keepCut`/`rfm` CDF-cut shape). A window
      // ordered by an aggregate OUTPUT (the old `rfm` ntile-over-users
      // shape) funnels a corpus-scaling table through one task: error.
      // Known limit: an id-keyed domain (order key = the id grouping
      // key) passes — the rule bounds rows by the ordered domain's
      // cardinality, it cannot know which domains are small.
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val needed = w.orderSpec.flatMap(_.child.references).map(_.exprId).toSet
        if (!boundedByOrderedDomain(w.child, needed))
          findings += Finding("error", "single-partition-window",
            "unpartitioned window over an input not bounded by its " +
              s"ordered value domain: ${w.simpleStringWithNodeId()}")
        else
          findings += Finding("info", "single-partition-window-bounded",
            "unpartitioned window over a distinct-value table (bounded " +
              "by the ordered domain, not the corpus)")

      // A final-mode aggregate whose exchange child feeds raw rows (no
      // partial below) ships the full input across the wire — the
      // map-side combine is missing.
      case a: BaseAggregateExec
          if a.aggregateExpressions.nonEmpty &&
            a.aggregateExpressions.forall(_.mode == Final) =>
        a.child match {
          case e: ShuffleExchangeExec if !hasPartialAgg(e.child) =>
            findings += Finding("warn", "missing-partial-aggregate",
              "final aggregate fed by an exchange with no partial " +
                "aggregate below: full rows cross the wire")
          case _ => ()
        }

      case _ => ()
    }
    findings.result()
  }

  /** True when every attribute in `needed` traces (through projects,
    * sorts, filters, exchanges and codegen/AQE wrappers) to a GROUPING
    * key of the first aggregate below — i.e. the window's input has one
    * row per distinct ordered value, so its size is bounded by the value
    * domain regardless of corpus size. Anything else (a scan, a join, an
    * aggregate whose order key is an output) is corpus-sized: not
    * bounded. */
  private def boundedByOrderedDomain(p: SparkPlan, needed: Set[ExprId]): Boolean =
    p match {
      case a: BaseAggregateExec =>
        // a grouping ALIAS (`groupBy(col(x).as("v"))`) keeps the raw
        // attribute in groupingExpressions and materializes `v` only in
        // resultExpressions — key-derived outputs count as keys
        val keys = a.groupingExpressions.map(_.toAttribute.exprId).toSet
        val keyOutputs = a.resultExpressions.collect {
          case ne if ne.references.map(_.exprId).toSet.subsetOf(keys) =>
            ne.toAttribute.exprId
        }.toSet
        needed.subsetOf(keys ++ keyOutputs)
      // a LIMIT bounds its output by a literal row count — bounded by
      // contract whatever the order keys are (`zipfAudit`'s top-N rank)
      case _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec => true
      case pr: ProjectExec =>
        val remapped = needed.flatMap { id =>
          pr.projectList.find(_.toAttribute.exprId == id) match {
            case Some(al: Alias) => al.child.references.map(_.exprId).toSet
            case Some(att)       => Set(att.toAttribute.exprId)
            case None            => Set(id)
          }
        }
        boundedByOrderedDomain(pr.child, remapped)
      case s: SortExec              => boundedByOrderedDomain(s.child, needed)
      case f: FilterExec            => boundedByOrderedDomain(f.child, needed)
      case e: ShuffleExchangeExec   => boundedByOrderedDomain(e.child, needed)
      case w: WholeStageCodegenExec => boundedByOrderedDomain(w.child, needed)
      case i: InputAdapter          => boundedByOrderedDomain(i.child, needed)
      case a: AdaptiveSparkPlanExec => boundedByOrderedDomain(a.executedPlan, needed)
      case q: QueryStageExec        => boundedByOrderedDomain(q.plan, needed)
      case r: AQEShuffleReadExec    => boundedByOrderedDomain(r.child, needed)
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        boundedByOrderedDomain(b.child, needed)
      // a JOIN of two value-domain-bounded inputs is itself bounded (at
      // most the product of two value domains — never corpus-scaling):
      // each side must be bounded in (its needed attrs ∪ its equi-join
      // keys); a side contributing neither must be a 1-row global
      // aggregate (the broadcast-totals crossJoin shape). This admits the
      // bounded bucket-join-then-cumsum shape (`vocabGrowth`) while a
      // join with any corpus-sized side still fails the trace.
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        val (lk, rk) = j match {
          case h: org.apache.spark.sql.execution.joins.HashJoin =>
            (h.leftKeys, h.rightKeys)
          case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            (s.leftKeys, s.rightKeys)
          case _ => (Seq.empty, Seq.empty)
        }
        def side(child: SparkPlan,
                 keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
            : Boolean = {
          val out = child.outputSet.map(_.exprId).toSet
          val ids = needed.filter(out) ++
            keys.flatMap(_.references.map(_.exprId))
          if (ids.nonEmpty) boundedByOrderedDomain(child, ids)
          else isOneRow(child)
        }
        side(j.left, lk) && side(j.right, rk)
      case _                        => false
    }

  /** True when the plan provably yields at most one row (a global
    * aggregate — the broadcast corpus-totals shape). */
  private def isOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec     => a.groupingExpressions.isEmpty
    case pr: ProjectExec          => isOneRow(pr.child)
    case f: FilterExec            => isOneRow(f.child)
    case e: ShuffleExchangeExec   => isOneRow(e.child)
    case w: WholeStageCodegenExec => isOneRow(w.child)
    case i: InputAdapter          => isOneRow(i.child)
    case a: AdaptiveSparkPlanExec => isOneRow(a.executedPlan)
    case q: QueryStageExec        => isOneRow(q.plan)
    case r: AQEShuffleReadExec    => isOneRow(r.child)
    case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      isOneRow(b.child)
    case _                        => false
  }

  private def hasPartialAgg(plan: SparkPlan): Boolean = plan.exists {
    case a: HashAggregateExec =>
      a.aggregateExpressions.exists(e => e.mode == Partial || e.mode == Complete)
    case a: ObjectHashAggregateExec =>
      a.aggregateExpressions.exists(e => e.mode == Partial || e.mode == Complete)
    case a: SortAggregateExec =>
      a.aggregateExpressions.exists(e => e.mode == Partial || e.mode == Complete)
    case _ => false
  }
}
