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

  /** Stored STRING columns treated as corpus BODIES by the body-width
    * gate — the names wide free-text lands under across the catalog's
    * tables and the common warehouse conventions. A stored wide string
    * under a name NOT listed here still passes silently (the r15 gap,
    * narrowed rather than closed: Spark plans carry no stored-width
    * statistics to classify on, so the gate matches the naming contract
    * and the contract is: corpus bodies are named one of these). Binary
    * payloads are flagged regardless of name. */
  private val bodyColumnNames: Set[String] =
    Set("text", "body", "content", "html", "raw", "raw_text", "payload",
      "document", "markdown")

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

      // ShuffledHashJoin holds its ENTIRE per-task build-side partition
      // as a live hash relation — no spill path. Fine when the build
      // side is bounded by a VALUE domain (a grid/bucket aggregate);
      // an executor OOM when it scales with the corpus (the r15
      // saturated-sf10 profile: AQE picked SHJ over the shingle
      // self-join and held ~40 GB live). The bound is read off the plan
      // with the same domain trace the window rule uses: the build
      // side's JOIN KEYS must trace to the grouping keys of a
      // value-derived aggregate below. Raw-id-keyed aggregates (one row
      // per corpus id) and plain scans are unbounded → error: force
      // sort-merge (`hint("merge")`), which spills both sides.
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        val (build, keys) = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
            (j.left, j.leftKeys)
          case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
            (j.right, j.rightKeys)
        }
        domainTrace(build,
          keys.flatMap(_.references.map(_.exprId)).toSet) match {
          case BoundedDerived =>
            findings += Finding("info", "shuffled-hash-join-bounded",
              "shuffled-hash build side is bounded by its value domain")
          case _ =>
            findings += Finding("error", "shuffled-hash-join-unbounded-build",
              "ShuffledHashJoin build side is not bounded by contract — " +
                "the whole per-task build relation sits live with no " +
                "spill path (executor OOM at corpus scale); force " +
                s"sort-merge instead: ${j.simpleStringWithNodeId()}")
        }

      // A shuffle INTO one partition funnels the child through a single
      // task — by design for k-rows-per-query merges, a serialization
      // point for anything corpus-sized.
      // covers SinglePartition AND numPartitions=1 hash/round-robin forms
      case e: ShuffleExchangeExec =>
        if (e.outputPartitioning == SinglePartition ||
            e.outputPartitioning.numPartitions == 1)
          findings += Finding("info", "single-partition-exchange",
            "all rows funnel through one task; verify the child is bounded")
        // A hash exchange (join/agg shuffle) whose input schema carries a
        // corpus BODY column — a stored `text` string or any stored
        // binary payload, traced UNCHANGED to the scan — ships the corpus
        // bytes across the wire even when its RECORD count is linear
        // (records gates are width-blind; this is the bytes gate). The
        // discipline is Governance.snapshotDiff's: project an 8-byte
        // fingerprint + length at the scan and join on that. Legitimate
        // only when the operator's OUTPUT is the body itself and the
        // shuffle is how it gets there (window reassembly, pair-bounded
        // rebuilds) — a spec must vouch for those sites by name.
        // Presentation-sort (range) exchanges are exempt: output-sized
        // by definition, and the test harness's determinism orderBy.
        if (e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]) {
          val wide = e.child.output.filter { a =>
            rawLeafAttr(e.child, a.exprId).exists { leaf =>
              (leaf.dataType == org.apache.spark.sql.types.StringType &&
                bodyColumnNames(leaf.name)) ||
              leaf.dataType == org.apache.spark.sql.types.BinaryType
            }
          }
          if (wide.nonEmpty)
            findings += Finding("warn", "body-width-exchange",
              "hash exchange input carries corpus body column(s) " +
                s"[${wide.map(_.name).mkString(", ")}] — ship a " +
                "fingerprint + length instead (snapshotDiff discipline)")
        }

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
      // An id-keyed domain — the grouping key traces UNCHANGED to a
      // stored leaf column (`groupBy(doc_id)`) — is also an error: ids
      // scale with the corpus, so "one row per distinct value" is no
      // bound at all. A value-DERIVED domain (floor/cast/bucket of a
      // column, or an aggregate output regrouped by value) stays
      // admitted: deriving is the author's claim that the domain is
      // value-bounded, and the claim is visible in the plan.
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val needed = w.orderSpec.flatMap(_.child.references).map(_.exprId).toSet
        domainTrace(w.child, needed) match {
          case Unbounded =>
            findings += Finding("error", "single-partition-window",
              "unpartitioned window over an input not bounded by its " +
                s"ordered value domain: ${w.simpleStringWithNodeId()}")
          case BoundedRaw =>
            findings += Finding("error", "id-domain-window",
              "unpartitioned window whose ordered domain is a RAW stored " +
                "column (distinct ids scale with the corpus — derive a " +
                s"value-bounded key instead): ${w.simpleStringWithNodeId()}")
          case BoundedDerived =>
            findings += Finding("info", "single-partition-window-bounded",
              "unpartitioned window over a distinct-value table (bounded " +
                "by the ordered domain, not the corpus)")
        }

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

    // duplicate-expensive-scan: two scans of the SAME stored source each
    // feeding the normalize/tokenize regex chain — the whole corpus is
    // CPU-tokenized twice (the r18 q_mix_temperature/q_shard_balance
    // finding: a 1-row totals branch derived from an unbarriered
    // aggregate re-ran the tokenize scan, ~2× the necessary cost at
    // sf10). The fix is the established 1-row-totals idiom: barrier the
    // small aggregate before deriving totals. Detection: the chain's
    // distinctive capture-group literals mark a normalize expression;
    // its references are traced down to the file scans producing them,
    // counted per source path. A scan behind a Barrier (RDD leaf) is
    // already materialized and never double-counts — exactly the fix.
    // `warn`, not error: a second read can be an operator's documented
    // contract (q_bpe_encode trains then encodes) — PlanAuditSpec owns
    // the catalog-wide allowlist.
    val normScans = scala.collection.mutable.Map.empty[String, Int]
    def normWalk(p: SparkPlan, normIds: Set[ExprId]): Unit = {
      val ids = normIds ++ p.expressions.collect {
        case ex if isNormalizeChain(ex) => ex.references.map(_.exprId)
      }.flatten
      p match {
        case s: FileSourceScanExec =>
          if (s.output.exists(a => ids.contains(a.exprId))) {
            val key = s.relation.location.rootPaths.mkString(",")
            normScans(key) = normScans.getOrElse(key, 0) + 1
          }
        case a: AdaptiveSparkPlanExec => normWalk(a.executedPlan, ids)
        case q: QueryStageExec        => normWalk(q.plan, ids)
        case _ => p.children.foreach(normWalk(_, ids))
      }
    }
    normWalk(plan, Set.empty)
    normScans.toSeq.sortBy(_._1).filter(_._2 >= 2).foreach { case (path, n) =>
      findings += Finding("warn", "duplicate-normalize-scan",
        s"$n scans of $path each feed the normalize/tokenize chain — " +
          "tokenize once and barrier the shared aggregate " +
          "(the 1-row-totals idiom)")
    }

    findings.result()
  }

  /** True when `ex` contains the reference text-normalization chain —
    * identified by its distinctive domain-rewrite pattern literal
    * ([[graft.functions.TextFunctions.preprocess]]'s "thc:?..." capture
    * group), which every normalize application carries verbatim. */
  private def isNormalizeChain(
      ex: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    ex.exists {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType == org.apache.spark.sql.types.StringType &&
            l.value != null =>
        // both the historical 7-pass form ("thc:?…") and the merged
        // 3-pass alternation ("(thc|cbd):?…") — the detector must keep
        // tracking the chain across its own optimizations (the planted
        // PlanAuditSpec positive holds this)
        val s = l.value.toString
        s.contains("thc:?") || s.contains("(thc|cbd):?")
      case _ => false
    }

  /** How an unpartitioned window's ordered domain bounds its input. */
  private sealed trait DomainTrace
  /** Not bounded by the ordered value domain — corpus-sized input. */
  private case object Unbounded extends DomainTrace
  /** One row per distinct ordered value, and the value is DERIVED
    * (floored/cast/bucketed/aggregated) — the author's visible claim
    * that the domain is value-bounded. */
  private case object BoundedDerived extends DomainTrace
  /** One row per distinct ordered value, but the value is a RAW stored
    * column (an id/key straight off a leaf) — distinct count scales
    * with the corpus, so the "bound" is no bound. */
  private case object BoundedRaw extends DomainTrace

  private def combine(a: DomainTrace, b: DomainTrace): DomainTrace =
    (a, b) match {
      case (Unbounded, _) | (_, Unbounded)     => Unbounded
      case (BoundedRaw, _) | (_, BoundedRaw)   => BoundedRaw
      case _                                   => BoundedDerived
    }

  /** Trace every attribute in `needed` (through projects, sorts,
    * filters, exchanges and codegen/AQE wrappers) to a GROUPING key of
    * the first aggregate below — i.e. the window's input has one row
    * per distinct ordered value. Each traced key is then classified
    * raw-vs-derived by [[isRawLeafColumn]]. Anything that fails the
    * trace (a scan, a join with a corpus-sized side, an aggregate whose
    * order key is an aggregate OUTPUT used as output) is corpus-sized:
    * [[Unbounded]]. */
  private def domainTrace(p: SparkPlan, needed: Set[ExprId]): DomainTrace =
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
        if (!needed.subsetOf(keys ++ keyOutputs)) Unbounded
        else if (needed.exists(id => domainKeyIsRaw(a, id))) BoundedRaw
        else BoundedDerived
      // a LIMIT bounds its output by a literal row count — bounded by
      // contract whatever the order keys are (`zipfAudit`'s top-N rank)
      case _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec => BoundedDerived
      case pr: ProjectExec =>
        // NOTE: a computed alias HERE (above the bounding aggregate)
        // does NOT launder rawness — projection never changes the row
        // count, so `groupBy(raw_id)` followed by `select(floor(id/N))`
        // is still one row per raw id. The derivation that counts is the
        // one BELOW the aggregate's grouping ([[domainKeyIsRaw]]).
        val remapped = needed.flatMap { id =>
          pr.projectList.find(_.toAttribute.exprId == id) match {
            case Some(al: Alias) => al.child.references.map(_.exprId).toSet
            case Some(att)       => Set(att.toAttribute.exprId)
            case None            => Set(id)
          }
        }
        domainTrace(pr.child, remapped)
      case s: SortExec              => domainTrace(s.child, needed)
      case f: FilterExec            => domainTrace(f.child, needed)
      case e: ShuffleExchangeExec   => domainTrace(e.child, needed)
      case w: WholeStageCodegenExec => domainTrace(w.child, needed)
      case i: InputAdapter          => domainTrace(i.child, needed)
      case a: AdaptiveSparkPlanExec => domainTrace(a.executedPlan, needed)
      case q: QueryStageExec        => domainTrace(q.plan, needed)
      case r: AQEShuffleReadExec    => domainTrace(r.child, needed)
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        domainTrace(b.child, needed)
      // a JOIN of two value-domain-bounded inputs is itself bounded (at
      // most the product of two value domains — never corpus-scaling):
      // each side must be bounded in (its needed attrs ∪ its equi-join
      // keys); a side contributing neither must be a 1-row global
      // aggregate (the broadcast-totals crossJoin shape). This admits the
      // bounded bucket-join-then-cumsum shape (`vocabGrowth`) while a
      // join with any corpus-sized side still fails the trace. Rawness
      // propagates: a raw-id side taints the join.
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
            : DomainTrace = {
          val out = child.outputSet.map(_.exprId).toSet
          val ids = needed.filter(out) ++
            keys.flatMap(_.references.map(_.exprId))
          if (ids.nonEmpty) domainTrace(child, ids)
          else if (isOneRow(child)) BoundedDerived
          else Unbounded
        }
        combine(side(j.left, lk), side(j.right, rk))
      case _                        => Unbounded
    }

  /** For a needed ordered-domain attribute at a bounding aggregate:
    * true iff the value it groups on is a RAW stored column — the
    * grouping expression is a bare attribute (or alias of one) that
    * traces UNCHANGED through the aggregate's child to a stored-table
    * leaf. Any computation BELOW the grouping (floor, cast, bucket
    * arithmetic, an aggregate output regrouped by value) makes it
    * derived — that computation collapses the row count to the derived
    * domain. A computed RESULT expression over the keys does NOT: the
    * aggregate still has one row per raw key tuple, so such a keyOutput
    * inherits rawness from every key it references (the
    * `groupBy(id).agg(...).select(floor(id/N))` launder). */
  private def domainKeyIsRaw(a: BaseAggregateExec, id: ExprId): Boolean = {
    val ne = a.groupingExpressions.find(_.toAttribute.exprId == id)
      .orElse(a.resultExpressions.find(_.toAttribute.exprId == id))
    ne match {
      case Some(al: Alias) => al.child match {
        case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
          keyAttrIsRaw(a, att.exprId)
        case other =>
          other.references.exists(ref => keyAttrIsRaw(a, ref.exprId))
      }
      case Some(att: org.apache.spark.sql.catalyst.expressions.Attribute) =>
        keyAttrIsRaw(a, att.exprId)
      case _ => false
    }
  }

  /** Rawness of one grouping-key attribute of `a`: resolve a grouping
    * alias one level, then trace through the aggregate's child. */
  private def keyAttrIsRaw(a: BaseAggregateExec, id: ExprId): Boolean =
    a.groupingExpressions.find(_.toAttribute.exprId == id) match {
      case Some(al: Alias) => al.child match {
        case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
          isRawLeafColumn(a.child, att.exprId)
        case _ => false // grouping on a computed expression → derived
      }
      case Some(_) => isRawLeafColumn(a.child, id)
      case None    => isRawLeafColumn(a.child, id)
    }

  /** True iff `id` traces UNCHANGED (bare attribute renames only) to an
    * output column of a leaf node — a stored column of a scan of any
    * kind (parquet, cached, local). Any Alias of a computed expression
    * breaks the chain: that's a derivation. A lower AGGREGATE output
    * that is itself a bare grouping key keeps tracing (regrouping a raw
    * id stays raw); an aggregate-function output is computed. */
  private def isRawLeafColumn(p: SparkPlan, id: ExprId): Boolean =
    rawLeafAttr(p, id).isDefined

  /** The stored-leaf attribute `id` traces UNCHANGED to (bare attribute
    * renames only), or None when any computation breaks the chain —
    * [[isRawLeafColumn]] with the leaf identity surfaced so rules can
    * read the STORED column's name/type (a rename at the top cannot
    * launder a body column past the width gate). */
  private def rawLeafAttr(p: SparkPlan, id: ExprId)
      : Option[org.apache.spark.sql.catalyst.expressions.Attribute] = p match {
    case pr: ProjectExec =>
      pr.projectList.find(_.toAttribute.exprId == id) match {
        case Some(al: Alias) => al.child match {
          case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
            rawLeafAttr(pr.child, att.exprId)
          case _ => None
        }
        case Some(att) => rawLeafAttr(pr.child, att.toAttribute.exprId)
        case None      => rawLeafAttr(pr.child, id)
      }
    case a: BaseAggregateExec =>
      val ge = a.groupingExpressions.find(_.toAttribute.exprId == id)
        .orElse(a.resultExpressions.find(_.toAttribute.exprId == id))
      ge match {
        case Some(al: Alias) => al.child match {
          case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
            rawLeafAttr(a.child, att.exprId)
          case _ => None
        }
        case Some(att: org.apache.spark.sql.catalyst.expressions.Attribute) =>
          rawLeafAttr(a.child, att.exprId)
        case _ => None
      }
    case s: SortExec              => rawLeafAttr(s.child, id)
    case f: FilterExec            => rawLeafAttr(f.child, id)
    case e: ShuffleExchangeExec   => rawLeafAttr(e.child, id)
    case w: WholeStageCodegenExec => rawLeafAttr(w.child, id)
    case i: InputAdapter          => rawLeafAttr(i.child, id)
    case a: AdaptiveSparkPlanExec => rawLeafAttr(a.executedPlan, id)
    case q: QueryStageExec        => rawLeafAttr(q.plan, id)
    case r: AQEShuffleReadExec    => rawLeafAttr(r.child, id)
    case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      rawLeafAttr(b.child, id)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      j.children.collectFirst {
        case c if c.outputSet.exists(_.exprId == id) => rawLeafAttr(c, id)
      }.flatten
    // a BARRIER leaf (checkpoint/localCheckpoint → RDD scan) is an
    // operator-internal materialization, not a stored table: its
    // columns were computed by the operator above raw storage, so the
    // raw-id verdict cannot be read off the plan. Treated as derived —
    // the residual hole is an id-keyed domain hiding BEHIND a barrier,
    // which the operator's own plan gates below the barrier must own.
    case _: org.apache.spark.sql.execution.RDDScanExec => None
    case _: org.apache.spark.sql.execution.ExternalRDDScanExec[_] => None
    // every other leaf (parquet/file scan, local/cached table, DSv2) is
    // stored data: an unchanged column off it is raw
    case leaf if leaf.children.isEmpty =>
      leaf.output.find(_.exprId == id)
    case _ => None
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
