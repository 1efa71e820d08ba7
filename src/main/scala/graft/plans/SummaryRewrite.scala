package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view (summary-table) rewrite: an aggregate over a
  * registered FACT table is answered from its pre-aggregated summary when
  * the summary subsumes the query — grouping columns ⊆ summary dims, and
  * every aggregate is `count(<literal>)` or `sum(<registered measure>)`.
  * The rewrite re-aggregates the summary's partials (`sum(cnt)`,
  * `sum(partial_sum)`), which is exact for count and decimal-backed sums
  * (SUM/COUNT are self-decomposable; AVG-style rewrites would decompose to
  * these). An optional Filter between aggregate and scan is carried over
  * when it references dims only.
  *
  * This is the 100 TB pattern for repeated dashboard/rollup queries: the
  * fact table is petabytes, the (dims) summary is megabytes, and any query
  * in the summary's subsumption cone pays a summary scan instead of a fact
  * scan. At cluster scale the summary would be refreshed incrementally per
  * ingest batch; here it is built once per registration
  * ([[graft.operators.MatViews.registerSummary]]) and the STALENESS
  * contract is explicit: a summary answers queries as of its build — the
  * caller must re-register after fact appends (or partition the summary by
  * ingest batch and union the unsummarized tail).
  *
  * Matching contract (documented, deliberately conservative): measures are
  * matched by the resolved SQL text of the Sum child over the fact schema
  * (attribute-name-based, exprId-free); anything else — distinct aggs,
  * FILTER clauses, non-Sum/Count functions, expressions over non-dim
  * columns — leaves the plan untouched. Output attribute ids are preserved
  * via aliases so parent operators (Sort, Project) are unaffected.
  *
  * Registered under the operator-optimization fixed point
  * ([[GraftExtensions]] `injectOptimizerRule`): idempotent because the
  * rewritten child is the summary relation, whose path is never a
  * registered fact.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** A registered summary table.
    * @param factPath filesystem path of the fact parquet
    * @param dims     summary grouping columns (present verbatim in summary)
    * @param cntCol   summary column holding the per-group row count
    * @param sums     Sum-child resolved SQL -> summary partial-sum column
    * @param plan     analyzed read plan of the summary parquet
    * @param mins     Min-child resolved SQL -> summary partial-min column
    * @param maxs     Max-child resolved SQL -> summary partial-max column */
  final case class Summary(factPath: String, dims: Seq[String],
                           cntCol: String, sums: Map[String, String],
                           plan: LogicalPlan,
                           mins: Map[String, String] = Map.empty,
                           maxs: Map[String, String] = Map.empty)

  @volatile private var registry: Seq[Summary] = Nil

  def register(s: Summary): Unit = synchronized {
    registry = registry.filterNot(_.factPath == s.factPath) :+ s
  }
  def clear(): Unit = synchronized { registry = Nil }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      case agg: Aggregate =>
        (for {
          (rel, cond) <- factScan(agg.child)
          summ <- registry.find(s => isFact(rel, s.factPath))
          out <- tryRewrite(agg, cond, summ)
        } yield out).getOrElse(agg)
    }

  /** The aggregate child must be the bare fact relation, optionally under
    * attribute-only Project / SubqueryAlias and at most one Filter. */
  private def factScan(p: LogicalPlan): Option[(LogicalRelation, Option[Expression])] =
    p match {
      case r: LogicalRelation => Some((r, None))
      case SubqueryAlias(_, c) => factScan(c)
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        factScan(c)
      case Filter(cond, c) =>
        factScan(c).collect { case (r, None) => (r, Some(cond)) }
      case _ => None
    }

  private def isFact(rel: LogicalRelation, path: String): Boolean =
    rel.relation match {
      case fs: HadoopFsRelation =>
        val want = new org.apache.hadoop.fs.Path(path).toUri.getPath
        fs.location.rootPaths.exists(_.toUri.getPath == want)
      case _ => false
    }

  private def tryRewrite(agg: Aggregate, cond: Option[Expression],
                         s: Summary): Option[LogicalPlan] = {
    // A query can hit the same fact twice (self-join / union of two
    // aggregates): splicing the registered plan VERBATIM would put the
    // same exprIds in two places of one tree. Each rewrite gets a fresh
    // relation instance (new exprIds), like the analyzer's own
    // deduplication of repeated relations.
    val splice = s.plan.transformUp {
      case m: MultiInstanceRelation => m.newInstance()
    }
    val sOut = splice.output
    def sAttr(name: String): Option[AttributeReference] =
      sOut.collectFirst { case a: AttributeReference if a.name == name => a }

    // Rewrite one expression tree onto the summary schema; None = give up.
    def rx(e: Expression): Option[Expression] = e match {
      case ae @ AggregateExpression(c: Count, _, false, None, _)
          if c.children.nonEmpty &&
            c.children.forall(ch => ch.foldable && ch.eval() != null) =>
        sAttr(s.cntCol).map { a =>
          val summed = Cast(ae.copy(aggregateFunction = Sum(a)), ae.dataType)
          // count over an empty input is 0, but Sum(cnt) is NULL: a GLOBAL
          // aggregate (no grouping) emits one row even when the carried dim
          // filter matches zero summary rows, so the rewrite must restore
          // count's empty-input semantics. Grouped aggregates emit no row
          // for an empty group either way.
          if (agg.groupingExpressions.isEmpty)
            Coalesce(Seq(summed, Literal(0L))) else summed
        }
      case ae @ AggregateExpression(sm: Sum, _, false, None, _) =>
        for { cn <- s.sums.get(sm.child.sql); a <- sAttr(cn) }
          yield Cast(ae.copy(aggregateFunction = Sum(a)), ae.dataType)
      // min/max are self-decomposable like sum: min of per-group partial
      // mins IS the min (ditto max) — rewrite when the measure is registered
      case ae @ AggregateExpression(mn: Min, _, false, None, _) =>
        for { cn <- s.mins.get(mn.child.sql); a <- sAttr(cn) }
          yield Cast(ae.copy(aggregateFunction = Min(a)), ae.dataType)
      case ae @ AggregateExpression(mx: Max, _, false, None, _) =>
        for { cn <- s.maxs.get(mx.child.sql); a <- sAttr(cn) }
          yield Cast(ae.copy(aggregateFunction = Max(a)), ae.dataType)
      case _: AggregateExpression => None // avg/distinct/FILTER: unsupported
      case a: AttributeReference =>
        if (s.dims.contains(a.name)) sAttr(a.name) else None
      case other =>
        val cs = other.children.map(rx)
        if (cs.exists(_.isEmpty)) None
        else Some(other.withNewChildren(cs.map(_.get)))
    }

    val newGroupings = agg.groupingExpressions.map(rx)
    val newCond = cond.map(rx)
    // Top-level grouping attributes must keep their exprIds (parents
    // reference them); re-alias the summary attribute under the old id.
    val newAggs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        rx(a).map(r => Alias(r, a.name)(exprId = a.exprId))
      case ne => rx(ne).collect { case n: NamedExpression => n }
    }
    if (newGroupings.exists(_.isEmpty) || newAggs.exists(_.isEmpty) ||
        newCond.exists(_.isEmpty)) None
    else {
      val child = newCond.flatten match {
        case Some(c) => Filter(c, splice)
        case None => splice
      }
      Some(agg.copy(groupingExpressions = newGroupings.map(_.get),
        aggregateExpressions = newAggs.map(_.get), child = child))
    }
  }
}
