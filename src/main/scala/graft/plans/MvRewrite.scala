package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And => CatAnd,
  AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, If,
  IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType,
  LongType, ShortType}

/** One registered materialized aggregate: queries that group the BASE
  * table by a subset of `dims` and compute sums / counts / mins /
  * maxes over the registered measures can be answered from the (much
  * smaller) MV table by RE-AGGREGATING its partial aggregates —
  * sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes — the
  * classic OLAP aggregate-navigator rollup.
  *
  * @param baseRoot  versioned-table root the MV summarizes
  * @param mv        current MV snapshot (re-planned per query, so IVM
  *                  maintenance commits are picked up immediately)
  * @param dims      MV grouping columns (same names in base and MV)
  * @param sums      base measure column → MV column holding
  *                  `sum(measure)`
  * @param count     MV column holding `count(*)`, if materialized
  * @param counts    base measure column → MV column holding
  *                  `count(measure)` (the per-measure NON-NULL count —
  *                  what `avg(measure)` decomposition divides by;
  *                  `count(*)` would be wrong the moment a measure
  *                  value is NULL, so avg never falls back to it)
  * @param mins      base measure column → MV column holding `min(...)`
  * @param maxs      base measure column → MV column holding `max(...)`
  * @param basisVersion the BASE version this MV reflects, re-read per
  *                  rewrite: `Some(v)` makes the rule decline whenever
  *                  the base's current version ≠ v (a stale MV then
  *                  falls back to the base plan instead of serving old
  *                  totals — Delta's MV rewrite substitutes only when
  *                  fresh); the default `None` asserts the CALLER
  *                  keeps the MV fresh (a synchronous IVM loop that
  *                  maintains the summary in the same step as every
  *                  base commit)
  * @param joinDims  non-empty for STAR-JOIN MVs: the matched plan is
  *                  then `Aggregate over fact ⋈ d1 ⋈ … ⋈ dn` (inner
  *                  equi-joins on exactly the registered key pairs,
  *                  any join-tree shape) instead of a bare base scan
  */
final case class MvDef(
    baseRoot: String,
    mv: () => DataFrame,
    dims: Seq[String],
    sums: Map[String, String] = Map.empty,
    count: Option[String] = None,
    counts: Map[String, String] = Map.empty,
    mins: Map[String, String] = Map.empty,
    maxs: Map[String, String] = Map.empty,
    basisVersion: () => Option[Long] = () => None,
    joinDims: Seq[MvJoinDim] = Seq.empty)

/** The dim side of a registered star-join MV: `dimRoot`'s scan joined
  * to the base on `factKeys(i) = dimKeys(i)`, fresh only at
  * `dimBasisVersion`. */
final case class MvJoinDim(
    dimRoot: String,
    factKeys: Seq[String],
    dimKeys: Seq[String],
    dimBasisVersion: () => Option[Long] = () => None)

/** Deregistration handle for ONE [[MvRewrite.register]] call — scoped
  * cleanup that cannot clobber definitions other sessions or queries
  * registered concurrently. Idempotent. */
final class MvHandle private[plans] (d: MvDef) {
  def deregister(): Unit = MvRewrite.remove(d)
}

/** AGGREGATE-AWARE QUERY REWRITE (the OLAP "aggregate navigator" /
  * Delta "materialized view query rewrite" shape) as a Catalyst
  * optimizer rule: an `Aggregate` whose child scans a registered base
  * table, whose grouping keys are a subset of the MV's dimensions,
  * and whose aggregates decompose over the MV's partials, is rewritten
  * to the same aggregate over the MV scan. The 100 TB payoff is the
  * point of materialized views: a dashboard's `GROUP BY status` over
  * a 100 TB fact table becomes a scan of a KB-scale summary — without
  * the query author knowing the MV exists.
  *
  * Matching is deliberately conservative (a missed rewrite is just the
  * base-table plan; a wrong one is corruption):
  *   - the child must be the base table's manifest scan
  *     ([[org.apache.spark.sql.graftbridge.ManifestFileIndex]]) —
  *     optionally under a column-pruning Project of bare attributes
  *     and/or a Filter referencing ONLY dimension columns (the filter
  *     re-binds onto the MV's columns: rows of untouched groups
  *     filter identically before and after rollup). A DV-masked or
  *     column-mapped snapshot plans as a join/projection and simply
  *     never matches.
  *   - every grouping expression must be a bare dimension attribute.
  *   - every output must be a dimension, `sum(measure)` (int/long/
  *     float/double — decimal re-sums would widen the type), a
  *     literal `count(*)`/`count(1)`, or `min`/`max` of a registered
  *     measure; DISTINCT or filtered aggregates never match.
  *   - rewritten outputs keep their original names AND exprIds, so
  *     parent operators (sorts, projections, havings) re-bind
  *     untouched.
  *
  * Register per session via `spark.experimental.extraOptimizations`
  * (or a `SparkSessionExtensions.injectOptimizerRule`); definitions
  * are session-global in [[MvRewrite.register]]. The MV frame is
  * re-planned at every rewrite, so an IVM-maintained MV (q73/q147
  * machinery) serves its freshest committed version. */
object MvRewrite extends Rule[LogicalPlan] {

  private val defs = new java.util.concurrent.CopyOnWriteArrayList[MvDef]

  /** Register a definition; the returned handle deregisters THIS
    * definition only — concurrent sessions' registrations survive
    * (a blanket [[clear]] would silently cost them their rewrite). */
  def register(d: MvDef): MvHandle = { defs.add(d); new MvHandle(d) }

  /** Wipe EVERY registration (test teardown only — in shared-session
    * code prefer the [[register]] handle's `deregister()`). */
  def clear(): Unit = defs.clear()

  private[plans] def remove(d: MvDef): Unit = defs.remove(d)

  private def normPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** Roots of every manifest-backed relation scan in a frame's
    * OPTIMIZED plan — what q253/q254 (and the spec) use to PROVE a
    * rewrite fired (the physical plan hides behind AQE). */
  def scannedManifestRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case rel: HadoopFsRelation =>
          rel.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  /** Is this scan EXACTLY the table-at-`root`'s current snapshot AT
    * the registered basis? The root path alone is not identity: a
    * `VERSION AS OF` read or a file-pruned partial scan plans the
    * SAME root with a different file set, and rewriting those onto
    * the (current, complete) MV would return wrong aggregates.
    * Match = same qualified file set as the current manifest, no DV
    * masks, no column mapping; anything unprovable (including a
    * racing commit between plan and optimize) declines. */
  private def isCurrentSnapshot(
      mfi: org.apache.spark.sql.graftbridge.ManifestFileIndex,
      tableRoot: String, basis: () => Option[Long]): Boolean =
    try {
      val root = mfi.rootPaths.head
      if (normPath(root.toString) != normPath(tableRoot)) return false
      val vt = new graft.io.VersionedTable(
        org.apache.spark.sql.SparkSession.active, tableRoot)
      vt.currentVersion.exists { cur =>
        basis().forall(_ == cur) && {
          val m = vt.currentManifest
          m.mapping.isEmpty && m.entries.forall(_.dvDir.isEmpty) && {
            val expected = m.entries.map(e =>
              new org.apache.hadoop.fs.Path(root, e.relPath).toString).toSet
            mfi.manifestFilePaths.toSet == expected
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Strip a column-pruning Project / acceptable Filter down to the
    * manifest scan of `tableRoot`@basis; returns the re-bindable
    * filter condition (None = no filter). Acceptable conjuncts are
    * deterministic dims-only predicates (they re-bind onto the MV:
    * rows of untouched groups filter identically before and after
    * rollup) and `IsNotNull(<join key>)` — Catalyst infers those from
    * an inner join's constraints, and the MV's inner semantics
    * already exclude null-key rows, so they DROP rather than re-bind. */
  private def scanOf(plan: LogicalPlan, tableRoot: String,
      basis: () => Option[Long], dims: Seq[String],
      dropNotNullKeys: Set[String]): Option[Option[Expression]] =
    plan match {
      case lr: LogicalRelation if (lr.relation match {
          case rel: HadoopFsRelation => rel.location match {
            case mfi: org.apache.spark.sql.graftbridge.ManifestFileIndex =>
              isCurrentSnapshot(mfi, tableRoot, basis)
            case _ => false
          }
          case _ => false
        }) =>
        Some(None)
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        scanOf(child, tableRoot, basis, dims, dropNotNullKeys)
      case Filter(cond, child) =>
        // deterministic only: re-binding rand() < 0.5 from per-base-row
        // to per-MV-group-row would change semantics, not just cost
        val conjuncts = splitConjuncts(cond)
        val kept = conjuncts.filterNot {
          case IsNotNull(a: AttributeReference) =>
            dropNotNullKeys.contains(a.name)
          case _ => false
        }
        if (!kept.forall(c => c.deterministic &&
          c.references.forall(r => dims.contains(r.name)))) None
        else scanOf(child, tableRoot, basis, dims, dropNotNullKeys).map {
          prev => (prev.toSeq ++ kept).reduceOption(CatAnd.apply)
        }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case CatAnd(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Single-table child match (the original navigator shape). */
  private def baseScan(plan: LogicalPlan, d: MvDef)
      : Option[Option[Expression]] =
    scanOf(plan, d.baseRoot, d.basisVersion, d.dims, Set.empty)

  /** STAR-JOIN child match: `fact ⋈ d1 ⋈ … ⋈ dn` as ANY inner
    * join-tree shape whose leaves are exactly the fact scan plus each
    * registered dim scan (all provably-current snapshots at their
    * recorded bases) and whose accumulated equi-conjuncts are exactly
    * the registered key pairs, per dim. Filters are collected from
    * anywhere in the tree (dims-only; inferred key IsNotNulls
    * dropped) and re-bind onto the MV. */
  private def joinScan(plan: LogicalPlan, d: MvDef,
      jds: Seq[MvJoinDim]): Option[Option[Expression]] = {
    val keyNames: Set[String] =
      jds.flatMap(j => j.factKeys ++ j.dimKeys).toSet

    // flatten the join tree: leaves + every equi-conjunct + filters
    def flatten(p: LogicalPlan): Option[(Seq[LogicalPlan],
        Seq[Expression], Seq[Expression])] = p match {
      case Join(l, r, Inner, Some(cond), _) =>
        for {
          (ll, lc, lf) <- flatten(l)
          (rl, rc, rf) <- flatten(r)
        } yield (ll ++ rl, lc ++ rc ++ splitConjuncts(cond), lf ++ rf)
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        flatten(child)
      case Filter(cond, child) =>
        val kept = splitConjuncts(cond).filterNot {
          case IsNotNull(a: AttributeReference) =>
            keyNames.contains(a.name)
          case _ => false
        }
        if (!kept.forall(c => c.deterministic &&
          c.references.forall(r => d.dims.contains(r.name)))) None
        else flatten(child).map { case (ls, cs, fs) =>
          (ls, cs, fs ++ kept)
        }
      case leaf => Some((Seq(leaf), Seq.empty, Seq.empty))
    }

    flatten(plan).flatMap { case (leaves, conjuncts, filters) =>
      if (leaves.size != jds.size + 1) return None
      // assign each leaf to the fact or exactly one dim (roots are
      // distinct paths, so a leaf can satisfy at most one target);
      // every target must be covered exactly once
      val targets: Seq[(String, () => Option[Long])] =
        (d.baseRoot, d.basisVersion) +:
          jds.map(j => (j.dimRoot, j.dimBasisVersion))
      val assignment = Array.fill(targets.size)(-1)
      leaves.zipWithIndex.foreach { case (leaf, li) =>
        val hit = targets.indexWhere { case (root, basis) =>
          scanOf(leaf, root, basis, d.dims, keyNames).isDefined
        }
        if (hit < 0 || assignment(hit) >= 0) return None
        assignment(hit) = li
      }
      if (assignment.exists(_ < 0)) return None
      val factLeaf = leaves(assignment(0))
      val dimLeaves = jds.indices.map(i => leaves(assignment(i + 1)))
      // every conjunct must be a registered (fact key = that dim's
      // key) equality; per dim, the pair SET must match exactly
      val gotPairs = scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.Set[(String, String)]]
      conjuncts.foreach {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val (fa, da) =
            if (factLeaf.outputSet.contains(a)) (a, b)
            else if (factLeaf.outputSet.contains(b)) (b, a)
            else return None
          val di = dimLeaves.indexWhere(_.outputSet.contains(da))
          if (di < 0) return None
          gotPairs.getOrElseUpdate(di,
            scala.collection.mutable.Set.empty) += ((fa.name, da.name))
        case _ => return None
      }
      val pairsOk = jds.indices.forall { i =>
        gotPairs.get(i).map(_.toSet)
          .contains(jds(i).factKeys.zip(jds(i).dimKeys).toSet)
      }
      if (!pairsOk) return None
      // all side filters were collected (and vetted) by flatten on
      // the way down — the leaves themselves are bare relations
      Some(filters.reduceOption(CatAnd.apply))
    }
  }

  private val summableTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(IntegerType, LongType, ShortType, FloatType, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (defs.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        import scala.jdk.CollectionConverters._
        defs.asScala.view
          .flatMap(d => tryRewrite(agg, groupings, aggExprs, child, d))
          .headOption.getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan,
      d: MvDef): Option[LogicalPlan] = {
    val filterOpt = (if (d.joinDims.nonEmpty) joinScan(child, d,
      d.joinDims)
    else baseScan(child, d)) match {
      case Some(f) => f
      case None => return None
    }
    if (!groupings.forall {
      case a: AttributeReference => d.dims.contains(a.name)
      case _ => false
    }) return None
    val mvPlan = d.mv().queryExecution.analyzed
    def mvAttr(name: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    // every MV column the rewrite needs must exist, or abort whole
    def rebuilt(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference if d.dims.contains(a.name) =>
        mvAttr(a.name).map(m => Alias(m, a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name)
          if d.dims.contains(a.name) =>
        // a (possibly re-named) bare dim, e.g. `d.cat AS category`
        mvAttr(a.name).map(m => Alias(m, name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          Sum(attr: AttributeReference, _), _, false, None, _), name)
          if d.sums.contains(attr.name) &&
            summableTypes.contains(attr.dataType) =>
        mvAttr(d.sums(attr.name)).map(m => Alias(
          AggregateExpression(Sum(m), Complete, isDistinct = false),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), _, false, None, _), name)
          if d.count.isDefined && v != null => // count(NULL) is 0, not n
        mvAttr(d.count.get).map(m => Alias(
          Coalesce(Seq(
            AggregateExpression(Sum(m), Complete, isDistinct = false),
            Literal(0L, LongType))),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          Count(Seq(attr: AttributeReference)), _, false, None, _), name)
          if d.counts.contains(attr.name) =>
        // count(m) — the per-measure NON-NULL count — re-aggregates as
        // sum of the MV's count partials; 0 (never NULL) on an empty
        // rollup, exactly Count's own semantics
        mvAttr(d.counts(attr.name)).map(m => Alias(
          Coalesce(Seq(
            AggregateExpression(Sum(m), Complete, isDistinct = false),
            Literal(0L, LongType))),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          Average(attr: AttributeReference, _), _, false, None, _), name)
          if d.sums.contains(attr.name) && d.counts.contains(attr.name) &&
            summableTypes.contains(attr.dataType) =>
        // avg(m) = sum(mv_sum_m) / sum(mv_count_m) — the PER-MEASURE
        // non-null count, so NULL measure values divide out exactly as
        // the base plan's Average does; an all-NULL rollup bucket
        // (total count 0) yields NULL, never a division error. Both
        // operands cast to double = Average's own output type for
        // these input types (decimals are excluded with the Sum case's
        // rationale: re-aggregation would widen the type).
        for {
          mSum <- mvAttr(d.sums(attr.name))
          mCnt <- mvAttr(d.counts(attr.name))
        } yield {
          val sumE = Cast(
            AggregateExpression(Sum(mSum), Complete, isDistinct = false),
            DoubleType)
          val cntE = Coalesce(Seq(
            AggregateExpression(Sum(mCnt), Complete, isDistinct = false),
            Literal(0L, LongType)))
          Alias(If(EqualTo(cntE, Literal(0L, LongType)),
            Literal(null, DoubleType),
            Divide(sumE, Cast(cntE, DoubleType))),
            name)(exprId = al.exprId)
        }
      case al @ Alias(AggregateExpression(
          Min(attr: AttributeReference), _, false, None, _), name)
          if d.mins.contains(attr.name) =>
        mvAttr(d.mins(attr.name)).map(m => Alias(
          AggregateExpression(Min(m), Complete, isDistinct = false),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          Max(attr: AttributeReference), _, false, None, _), name)
          if d.maxs.contains(attr.name) =>
        mvAttr(d.maxs(attr.name)).map(m => Alias(
          AggregateExpression(Max(m), Complete, isDistinct = false),
          name)(exprId = al.exprId))
      case _ => None
    }
    val newAggs = aggExprs.map(rebuilt)
    if (newAggs.exists(_.isEmpty)) return None
    val newGroupings = groupings.map {
      case a: AttributeReference => mvAttr(a.name).getOrElse(return None)
    }
    val newChild = filterOpt match {
      case None => mvPlan
      case Some(cond) =>
        // re-bind the dims-only filter onto the MV's attributes
        val rebound = cond.transform {
          case a: AttributeReference =>
            mvAttr(a.name).getOrElse(return None)
        }
        Filter(rebound, mvPlan)
    }
    Some(Aggregate(newGroupings, newAggs.map(_.get), newChild))
  }
}
