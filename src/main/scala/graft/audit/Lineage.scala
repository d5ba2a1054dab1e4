package graft.audit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extracted from the ANALYZED logical plan —
  * the governance question ("which source columns feed this output?")
  * answered from the query itself, not from documentation that
  * drifts. Walks the plan once, mapping every attribute's ExprId to
  * the set of `<source>.<column>` leaves it transitively derives
  * from: projections/aggregations/windows route through their alias
  * expressions, generators through the generator's inputs, unions
  * positionally across branches, Expand (cube/rollup) through each
  * projection slot; joins/filters/sorts/subquery aliases are
  * pass-throughs because analysis preserves their ExprIds.
  *
  * Deliberately derived from the ANALYZED plan, not the optimized
  * one: lineage should reflect what the user WROTE (column pruning
  * doesn't change provenance, and constant-folded columns keep their
  * empty source set honestly — a literal derives from nothing).
  * Driver-side plan traversal, zero jobs, any plan size. */
object Lineage {

  /** Map each OUTPUT column of `df` to the `source.column` leaves it
    * derives from (empty set = derives from no source column, e.g. a
    * literal). Sources are named by the scanned location's last path
    * segment (`orders.parquet`), `local` for in-memory relations. */
  def columns(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId.id, Set.empty[String]))
      .toMap
  }

  private def sourceName(p: LogicalPlan): String = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption
        .map(_.getName).getOrElse("relation")
      case other => other.getClass.getSimpleName.toLowerCase
    }
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  private def walk(p: LogicalPlan): Map[Long, Set[String]] = p match {
    case leaf: LeafNode =>
      val src = sourceName(leaf)
      leaf.output.map(a => a.exprId.id -> Set(s"$src.${a.name}")).toMap
    case other =>
      val child = other.children.map(walk)
        .foldLeft(Map.empty[Long, Set[String]])(_ ++ _)
      def refsOf(e: Expression): Set[String] =
        e.references.toSeq.iterator
          .flatMap(a => child.getOrElse(a.exprId.id, Set.empty[String]))
          .toSet
      def named(exprs: Seq[NamedExpression]): Map[Long, Set[String]] =
        exprs.collect { case a: Alias => a.exprId.id -> refsOf(a.child) }
          .toMap
      val mine: Map[Long, Set[String]] = other match {
        case pr: Project => named(pr.projectList)
        case ag: Aggregate => named(ag.aggregateExpressions)
        case w: Window => named(w.windowExpressions)
        case g: Generate =>
          g.generatorOutput
            .map(a => a.exprId.id -> refsOf(g.generator)).toMap
        case u: Union =>
          u.output.zipWithIndex.map { case (a, i) =>
            a.exprId.id -> u.children.iterator
              .flatMap(c => child.getOrElse(c.output(i).exprId.id,
                Set.empty[String])).toSet
          }.toMap
        case ex: Expand =>
          ex.output.zipWithIndex.map { case (a, i) =>
            a.exprId.id -> ex.projections.iterator
              .flatMap(row => refsOf(row(i))).toSet
          }.toMap
        case _ => Map.empty // joins/filters/sorts/limits: pass-through
      }
      child ++ mine
  }
}
