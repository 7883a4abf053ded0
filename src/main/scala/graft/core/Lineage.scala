package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Column-level lineage from the Catalyst ANALYZED plan (reference:
 * odibi/lineage.py ships dataset-level OpenLineage events; deriving
 * column provenance from the resolved plan is the Spark-native upgrade —
 * no instrumentation, no client, works for any DataFrame).
 *
 * The walk maps every output attribute to the set of source columns it
 * was computed from, where a source column is `relation.column` for file
 * relations (path-derived name), `table.column` for catalog tables, or
 * `column` for local/in-memory data. Derivations (aliases, aggregates,
 * window functions, join keys in projections) union the lineage of every
 * attribute the defining expression references; pass-through nodes
 * (Filter/Sort/Limit/Repartition…) preserve lineage by ExprId, which is
 * stable across the plan. Driver-side plan traversal only — nothing is
 * executed.
 */
object Lineage {

  /** Output column name -> contributing source columns. */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = lineageOf(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId.id, Set.empty[String])).toMap
  }

  /** Distinct source relations feeding the frame (dataset-level lineage). */
  def sourceRelations(df: DataFrame): Set[String] = {
    df.queryExecution.analyzed.collect {
      case r: LogicalRelation => relationName(r)
      case r: DataSourceV2Relation => r.table.name()
      case h: HiveTableRelation => h.tableMeta.identifier.unquotedString
    }.toSet
  }

  private def relationName(r: LogicalRelation): String =
    r.catalogTable.map(_.identifier.unquotedString).getOrElse {
      r.relation match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          f.location.rootPaths.headOption.map(_.getName).getOrElse("relation")
        case _ => "relation"
      }
    }

  private def refs(e: Expression): Seq[Attribute] = e.references.toSeq

  /** attr ExprId -> source column set, computed bottom-up. */
  private def lineageOf(plan: LogicalPlan): Map[Long, Set[String]] = plan match {
    case r: LogicalRelation =>
      val rel = relationName(r)
      r.output.map(a => a.exprId.id -> Set(s"$rel.${a.name}")).toMap
    case r: DataSourceV2Relation =>
      r.output.map(a => a.exprId.id -> Set(s"${r.table.name()}.${a.name}")).toMap
    case h: HiveTableRelation =>
      val rel = h.tableMeta.identifier.unquotedString
      h.output.map(a => a.exprId.id -> Set(s"$rel.${a.name}")).toMap
    case l: LeafNode => // LocalRelation / Range / streaming sources
      l.output.map(a => a.exprId.id -> Set(a.name)).toMap

    case p: Project =>
      val child = lineageOf(p.child)
      child ++ p.projectList.collect {
        case al: Alias =>
          al.exprId.id -> refs(al.child)
            .flatMap(a => child.getOrElse(a.exprId.id, Set(a.name))).toSet
      }
    case a: Aggregate =>
      val child = lineageOf(a.child)
      child ++ a.aggregateExpressions.collect {
        case al: Alias =>
          al.exprId.id -> refs(al.child)
            .flatMap(x => child.getOrElse(x.exprId.id, Set(x.name))).toSet
      }
    case w: Window =>
      val child = lineageOf(w.child)
      child ++ w.windowExpressions.collect {
        case al: Alias =>
          al.exprId.id -> refs(al.child)
            .flatMap(x => child.getOrElse(x.exprId.id, Set(x.name))).toSet
      }
    case g: Generate => // explode & friends: generated cols trace to inputs
      val child = lineageOf(g.child)
      val src = refs(g.generator)
        .flatMap(x => child.getOrElse(x.exprId.id, Set(x.name))).toSet
      child ++ g.generatorOutput.map(a => a.exprId.id -> src)
    case u: Union =>
      // positional merge: output attr i draws from child attr i of EVERY branch
      val childMaps = u.children.map(c => (c, lineageOf(c)))
      u.output.zipWithIndex.map { case (a, i) =>
        a.exprId.id -> childMaps.flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId.id, Set(c.output(i).name))
        }.toSet
      }.toMap
    case e: Expand => // pivot/rollup internals: conservative union per position
      val child = lineageOf(e.child)
      e.output.zipWithIndex.map { case (a, i) =>
        a.exprId.id -> e.projections
          .flatMap(proj => refs(proj(i))
            .flatMap(x => child.getOrElse(x.exprId.id, Set(x.name)))).toSet
      }.toMap
    case j: Join =>
      lineageOf(j.left) ++ lineageOf(j.right)
    case s: SubqueryAlias => lineageOf(s.child)
    case o =>
      // pass-through (Filter/Sort/Limit/Repartition/Distinct/Deduplicate…):
      // ExprIds are preserved, so the union of child maps is exact
      o.children.map(lineageOf).foldLeft(Map.empty[Long, Set[String]])(_ ++ _)
  }
}
