package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph
import CypherLite.{MatchClause, NodePat, RelPat}

/** TinkerPop `match()` as a declarative DSL step (reference surface: the
  * map-step list of `hugegraph-test/.../tinkerpop/ProcessBasicSuite.java:
  * 104-196`; Gremlin form `g.V().match(as("a").out("knows").as("b"), …)`).
  *
  * Each [[MatchPattern]] is a linear chain binding named variables; the
  * step joins all patterns on their shared variables — the exact planner
  * [[CypherLite]] uses for multi-MATCH clauses — so `match()` compiles to
  * a join tree Catalyst can reorder, not a per-traverser backtracking
  * matcher (the reference routes Cypher through Gremlin the same way;
  * here both frontends share the DataFrame planner in the other
  * direction). */
object MatchPattern {

  /** Start a pattern at variable `v` (TinkerPop `as(v)`). */
  def as(v: String): MatchPattern = new MatchPattern(List(NodePat(v, None)), Nil)
}

final class MatchPattern private[api] (
    private[api] val nodes: List[NodePat],
    private[api] val rels: List[RelPat]) {

  /** Constrain the most recently bound variable to a vertex label
    * (TinkerPop `hasLabel` inside a match fragment). */
  def hasLabel(label: String): MatchPattern =
    new MatchPattern(nodes.init :+ nodes.last.copy(label = Some(label)), rels)

  /** Hop an outgoing edge with this label; bind the head with `.as(v)`. */
  def out(label: String): MatchHop = new MatchHop(this, RelPat(label, forward = true))

  /** Hop an incoming edge with this label; bind the tail with `.as(v)`. */
  def in(label: String): MatchHop = new MatchHop(this, RelPat(label, forward = false))

  private[api] def clause: MatchClause = MatchClause(nodes, rels, optional = false)

  private[api] def startVar: String = nodes.head.v
}

/** A traversed edge awaiting its destination binding (`.as(v)`). */
final class MatchHop private[api] (pat: MatchPattern, rel: RelPat) {
  def as(v: String): MatchPattern =
    new MatchPattern(pat.nodes :+ NodePat(v, None), pat.rels :+ rel)
}

/** The bindings a `match()` step produces: one column per bound variable
  * holding the vertex id — Gremlin's per-traverser binding map, columnar.
  * Follow with [[select]] (Gremlin `select(vars…)`), [[where]], or
  * [[withProp]] to attach vertex properties for predicates/projections. */
final case class MatchResult(g: PropertyGraph, df: DataFrame) {

  /** Attach vertex property `prop` of variable `v` as column `alias`
    * (left join on the binding — CypherLite's property-attachment shape). */
  def withProp(v: String, prop: String, alias: String): MatchResult =
    copy(df = df.join(
      g.vertices.select(col("id").as(v), col(prop).as(alias)), Seq(v), "left"))

  def where(cond: Column): MatchResult = copy(df = df.filter(cond))

  /** Gremlin `select(vars…)`: project the named bindings (or attached
    * property aliases). */
  def select(vars: String*): DataFrame = df.select(vars.map(col): _*)

  /** Resume fluent traversal from one bound variable's vertices. */
  def traverse(v: String): GraphTraversal = GraphTraversal(
    g, g.vertices.join(df.select(col(v).as("id")).distinct(), Seq("id"), "left_semi"),
    isVertex = true)

  def toDF: DataFrame = df
}
