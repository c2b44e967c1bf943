package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Direction, EdgeStep, PropertyGraph}

/** OpenCypher-subset frontend. The reference serves Cypher by translating to
  * Gremlin and reusing the same engine (`api/cypher/CypherAPI.java:49-95`,
  * SURVEY §3.2 — "a frontend translation, not a second engine"); likewise
  * here: a linear MATCH pattern compiles onto the same DataFrame joins the
  * DSL uses.
  *
  * Supported grammar (linear chains):
  * {{{
  *   MATCH (a:person)-[:knows]->(b)<-[:created]-(c) …
  *   WHERE a.age > 29 AND b.name = 'lop'
  *   RETURN a.name AS who, b.price [ , count(*) AS n ]
  * }}}
  * Directions `->` and `<-`, optional node labels, conjunctive WHERE with
  * `= <> > >= < <=` against string/number literals, RETURN of `var.prop`
  * projections with aliases and an optional trailing `count(*)` that turns
  * the projection into a grouped count.
  */
object CypherLite {

  private val nodeRe = """\(\s*(\w+)\s*(?::\s*(\w+))?\s*\)""".r
  private val relRe = """(<?)-\[\s*:\s*(\w+)\s*\]-(>?)""".r

  private[api] final case class NodePat(v: String, label: Option[String])
  private[api] final case class RelPat(label: String, forward: Boolean)
  private[api] final case class WherePred(v: String, prop: String, op: String, value: Any)
  private[api] final case class Ret(v: String, prop: String, alias: String)
  private[api] final case class Query(nodes: List[NodePat], rels: List[RelPat],
                                      preds: List[WherePred], rets: List[Ret],
                                      countAlias: Option[String])

  private[api] def parse(q: String): Query = {
    val s = q.trim.replaceAll("\\s+", " ")
    val mIdx = s.toUpperCase.indexOf("MATCH ")
    require(mIdx == 0, "query must start with MATCH")
    val wIdx = s.toUpperCase.indexOf(" WHERE ")
    val rIdx = s.toUpperCase.indexOf(" RETURN ")
    require(rIdx > 0, "query must have RETURN")
    val pattern = s.substring(6, if (wIdx > 0) wIdx else rIdx).trim
    val whereStr = if (wIdx > 0) s.substring(wIdx + 7, rIdx).trim else ""
    val retStr = s.substring(rIdx + 8).trim

    val nodes = nodeRe.findAllMatchIn(pattern).map(m =>
      NodePat(m.group(1), Option(m.group(2)))).toList
    val rels = relRe.findAllMatchIn(pattern).map { m =>
      val back = m.group(1) == "<"
      val fwd = m.group(3) == ">"
      require(back ^ fwd, s"relationship needs exactly one arrow: ${m.matched}")
      RelPat(m.group(2), forward = fwd)
    }.toList
    require(nodes.length == rels.length + 1, s"malformed pattern: $pattern")

    val preds = if (whereStr.isEmpty) Nil else
      whereStr.split("(?i) AND ").toList.map { p =>
        val m = """(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(.+)""".r
          .findFirstMatchIn(p.trim).getOrElse(sys.error(s"bad predicate: $p"))
        val raw = m.group(4).trim
        val value: Any =
          if (raw.startsWith("'")) raw.stripPrefix("'").stripSuffix("'")
          else raw.toDouble
        WherePred(m.group(1), m.group(2), m.group(3), value)
      }

    var countAlias: Option[String] = None
    val rets = retStr.split(",").toList.map(_.trim).flatMap { r =>
      val cm = """(?i)count\(\*\)(?:\s+AS\s+(\w+))?""".r.findFirstMatchIn(r)
      if (cm.isDefined) { countAlias = Some(cm.get.group(1)).map(Option(_).getOrElse("n")); None }
      else {
        val m = """(\w+)\.(\w+)(?:\s+(?i:AS)\s+(\w+))?""".r.findFirstMatchIn(r)
          .getOrElse(sys.error(s"bad return item: $r"))
        Some(Ret(m.group(1), m.group(2), Option(m.group(3)).getOrElse(s"${m.group(1)}_${m.group(2)}")))
      }
    }
    Query(nodes, rels, preds, rets, countAlias)
  }

  def eval(g: PropertyGraph, cypher: String): DataFrame = {
    val q = parse(cypher)
    // bind node 0
    val n0 = q.nodes.head
    var frontier: DataFrame = {
      val base = n0.label.map(l => g.verticesOf(l)).getOrElse(g.vertices)
      base.select(col("id").as(n0.v))
    }
    // one join per relationship hop
    q.nodes.tail.zip(q.rels).zipWithIndex.foreach { case ((node, rel), i) =>
      val prevVar = q.nodes(i).v
      val dir = if (rel.forward) Direction.OUT else Direction.IN
      val e = EdgeStep(dir, Seq(rel.label)).edgesFor(g).select(col("src"), col("dst"))
      frontier = frontier
        .join(e, frontier(prevVar) === e("src"))
        .withColumn(node.v, col("dst")).drop("src", "dst")
      node.label.foreach { l =>
        frontier = frontier.join(
          g.verticesOf(l).select(col("id").as(node.v)), Seq(node.v), "left_semi")
      }
    }
    // attach the properties referenced by WHERE/RETURN, one join per (var, prop)
    val needed = (q.preds.map(p => (p.v, p.prop)) ++ q.rets.map(r => (r.v, r.prop))).distinct
    needed.foreach { case (v, prop) =>
      frontier = frontier.join(
        g.vertices.select(col("id").as(v), col(prop).as(s"${v}_$prop")),
        Seq(v), "left")
    }
    q.preds.foreach { p =>
      val c = col(s"${p.v}_${p.prop}")
      val cond = p.op match {
        case "=" => c === lit(p.value)
        case "<>" => c =!= lit(p.value)
        case ">" => c > lit(p.value)
        case ">=" => c >= lit(p.value)
        case "<" => c < lit(p.value)
        case "<=" => c <= lit(p.value)
      }
      frontier = frontier.filter(cond)
    }
    val projections = q.rets.map(r => col(s"${r.v}_${r.prop}").as(r.alias))
    q.countAlias match {
      case Some(alias) if q.rets.isEmpty =>
        frontier.agg(count(lit(1)).as(alias))
      case Some(alias) =>
        frontier.groupBy(projections: _*).agg(count(lit(1)).as(alias))
      case None =>
        frontier.select(projections: _*)
    }
  }
}
