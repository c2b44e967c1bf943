package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Direction, EdgeStep, PropertyGraph}

/** OpenCypher-subset frontend. The reference serves Cypher by translating to
  * Gremlin and reusing the same engine (`api/cypher/CypherAPI.java:49-95`,
  * SURVEY §3.2 — "a frontend translation, not a second engine"); likewise
  * here: MATCH patterns compile onto the same DataFrame joins the DSL uses.
  *
  * Supported grammar:
  * {{{
  *   MATCH (a:person)-[:knows]->(b)<-[:created]-(c)-[:knows*1..3]-(d)
  *   [ MATCH …  |  OPTIONAL MATCH … ]*
  *   [ WHERE a.age > 29 AND b.name = 'lop' ]
  *   RETURN a.name AS who, b.price [ , count(*) AS n ]
  *   [ ORDER BY who [ASC|DESC], b.price … ] [ SKIP s ] [ LIMIT n ]
  * }}}
  * Multiple MATCH clauses join on shared variables (cartesian when none are
  * shared, as in Cypher); OPTIONAL MATCH is a left outer join on the shared
  * variables. Directions `->`, `<-` and UNDIRECTED `-[:l]-` (the BOTH
  * view), optional node labels, conjunctive WHERE with `= <> > >= < <=`
  * against string/number literals, RETURN of `var.prop` projections with
  * aliases and an optional `count(*)` that turns the projection into a
  * grouped count. ORDER BY accepts RETURN aliases or `var.prop`
  * references; SKIP/LIMIT follow Cypher order (skip first).
  *
  * VARIABLE-LENGTH relationships `-[:l*min..max]->` (also `*n` incl. `*0`,
  * `*..max`; `*0..max` adds the identity binding; bare `*` and `*min..`
  * are rejected — this is a bounded engine, state the max) lower
  * onto the layered frontier expansion every traverser uses: hop layers
  * are per-layer DISTINCT (endpoint-pair semantics — the binding is "x is
  * reachable from a within the hop window", one row per distinct (a, x)
  * pair, the reference's kout/kneighbor contract). openCypher's per-PATH
  * multiplicity with relationship-uniqueness is served by the exact path
  * enumerators ([[graft.traverse.PathTraversals.paths]]); the only
  * observable divergence here is a pair whose EVERY in-window walk reuses
  * an edge — such a pair still matches (walk semantics, stated loudly).
  */
object CypherLite {

  private val nodeRe = """\(\s*(\w+)\s*(?::\s*(\w+))?\s*\)""".r
  private val relRe =
    """(<?)-\[\s*:\s*(\w+)\s*(\*\s*(\d+)?\s*(?:\.\.\s*(\d+)?)?)?\s*\]-(>?)""".r
  private val clauseRe = """(?i)\b(OPTIONAL\s+MATCH|MATCH|WHERE|RETURN|ORDER\s+BY|SKIP|LIMIT)\b""".r

  private[api] final case class NodePat(v: String, label: Option[String])
  private[api] final case class RelPat(label: String, forward: Boolean,
                                       undirected: Boolean = false,
                                       minHops: Int = 1, maxHops: Int = 1)
  private[api] final case class MatchClause(nodes: List[NodePat], rels: List[RelPat],
                                            optional: Boolean)
  private[api] final case class WherePred(v: String, prop: String, op: String, value: Any)
  private[api] final case class Ret(v: String, prop: String, alias: String)
  private[api] final case class OrderKey(ref: String, asc: Boolean)
  private[api] final case class Query(matches: List[MatchClause],
                                      preds: List[WherePred], rets: List[Ret],
                                      countAlias: Option[String],
                                      orderBy: List[OrderKey],
                                      skip: Option[Int], limit: Option[Int])

  private def parsePattern(pattern: String, optional: Boolean): MatchClause = {
    val nodes = nodeRe.findAllMatchIn(pattern).map(m =>
      NodePat(m.group(1), Option(m.group(2)))).toList
    val rels = relRe.findAllMatchIn(pattern).map { m =>
      val back = m.group(1) == "<"
      val fwd = m.group(6) == ">"
      require(!(back && fwd), s"relationship cannot point both ways: ${m.matched}")
      val (minH, maxH) = Option(m.group(3)) match {
        case None => (1, 1) // no star: plain single hop
        case Some(star) =>
          val lo = Option(m.group(4)).map(_.toInt)
          val hi = Option(m.group(5)).map(_.toInt)
          val hasDots = star.contains("..")
          (lo, hi) match {
            case (Some(n), None) if !hasDots => (n, n)    // *n
            case (Some(a), Some(b)) => (a, b)             // *a..b
            case (None, Some(b)) => (1, b)                // *..b
            case _ => sys.error(
              s"unbounded variable-length '${m.matched.trim}' unsupported: " +
                "state an explicit max (e.g. *1..3) — bounded engine")
          }
      }
      require(minH >= 0 && maxH >= minH,
        s"bad hop range *$minH..$maxH in ${m.matched}")
      require(maxH <= 16,
        s"variable-length max $maxH exceeds the 16-hop expansion cap")
      RelPat(m.group(2), forward = fwd, undirected = !back && !fwd,
        minHops = minH, maxHops = maxH)
    }.toList
    require(nodes.length == rels.length + 1, s"malformed pattern: $pattern")
    MatchClause(nodes, rels, optional)
  }

  private[api] def parse(q: String): Query = {
    val s = q.trim.replaceAll("\\s+", " ")
    // split into (keyword, body) clause pairs in textual order
    val ms = clauseRe.findAllMatchIn(s).toList
    require(ms.nonEmpty && ms.head.start == 0 &&
      ms.head.group(1).toUpperCase.endsWith("MATCH"), "query must start with MATCH")
    val clauses = ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.length) ms(i + 1).start else s.length
      (m.group(1).toUpperCase.replaceAll("\\s+", " "), s.substring(m.end, end).trim)
    }

    var matches = List.empty[MatchClause]
    var preds = List.empty[WherePred]
    var rets = List.empty[Ret]
    var countAlias: Option[String] = None
    var orderBy = List.empty[OrderKey]
    var skip: Option[Int] = None
    var limit: Option[Int] = None

    clauses.foreach {
      case ("MATCH", body) => matches :+= parsePattern(body, optional = false)
      case ("OPTIONAL MATCH", body) => matches :+= parsePattern(body, optional = true)
      case ("WHERE", body) =>
        preds = body.split("(?i) AND ").toList.map { p =>
          val m = """(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(.+)""".r
            .findFirstMatchIn(p.trim).getOrElse(sys.error(s"bad predicate: $p"))
          val raw = m.group(4).trim
          val value: Any =
            if (raw.startsWith("'")) raw.stripPrefix("'").stripSuffix("'")
            else raw.toDouble
          WherePred(m.group(1), m.group(2), m.group(3), value)
        }
      case ("RETURN", body) =>
        body.split(",").toList.map(_.trim).foreach { r =>
          val cm = """(?i)count\(\*\)(?:\s+AS\s+(\w+))?""".r.findFirstMatchIn(r)
          if (cm.isDefined)
            countAlias = Some(Option(cm.get.group(1)).getOrElse("n"))
          else {
            val m = """(\w+)\.(\w+)(?:\s+(?i:AS)\s+(\w+))?""".r.findFirstMatchIn(r)
              .getOrElse(sys.error(s"bad return item: $r"))
            rets :+= Ret(m.group(1), m.group(2),
              Option(m.group(3)).getOrElse(s"${m.group(1)}_${m.group(2)}"))
          }
        }
      case ("ORDER BY", body) =>
        orderBy = body.split(",").toList.map(_.trim).map { k =>
          val m = """(\S+)(?:\s+(?i)(ASC|DESC))?""".r.findFirstMatchIn(k)
            .getOrElse(sys.error(s"bad order key: $k"))
          OrderKey(m.group(1), !Option(m.group(2)).exists(_.equalsIgnoreCase("DESC")))
        }
      case ("SKIP", body) => skip = Some(body.trim.toInt)
      case ("LIMIT", body) => limit = Some(body.trim.toInt)
      case (kw, _) => sys.error(s"unsupported clause: $kw")
    }
    require(rets.nonEmpty || countAlias.isDefined, "query must have RETURN")
    Query(matches, preds, rets, countAlias, orderBy, skip, limit)
  }

  /** One linear chain → DataFrame of variable columns (vertex ids).
    * Shared with the DSL's `match()` step ([[MatchPattern]]), which builds
    * [[MatchClause]]s programmatically instead of parsing them. */
  private[api] def evalChain(g: PropertyGraph, mc: MatchClause): DataFrame = {
    val n0 = mc.nodes.head
    var frontier: DataFrame = {
      val base = n0.label.map(l => g.verticesOf(l)).getOrElse(g.vertices)
      base.select(col("id").as(n0.v))
    }
    mc.nodes.tail.zip(mc.rels).zipWithIndex.foreach { case ((node, rel), i) =>
      val prevVar = mc.nodes(i).v
      val dir =
        if (rel.undirected) Direction.BOTH
        else if (rel.forward) Direction.OUT else Direction.IN
      val e = EdgeStep(dir, Seq(rel.label)).edgesFor(g).select(col("src"), col("dst"))
      // a REPEATED variable — a cycle pattern like (a)-[:x]->(b)-[:y]->(a)
      // — is an EQUALITY constraint on the already-bound column, never a
      // rebinding: withColumn would silently REPLACE the earlier binding
      // and return every reachable endpoint relabeled as the start
      val rebound = frontier.columns.contains(node.v)
      def bind(df: DataFrame, endCol: String): DataFrame =
        if (rebound) df.filter(col(node.v) === col(endCol)).drop(endCol)
        else df.withColumn(node.v, col(endCol)).drop(endCol)
      frontier =
        if (rel.minHops == 1 && rel.maxHops == 1)
          bind(frontier.join(e, frontier(prevVar) === e("src")).drop("src"),
            "dst")
        else {
          // variable-length: expand the DISTINCT source bindings through
          // the bounded layer loop (each layer distinct — pair semantics,
          // see the object doc), then join the (source, reached) pairs
          // back onto the full binding table. Expanding distinct sources
          // instead of whole rows keeps the per-hop join |sources|-wide
          // however many earlier variables the clause has bound. The end
          // node's LABEL filter pushes into the emitted layers (it only
          // constrains the final binding, never the walk), so a dense
          // middle hop is label-cut before any pair-set distinct.
          val endFilter = node.label.map(l => g.verticesOf(l).select(col("id")))
          val pairs = expandVarLength(e, frontier.select(col(prevVar).as("__a")).distinct(),
            rel.minHops, rel.maxHops, endFilter)
          bind(frontier.join(pairs, frontier(prevVar) === pairs("__a"))
            .drop("__a"), "__x")
        }
      // var-length already label-filtered its emitted pairs; a rebound
      // variable already carries its label constraint from first binding
      if (node.label.isDefined && !rebound &&
          rel.minHops == 1 && rel.maxHops == 1)
        frontier = frontier.join(
          g.verticesOf(node.label.get).select(col("id").as(node.v)),
          Seq(node.v), "left_semi")
    }
    frontier
  }

  /** Bounded variable-length expansion: distinct (__a, __x) pairs where
    * `__x` is reachable from `__a` by a walk of length in [minHops,
    * maxHops] over `e`, optionally end-filtered to ids in `endFilter`.
    * ONE lazy plan (maxHops ≤ 16 self-joins) — no per-hop
    * materialization: the layers reuse `e`'s scan/exchange, and Catalyst
    * sees the whole window at once. The WALKING frontier is distinct-ed
    * per hop (pair-reachability, never walk multiplicity), EXCEPT the
    * final hop — it feeds nothing further, so its pairs go straight
    * through the end filter into the terminal distinct instead of
    * distinct-ing the widest unfiltered pair set of the whole expansion.
    * minHops = 0 contributes the identity binding (`*0..max`, `*0`). */
  private def expandVarLength(e: DataFrame, srcs: DataFrame,
                              minHops: Int, maxHops: Int,
                              endFilter: Option[DataFrame]): DataFrame = {
    def emit(df: DataFrame): DataFrame =
      endFilter.fold(df)(f => df.join(f, df("__x") === f("id"), "left_semi"))
    // the FINAL hop feeds nothing further, so its edges pre-filter to the
    // end label (a semi join on the edge table's dst) — the hop join then
    // EMITS only label-matching pairs instead of the widest unfiltered
    // pair set of the whole expansion (a dense middle layer fans out to
    // every co-member; only the labeled slice ever survives)
    val eEnd = endFilter.fold(e)(f =>
      e.join(f, e("dst") === f("id"), "left_semi"))
    var layer = srcs.select(col("__a"), col("__a").as("__x"))
    var out = List.empty[DataFrame]
    if (minHops == 0) out ::= emit(layer)
    for (h <- 1 to maxHops) {
      val right = if (h == maxHops) eEnd else e
      val stepped = layer.join(right, layer("__x") === right("src"))
        .select(col("__a"), col("dst").as("__x"))
      if (h < maxHops) layer = stepped.distinct()
      if (h >= minHops) out ::= (if (h < maxHops) emit(layer) else stepped)
    }
    out.reduce(_ unionByName _).distinct()
  }

  def eval(g: PropertyGraph, cypher: String): DataFrame = {
    val q = parse(cypher)
    var frontier = evalChain(g, q.matches.head)
    q.matches.tail.foreach { mc =>
      val df = evalChain(g, mc)
      val shared = frontier.columns.intersect(df.columns).toSeq
      frontier =
        if (mc.optional) {
          require(shared.nonEmpty, "OPTIONAL MATCH must share a variable")
          frontier.join(df, shared, "left")
        }
        else if (shared.nonEmpty) frontier.join(df, shared)
        else frontier.crossJoin(df)
    }
    // attach properties referenced by WHERE/RETURN/ORDER BY, one join per
    // (var, prop); left joins so OPTIONAL-introduced nulls survive
    val orderProps = q.orderBy.flatMap { k =>
      k.ref.split("\\.") match {
        case Array(v, p) if frontier.columns.contains(v) => Some((v, p))
        case _ => None
      }
    }
    val needed = (q.preds.map(p => (p.v, p.prop)) ++
      q.rets.map(r => (r.v, r.prop)) ++ orderProps).distinct
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
    def orderCol(k: OrderKey): Column = {
      val base =
        if (q.rets.exists(_.alias == k.ref) || q.countAlias.contains(k.ref)) col(k.ref)
        else k.ref.split("\\.") match {
          // a var.prop that is also RETURNed resolves to its alias — the
          // source column is projected away
          case Array(v, p) => q.rets.find(r => r.v == v && r.prop == p)
            .map(r => col(r.alias)).getOrElse(col(s"${v}_$p"))
          case _ => sys.error(s"unknown order key: ${k.ref}")
        }
      if (k.asc) base.asc else base.desc
    }
    var result = q.countAlias match {
      case Some(alias) if q.rets.isEmpty =>
        frontier.agg(count(lit(1)).as(alias))
      case Some(alias) =>
        frontier.groupBy(projections: _*).agg(count(lit(1)).as(alias))
      case None =>
        // keep the order keys' source columns through the projection
        val retSources = q.rets.map(r => s"${r.v}_${r.prop}").toSet
        val extra = orderProps.map { case (v, p) => s"${v}_$p" }
          .distinct.filterNot(retSources).map(col)
        frontier.select((projections ++ extra): _*)
    }
    if (q.orderBy.nonEmpty) result = result.orderBy(q.orderBy.map(orderCol): _*)
    // project down to the declared aliases (drops order-only carry columns)
    result = q.countAlias match {
      case Some(alias) if q.rets.isEmpty => result
      case Some(alias) => result.select((q.rets.map(r => col(r.alias)) :+ col(alias)): _*)
      case None => result.select(q.rets.map(r => col(r.alias)): _*)
    }
    q.skip.foreach(n => result = result.offset(n))
    q.limit.foreach(n => result = result.limit(n))
    result
  }
}
