package graft

import graft.api.CypherLite
import graft.core.ModernGraph

class CypherLiteSpec extends SparkSpec {
  lazy val g = ModernGraph.build(spark)
  def run(q: String) = CypherLite.eval(g, q)
  def run2(g2: graft.core.PropertyGraph, q: String) = CypherLite.eval(g2, q)

  test("MATCH-WHERE-RETURN over knows") {
    val rows = run("MATCH (a:person)-[:knows]->(b:person) WHERE a.age > 25 RETURN a.name AS x, b.name AS y")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "vadas"), ("marko", "josh")))
  }

  test("two-hop chain with mixed directions") {
    // people who know someone who created software s
    val rows = run("MATCH (a:person)-[:knows]->(b:person)-[:created]->(s:software) RETURN a.name, s.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "lop"), ("marko", "ripple")))
    // reversed arrow: creators of lop that someone knows
    val rev = run("MATCH (s:software)<-[:created]-(b:person)<-[:knows]-(a:person) WHERE s.name = 'lop' RETURN a.name")
      .collect().map(_.getString(0)).toSet
    assert(rev === Set("marko"))
  }

  test("grouped count(*)") {
    val m = run("MATCH (p:person)-[:created]->(s:software) RETURN s.name AS sw, count(*) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("lop" -> 3L, "ripple" -> 1L))
  }

  test("bare count(*)") {
    assert(run("MATCH (p:person)-[:knows]->(q:person) RETURN count(*)")
      .head().getLong(0) === 2L)
  }

  test("numeric and string predicates combine with AND") {
    val rows = run("MATCH (p:person)-[:created]->(s:software) WHERE p.age >= 32 AND s.lang = 'java' RETURN p.name, s.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("josh", "lop"), ("josh", "ripple"), ("peter", "lop")))
  }

  test("multiple MATCH clauses join on shared variables") {
    // who created software AND knows someone
    val rows = run("MATCH (a:person)-[:created]->(s:software) " +
      "MATCH (a)-[:knows]->(b:person) RETURN a.name AS who, s.name AS sw, b.name AS other")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(("marko", "lop", "vadas"), ("marko", "lop", "josh")))
  }

  test("OPTIONAL MATCH keeps unmatched rows with nulls") {
    val rows = run("MATCH (a:person)-[:knows]->(b:person) " +
      "OPTIONAL MATCH (b)-[:created]->(s:software) " +
      "RETURN b.name AS who, s.name AS sw")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // vadas created nothing → null; josh created lop and ripple
    assert(rows === Set(("vadas", None), ("josh", Some("lop")), ("josh", Some("ripple"))))
  }

  test("ORDER BY alias with SKIP and LIMIT pages deterministically") {
    val names = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN p.name AS who, s.name AS sw ORDER BY who ASC, sw ASC SKIP 1 LIMIT 2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // full order: (josh,lop),(josh,ripple),(marko,lop),(peter,lop)
    assert(names === Seq(("josh", "ripple"), ("marko", "lop")))
  }

  test("ORDER BY var.prop not in RETURN") {
    val ages = run("MATCH (p:person)-[:knows]->(q:person) " +
      "RETURN q.name AS who ORDER BY q.age DESC")
      .collect().map(_.getString(0)).toSeq
    assert(ages === Seq("josh", "vadas")) // josh 32 > vadas 27
  }

  test("malformed queries fail cleanly") {
    intercept[Exception](run("SELECT 1"))
    intercept[Exception](run("MATCH (a)<-[:x]->(b) RETURN a.name")) // both arrows
  }

  test("undirected relationship matches both orientations") {
    val rows = run("MATCH (a:person)-[:knows]-(b:person) RETURN a.name, b.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "vadas"), ("marko", "josh"),
      ("vadas", "marko"), ("josh", "marko")))
  }

  test("variable-length: hop window, direction, path-vs-pair mode selection") {
    // PLAIN projection observes multiplicity → PER-PATH mode with
    // relationship-uniqueness (openCypher): from vadas, hop1 {marko}, hop2
    // only vadas→marko→josh (the walk back reuses the edge → excluded)
    val v12 = run("MATCH (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(v12 === Set("marko", "josh"))
    // DISTINCT → the pair-distinct fast path (WALK reachability, the
    // reference's kout/kneighbor contract — documented divergence: vadas
    // itself is reachable only by re-walking the edge and still matches)
    val v12d = run("MATCH (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN DISTINCT b.name")
      .collect().map(_.getString(0)).toSet
    assert(v12d === Set("marko", "vadas", "josh"))
    // *2..2 excludes the 1-hop layer; path mode drops the edge-reusing
    // walk back to vadas, pair mode keeps it
    val v22 = run("MATCH (a:person)-[:knows*2..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(v22 === Set("josh"))
    val v22d = run("MATCH (a:person)-[:knows*2..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN DISTINCT b.name")
      .collect().map(_.getString(0)).toSet
    assert(v22d === Set("vadas", "josh"))
    // *0..1 includes the identity binding (hop 0) in both modes
    val v01 = run("MATCH (a:person)-[:knows*0..1]-(b) " +
      "WHERE a.name = 'vadas' RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(v01 === Set("vadas", "marko"))
    // direction respected: created is person->software, nothing at 2 hops
    val c12 = run("MATCH (a:person)-[:created*1..2]->(s:software) " +
      "WHERE a.name = 'marko' RETURN s.name")
      .collect().map(_.getString(0)).toSet
    assert(c12 === Set("lop"))
    // *n exact count; label filter applies to the reached end
    val exact = run("MATCH (s:software)<-[:created*1..1]-(p:person) " +
      "WHERE s.name = 'lop' RETURN p.name")
      .collect().map(_.getString(0)).toSet
    assert(exact === Set("marko", "josh", "peter"))
    // grouped count(*) counts PATHS (openCypher): each person has one
    // 1-hop neighbor set and exactly one relationship-unique 2-hop path
    // (vadas→marko→josh etc.); the walks back are excluded
    val m = run("MATCH (a:person)-[:knows*1..2]-(b:person) " +
      "RETURN a.name AS who, count(*) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("marko" -> 2L, "vadas" -> 2L, "josh" -> 2L))
    // min/max aggregates don't observe multiplicity → pair mode fires
    // (vadas' walk-only self-pair contributes its own age 27)
    val mm = run("MATCH (a:person)-[:knows*2..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN min(b.age) AS young")
      .head().getInt(0)
    assert(mm === 27) // pair mode: {vadas 27, josh 32}; path mode would say 32
  }

  test("repeated variables constrain equality (cycle patterns), never rebind") {
    // single-hop cycle over the BOTH view: modern has no two DISTINCT
    // knows edges between one pair, so under match-wide relationship
    // uniqueness (path mode, r14) the out-and-back on the same edge is
    // EXCLUDED — empty (a rebinding bug would instead relabel endpoints)
    val rows = run("MATCH (a:person)-[:knows]-(b:person)-[:knows]-(a) " +
      "RETURN a.name, b.name").collect()
    assert(rows.isEmpty)
    // pair mode (DISTINCT) keeps the documented walk-reachability reading
    val rowsd = run("MATCH (a:person)-[:knows]-(b:person)-[:knows]-(a) " +
      "RETURN DISTINCT a.name, b.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rowsd === Set(("marko", "vadas"), ("vadas", "marko"),
      ("marko", "josh"), ("josh", "marko")))
    // directed cycle on a DAG: none
    assert(run("MATCH (a:person)-[:knows]->(b:person)-[:knows]->(a) " +
      "RETURN a.name").collect().isEmpty)
    // var-length back to the start: PATH mode (plain projection) needs two
    // DISTINCT edges a→x→a — modern has no parallel edges, so none exist…
    val cyc = run("MATCH (a:person)-[:knows*2..2]-(a) RETURN a.name")
      .collect().map(_.getString(0)).toSet
    assert(cyc === Set.empty)
    // …while DISTINCT (pair mode, walk semantics) keeps the walks back
    val cycd = run("MATCH (a:person)-[:knows*2..2]-(a) RETURN DISTINCT a.name")
      .collect().map(_.getString(0)).toSet
    assert(cycd === Set("marko", "vadas", "josh"))
    // *0 exact: identity only — a IS b
    val z = run("MATCH (a:person)-[:knows*0]-(b) WHERE a.name = 'vadas' RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(z === Set("vadas"))
  }

  test("relationship variable: edge-property WHERE, RETURN and ORDER BY") {
    // r binds the edge; weight/date are edge properties (EdgeCoreTest.java
    // edge-prop families in the reference)
    val rows = run("MATCH (a:person)-[r:knows]->(b:person) WHERE r.weight >= 0.5 " +
      "RETURN a.name AS x, b.name AS y, r.weight AS w")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows === Set(("marko", "vadas", 0.5), ("marko", "josh", 1.0)))
    val strict = run("MATCH (a:person)-[r:knows]->(b:person) WHERE r.weight > 0.5 " +
      "RETURN b.name AS y").collect().map(_.getString(0)).toSet
    assert(strict === Set("josh"))
    // string edge prop + ORDER BY r.prop not in RETURN
    val byDate = run("MATCH (a:person)-[r:created]->(s:software) " +
      "RETURN a.name AS who ORDER BY r.date ASC, who ASC")
      .collect().map(_.getString(0)).toSeq
    // dates: josh 20091111, peter 20170324, marko/josh 20171210
    assert(byDate === Seq("josh", "peter", "josh", "marko"))
    // undirected rel variable carries props in both orientations
    val undir = run("MATCH (a:person)-[r:knows]-(b:person) WHERE r.weight = 1.0 " +
      "RETURN a.name, b.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(undir === Set(("marko", "josh"), ("josh", "marko")))
  }

  test("WHERE boolean grammar: OR, NOT, parentheses, precedence") {
    // OR across variables
    val or = run("MATCH (p:person)-[:created]->(s:software) " +
      "WHERE p.age > 33 OR s.name = 'ripple' RETURN p.name, s.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(or === Set(("peter", "lop"), ("josh", "ripple")))
    // NOT binds tighter than AND; AND tighter than OR
    val prec = run("MATCH (p:person)-[:created]->(s:software) " +
      "WHERE NOT s.name = 'lop' OR p.age >= 35 AND p.name = 'peter' " +
      "RETURN p.name, s.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(prec === Set(("josh", "ripple"), ("peter", "lop")))
    // parens override: (NOT lop OR age>=35) AND marko — empty
    assert(run("MATCH (p:person)-[:created]->(s:software) " +
      "WHERE (NOT s.name = 'lop' OR p.age >= 35) AND p.name = 'marko' " +
      "RETURN p.name").collect().isEmpty)
    // three-valued logic: NOT (null = x) filters the row (software has no age)
    val tvl = run("MATCH (p:person)-[:knows]->(q:person) " +
      "WHERE NOT q.city = 'Beijing' RETURN q.name")
      .collect().map(_.getString(0)).toSet
    assert(tvl === Set("vadas"))
    intercept[Exception](run("MATCH (a:person) WHERE (a.age > 1 RETURN a.name")) // unbalanced
    intercept[Exception](run("MATCH (a:person) WHERE a.age >! 1 RETURN a.name")) // bad op
  }

  test("RETURN aggregations with implicit grouping") {
    // grouped by the non-aggregated item (openCypher implicit grouping)
    val m = run("MATCH (p:person)-[r:created]->(s:software) " +
      "RETURN s.name AS sw, count(*) AS n, max(r.weight) AS w, min(p.age) AS young")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(m === Map("lop" -> ((3L, 0.4, 29)), "ripple" -> ((1L, 1.0, 32))))
    // global aggregates (no plain items → no keys)
    val g0 = run("MATCH (p:person) RETURN count(*) AS n, avg(p.age) AS a, sum(p.age) AS s")
      .head()
    assert(g0.getLong(0) === 4L && g0.getDouble(1) === 30.75 && g0.getLong(2) === 123L)
    // collect() is sorted (deterministic-order contract)
    val c = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN s.name AS sw, collect(p.name) AS who ORDER BY sw ASC")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList))
    assert(c.toList === List(("lop", List("josh", "marko", "peter")),
      ("ripple", List("josh"))))
    // count(v.prop) skips nulls: vadas created nothing → s is null
    val cnt = run("MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s:software) " +
      "RETURN count(s.name) AS n").head().getLong(0)
    assert(cnt === 4L) // marko 1 + josh 2 + peter 1; vadas contributes 0
    // ORDER BY an aggregate alias
    val top = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN s.name AS sw, count(*) AS n ORDER BY n DESC LIMIT 1")
      .head().getString(0)
    assert(top === "lop")
  }

  test("variable-length + edge-property filter pushes into every hop") {
    // all knows edges qualify at >= 0.5: path mode (plain projection) —
    // marko reaches {vadas, josh} in 1; every 2-hop walk would reuse its
    // first edge (relationship-uniqueness) so nothing is added
    val all = run("MATCH (a:person)-[r:knows*1..2]-(b) " +
      "WHERE a.name = 'marko' AND r.weight >= 0.5 RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(all === Set("vadas", "josh"))
    // DISTINCT (pair mode, walk semantics) keeps the walk back to marko
    val alld = run("MATCH (a:person)-[r:knows*1..2]-(b) " +
      "WHERE a.name = 'marko' AND r.weight >= 0.5 RETURN DISTINCT b.name")
      .collect().map(_.getString(0)).toSet
    assert(alld === Set("vadas", "josh", "marko"))
    // only marko-josh (1.0) qualifies at > 0.6 — vadas unreachable; the
    // 2-hop walk back would reuse the one qualifying edge → path mode
    // yields josh only, pair mode adds marko
    val strict = run("MATCH (a:person)-[r:knows*1..2]-(b) " +
      "WHERE a.name = 'marko' AND r.weight > 0.6 RETURN b.name")
      .collect().map(_.getString(0)).toSet
    assert(strict === Set("josh"))
    val strictd = run("MATCH (a:person)-[r:knows*1..2]-(b) " +
      "WHERE a.name = 'marko' AND r.weight > 0.6 RETURN DISTINCT b.name")
      .collect().map(_.getString(0)).toSet
    assert(strictd === Set("josh", "marko"))
    // RETURN r.prop on a var-length rel is list-valued → loud error
    intercept[Exception](run("MATCH (a)-[r:knows*1..2]-(b) RETURN r.weight"))
    // a var-length rel predicate under OR cannot push → loud error
    intercept[Exception](run("MATCH (a)-[r:knows*1..2]-(b) " +
      "WHERE r.weight > 0.5 OR a.name = 'marko' RETURN b.name"))
  }

  test("reserved and duplicate variable names are rejected") {
    intercept[Exception](run("MATCH (__a:person)-[:knows]->(b) RETURN b.name"))
    intercept[Exception](run("MATCH (src:person)-[:knows]->(b) RETURN b.name"))
    intercept[Exception](run("MATCH (a)-[dst:knows]->(b) RETURN b.name"))
    intercept[Exception](run("MATCH (a)-[__x:knows]->(b) RETURN b.name"))
    // duplicate relationship variable (openCypher rel uniqueness)
    intercept[Exception](run("MATCH (a)-[r:knows]->(b)-[r:created]->(s) RETURN s.name"))
    // node/rel variable collision
    intercept[Exception](run("MATCH (a)-[a:knows]->(b) RETURN b.name"))
  }

  test("disconnected MATCH: small cross products work, big ones are guarded") {
    val prod = run("MATCH (p:person) MATCH (s:software) " +
      "RETURN p.name AS who, s.name AS sw")
    assert(prod.count() === 8L) // 4 people x 2 software
    val prev = sys.props.get("graft.cypher.crossLimit")
    sys.props("graft.cypher.crossLimit") = "1"
    try intercept[Exception] {
      run("MATCH (p:person) MATCH (s:software) RETURN p.name, s.name").count()
    } finally prev match {
      case Some(v) => sys.props("graft.cypher.crossLimit") = v
      case None => sys.props.remove("graft.cypher.crossLimit")
    }
  }

  test("IS NULL / IS NOT NULL and string operators") {
    // software vertices have no city → IS NULL; person city IS NOT NULL
    val sw = run("MATCH (v:software) WHERE v.city IS NULL RETURN v.name")
      .collect().map(_.getString(0)).toSet
    assert(sw === Set("lop", "ripple"))
    val withCity = run("MATCH (v) WHERE v.city IS NOT NULL RETURN v.name")
      .collect().map(_.getString(0)).toSet
    assert(withCity === Set("marko", "vadas", "josh", "peter"))
    // STARTS WITH / ENDS WITH / CONTAINS
    val s1 = run("MATCH (p:person) WHERE p.name STARTS WITH 'ma' RETURN p.name")
      .collect().map(_.getString(0)).toSet
    assert(s1 === Set("marko"))
    val s2 = run("MATCH (p:person) WHERE p.name ENDS WITH 'sh' OR p.name CONTAINS 'ada' " +
      "RETURN p.name").collect().map(_.getString(0)).toSet
    assert(s2 === Set("josh", "vadas"))
    // IS NULL with OPTIONAL MATCH: people who created nothing
    val none = run("MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s:software) " +
      "WHERE s.name IS NULL RETURN p.name")
      .collect().map(_.getString(0)).toSet
    assert(none === Set("vadas"))
  }

  test("property-to-property comparisons, including across variables") {
    val older = run("MATCH (a:person)-[:knows]->(b:person) WHERE a.age > b.age " +
      "RETURN a.name, b.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(older === Set(("marko", "vadas"))) // marko 29 > vadas 27; josh 32 > 29 fails
    // bare-variable equality (node identity) over the BOTH view
    val self = run("MATCH (a:person)-[:knows]-(b:person) WHERE a = b RETURN a.name")
      .collect()
    assert(self.isEmpty)
    // rhs prop-ref on an edge variable
    val wGt = run("MATCH (a:person)-[r:created]->(s:software) " +
      "WHERE s.price > 200 AND r.weight < 1.0 RETURN a.name, s.name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(wGt === Set(("marko", "lop"), ("josh", "lop"), ("peter", "lop")))
  }

  test("bare-variable RETURN projects the binding id; DISTINCT dedups rows") {
    val ids2 = run("MATCH (p:person)-[:created]->(s:software) RETURN s")
      .collect().map(_.getString(0)).toList.sorted
    assert(ids2 === List("software:lop", "software:lop", "software:lop", "software:ripple"))
    val dist = run("MATCH (p:person)-[:created]->(s:software) RETURN DISTINCT s")
      .collect().map(_.getString(0)).toSet
    assert(dist === Set("software:lop", "software:ripple"))
    val distProp = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN DISTINCT s.lang AS lang").collect().map(_.getString(0)).toSeq
    assert(distProp === Seq("java"))
    // DISTINCT + ORDER BY a non-returned prop is rejected (Cypher too)
    intercept[Exception](run("MATCH (p:person) RETURN DISTINCT p.city AS c " +
      "ORDER BY p.age").collect())
  }

  test("count(DISTINCT), count(bare var), collect(DISTINCT)") {
    val g0 = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN count(DISTINCT s.lang) AS langs, count(s.lang) AS rows_").head()
    assert(g0.getLong(0) === 1L && g0.getLong(1) === 4L)
    // count(bare var) skips OPTIONAL nulls
    val cnt = run("MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s:software) " +
      "RETURN p.name AS who, count(s) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt === Map("marko" -> 1L, "vadas" -> 0L, "josh" -> 2L, "peter" -> 1L))
    val cd = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN collect(DISTINCT s.name) AS sw").head().getSeq[String](0).toList
    assert(cd === List("lop", "ripple"))
    // sum(DISTINCT) is supported since r15 — see the dedicated test
    assert(run("MATCH (p:person) RETURN sum(DISTINCT p.age) AS s")
      .head().getLong(0) === 123L)
  }

  test("WITH stage: aggregate then filter, bindings survive into RETURN") {
    // creators of >1 software (the count-filter idiom)
    val m = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n WHERE n > 1 RETURN p.name AS who, n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(m.toList === List(("josh", 2L)))
    // post-WITH WHERE on a carried variable's property + bare alias
    val m2 = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n WHERE p.age > 30 AND n >= 1 " +
      "RETURN p.name AS who ORDER BY who ASC")
      .collect().map(_.getString(0)).toSeq
    assert(m2 === Seq("josh", "peter"))
    // WITH DISTINCT as a dedup stage; second aggregation in RETURN
    val m3 = run("MATCH (p:person)-[:knows]->(q:person)-[:created]->(s:software) " +
      "WITH DISTINCT s RETURN count(*) AS n").head().getLong(0)
    assert(m3 === 2L) // lop + ripple, deduped before the count
    // OPTIONAL + count(bare) + HAVING-style zero filter
    val zero = run("MATCH (p:person) OPTIONAL MATCH (p)-[:created]->(s:software) " +
      "WITH p, count(s) AS n WHERE n = 0 RETURN p.name AS who")
      .collect().map(_.getString(0)).toSet
    assert(zero === Set("vadas"))
    // WITH … ORDER BY … LIMIT paginates the STAGE output (top-k-then-
    // expand); a bare stage ORDER BY without pagination is rejected
    val topc = run("MATCH (p:person)-[:created]->(s) " +
      "WITH p, count(*) AS n ORDER BY n DESC LIMIT 1 " +
      "MATCH (p)-[:created]->(s2:software) " +
      "RETURN p.name AS who, n, s2.name AS sw ORDER BY sw ASC")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(topc === Seq(("josh", 2L, "lop"), ("josh", 2L, "ripple")))
    intercept[Exception](run("MATCH (p:person)-[:created]->(s) " +
      "WITH p, count(*) AS n ORDER BY n DESC RETURN p.name AS who"))
    intercept[Exception](run("MATCH (p:person)-[:created]->(s) " +
      "WITH p, count(*) AS n ORDER BY p.age DESC LIMIT 1 RETURN p.name AS who"))
    // loud errors: rel var through WITH, var not carried
    intercept[Exception](run("MATCH (a)-[r:knows]->(b) WITH a RETURN r.weight"))
    intercept[Exception](run("MATCH (a:person) WITH a RETURN b.name")) // b not carried
  }

  test("multiple WITH pipeline stages chain in clause order") {
    // stage 1 aggregates per creator, stage 2 re-aggregates the counts
    val two = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n " +
      "WITH n, count(*) AS creators " +
      "RETURN n, creators ORDER BY n ASC")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(two === Seq((1L, 2L), (2L, 1L))) // marko+peter created 1, josh 2
    // MATCH inside BOTH stages; rel-var prop crosses a stage as an alias
    val rel = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH DISTINCT p " +
      "MATCH (p)-[r:knows]->(q:person) " +
      "WITH p, r.weight AS w, q " +
      "WHERE w >= 1.0 " +
      "MATCH (q)-[:created]->(s2:software) " +
      "RETURN p.name AS who, w, s2.name AS sw ORDER BY sw ASC")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSeq
    assert(rel === Seq(("marko", 1.0, "lop"), ("marko", 1.0, "ripple")))
    // three stages with pagination in the middle
    val three = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n ORDER BY n DESC, p ASC LIMIT 2 " +
      "WITH p, n * 10 AS score " +
      "RETURN p.name AS who, score ORDER BY score DESC, who ASC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(three === Seq(("josh", 20L), ("marko", 10L)))
    // a rel var from an EARLIER stage still dies at the next WITH
    intercept[Exception](run("MATCH (a:person) WITH a " +
      "MATCH (a)-[r:knows]->(b) WITH a, b RETURN r.weight AS w"))
  }

  test("MATCH after WITH: the pipeline's second pattern block") {
    // aggregate per creator, then expand to who they know
    val rows = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n_sw MATCH (p)-[:knows]->(q:person) " +
      "RETURN p.name AS who, n_sw, q.name AS other")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows === Set(("marko", 1L, "vadas"), ("marko", 1L, "josh")))
    // WHERE after the second block filters the joined frontier
    val filtered = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n_sw MATCH (p)-[:knows]->(q:person) " +
      "WHERE q.age > 30 RETURN p.name AS who, n_sw, q.name AS other")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(filtered === Set(("marko", 1L, "josh")))
    // stage WHERE (between WITH and the second MATCH) still filters the
    // stage output BEFORE the join
    val staged = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n_sw WHERE n_sw > 1 " +
      "MATCH (p)-[:knows]->(q:person) RETURN p.name AS who")
      .collect()
    assert(staged.isEmpty) // josh creates 2 but knows nobody
    // OPTIONAL MATCH after WITH left-joins
    val opt = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) AS n_sw OPTIONAL MATCH (p)-[:knows]->(q:person) " +
      "RETURN p.name AS who, n_sw, q.name AS other")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(opt === Set(
      ("marko", 1L, Some("vadas")), ("marko", 1L, Some("josh")),
      ("josh", 2L, None), ("peter", 1L, None)))
    // relationship variable in the second block: edge-prop WHERE + RETURN
    val rel = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH DISTINCT p MATCH (p)-[r:knows]->(q:person) " +
      "WHERE r.weight >= 1.0 RETURN p.name AS who, r.weight AS w, q.name AS other")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(rel === Set(("marko", 1.0, "josh")))
    // var-length rel VARIABLE after WITH is rejected; plain var-length works
    intercept[Exception](run("MATCH (a:person) WITH a " +
      "MATCH (a)-[r:knows*1..2]->(b) RETURN a.name"))
    val vl = run("MATCH (p:person)-[:created]->(s:software) WITH DISTINCT p " +
      "MATCH (p)-[:knows*1..2]->(q:person) RETURN p.name AS who, q.name AS other")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(vl === Set(("marko", "vadas"), ("marko", "josh")))
  }

  test("pattern predicates: WHERE (a)-[:l]->(b) semi joins, NOT anti joins") {
    // existential: who created at least one software
    val creators = run("MATCH (a:person) WHERE (a)-[:created]->(:software) " +
      "RETURN a.name AS who").collect().map(_.getString(0)).toSet
    assert(creators === Set("marko", "josh", "peter"))
    // negated: who created nothing (anonymous unlabeled end node)
    val non = run("MATCH (a:person) WHERE NOT (a)-[:created]->() " +
      "RETURN a.name AS who").collect().map(_.getString(0)).toSet
    assert(non === Set("vadas"))
    // combined with a comparison conjunct; predicate on a non-start var
    val rows = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WHERE (b)-[:created]->(:software) AND a.age > 25 " +
      "RETURN b.name AS who").collect().map(_.getString(0)).toSet
    assert(rows === Set("josh"))
    // undirected predicate over the BOTH view
    val und = run("MATCH (a:person) WHERE (a)-[:knows]-() RETURN a.name AS who")
      .collect().map(_.getString(0)).toSet
    assert(und === Set("marko", "vadas", "josh"))
    // bound-to-bound predicate constrains the pair, not just one end
    val pair = run("MATCH (a:person)-[:knows]->(b:person) " +
      "MATCH (c:software) WHERE (b)-[:created]->(c) " +
      "RETURN b.name AS who, c.name AS sw")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pair === Set(("josh", "lop"), ("josh", "ripple")))
    // pattern predicate in the second block's WHERE
    val second = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH DISTINCT p MATCH (p)-[:knows]->(q:person) " +
      "WHERE (q)-[:created]->(:software) RETURN q.name AS who")
      .collect().map(_.getString(0)).toSet
    assert(second === Set("josh"))
    // loud errors: OR-nesting, rel variable inside the predicate,
    // no bound variable
    intercept[Exception](run("MATCH (a:person) " +
      "WHERE (a)-[:created]->() OR a.age > 1 RETURN a.name"))
    intercept[Exception](run("MATCH (a:person) " +
      "WHERE (a)-[r:created]->() RETURN a.name"))
    intercept[Exception](run("MATCH (a:person) " +
      "WHERE (x)-[:created]->(y) RETURN a.name"))
  }

  test("RETURN value expressions: arithmetic, functions, aggregates over exprs") {
    // per-row arithmetic with precedence and parens
    val d = run("MATCH (p:person) RETURN p.name AS who, p.age * 2 + 1 AS d " +
      "ORDER BY who ASC").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(d === Seq(("josh", 65L), ("marko", 59L), ("peter", 71L), ("vadas", 55L)))
    // scalar functions + coalesce over a missing property
    val f = run("MATCH (s:software) RETURN toUpper(s.name) AS nm, " +
      "size(s.name) AS len, coalesce(s.age, 0) AS a ORDER BY nm ASC")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(f === Seq(("LOP", 3L, 0L), ("RIPPLE", 6L, 0L)))
    // aggregate over an expression + an EXPRESSION group key
    val m = run("MATCH (p:person) RETURN p.age % 2 AS parity, " +
      "sum(p.age * 2) AS s, count(*) AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m === Set((1L, 182L, 3L), (0L, 64L, 1L)))
    // expression through a WITH stage, then reused by alias
    val w = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, count(*) * 10 AS score WHERE score >= 10 " +
      "RETURN p.name AS who, score + 1 AS s1 ORDER BY who ASC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(w === Seq(("josh", 21L), ("marko", 11L), ("peter", 11L)))
    // unary minus and division (always floating)
    val u = run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN -p.age AS neg, p.age / 2 AS half")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(u === ((-29L, 14.5)))
    // loud errors: expression without AS, unknown function
    intercept[Exception](run("MATCH (p:person) RETURN p.age + 1"))
    intercept[Exception](run("MATCH (p:person) RETURN frob(p.age) AS x"))
  }

  test("UNWIND: leading literal list and post-WITH collected-list explode") {
    // parameter fan-out: literal list cross-joined small, WHERE equality cuts
    val rows = run("UNWIND ['marko', 'josh', 'nobody'] AS nm " +
      "MATCH (p:person)-[:created]->(s:software) WHERE p.name = nm " +
      "RETURN nm, count(*) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("marko", 1L), ("josh", 2L)))
    // pure literal unwind, no MATCH at all
    val pure = run("UNWIND [3, 1, 2] AS x RETURN x ORDER BY x ASC")
      .collect().map(_.getLong(0)).toSeq
    assert(pure === Seq(1L, 2L, 3L))
    // post-WITH: collect() then explode, WHERE filters post-unwind rows
    val ex = run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, collect(s.name) AS sw UNWIND sw AS one " +
      "WHERE one STARTS WITH 'l' RETURN p.name AS who, one")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ex === Set(("marko", "lop"), ("josh", "lop"), ("peter", "lop")))
    // loud: literal UNWIND not leading; post-WITH UNWIND of a non-alias
    intercept[Exception](run("MATCH (p:person) UNWIND [1] AS x RETURN x"))
    intercept[Exception](run("MATCH (p:person) WITH p UNWIND [1, 2] AS x RETURN x"))
  }

  test("shortestPath(): min-hop pairs, unlabeled rels, length(p)") {
    // undirected unlabeled BFS from one source (WHERE equality pushed into
    // the source set): lop at 1 hop, ripple at 2 (through josh)
    val sp = run("MATCH p = shortestPath((a:person)-[*..3]-(s:software)) " +
      "WHERE a.name = 'marko' RETURN s.name AS sw, length(p) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sp === Set(("lop", 1L), ("ripple", 2L)))
    // directed + labeled, all sources
    val kn = run("MATCH p = shortestPath((a:person)-[:knows*..2]->(b:person)) " +
      "RETURN a.name AS who, b.name AS other, length(p) AS len")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(kn === Set(("marko", "vadas", 1L), ("marko", "josh", 1L)))
    // *0.. includes the identity pair at length 0
    val z = run("MATCH p = shortestPath((a:person)-[:knows*0..2]->(b:person)) " +
      "WHERE a.name = 'vadas' RETURN b.name AS other, length(p) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(z === Set(("vadas", 0L)))
    // unlabeled single-hop rel in a plain pattern
    val un = run("MATCH (a:person)-[]->(x) WHERE a.name = 'marko' " +
      "RETURN x.name AS n").collect().map(_.getString(0)).toSet
    assert(un === Set("vadas", "josh", "lop"))
    // loud errors: single-hop shortestPath, bare path projection,
    // length() of a non-path
    intercept[Exception](run(
      "MATCH p = shortestPath((a)-[:knows]->(b)) RETURN length(p) AS l"))
    intercept[Exception](run(
      "MATCH p = shortestPath((a)-[:knows*..2]->(b)) RETURN p"))
    intercept[Exception](run(
      "MATCH (a:person) RETURN length(a.name) AS l"))
  }

  test("plain named paths: RETURN p, nodes(p), length(p), per-path rows") {
    // var-length named path: one ROW PER PATH, p renders the vertex
    // sequence, nodes(p) the id array, length(p) the hop count
    val rows = run("MATCH p = (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN p AS path, length(p) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(
      ("person:vadas->person:marko", 1L),
      ("person:vadas->person:marko->person:josh", 2L)))
    val ns = run("MATCH p = (a:person)-[:created*1..2]->(s:software) " +
      "WHERE a.name = 'marko' RETURN nodes(p) AS ns")
      .collect().map(_.getSeq[String](0).toList)
    assert(ns.toList === List(List("person:marko", "software:lop")))
    // single-hop named path: one row per relationship
    val sh = run("MATCH p = (a:person)-[:created]->(s:software) " +
      "RETURN p AS path, length(p) AS len ORDER BY path ASC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sh === Seq(
      ("person:josh->software:lop", 1L),
      ("person:josh->software:ripple", 1L),
      ("person:marko->software:lop", 1L),
      ("person:peter->software:lop", 1L)))
    // *0..1: the zero-length path is a one-node path
    val z = run("MATCH p = (a:person)-[:knows*0..1]->(b) " +
      "WHERE a.name = 'vadas' RETURN p AS path, length(p) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(z === Set(("person:vadas", 0L)))
    // ORDER BY length(p) as an expression key
    val byLen = run("MATCH p = (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN p AS path ORDER BY length(p) DESC")
      .collect().map(_.getString(0)).toSeq
    assert(byLen.head === "person:vadas->person:marko->person:josh")
    // aggregating over paths counts PATHS
    val cnt = run("MATCH p = (a:person)-[:knows*1..2]-(b:person) " +
      "RETURN count(*) AS n").head().getLong(0)
    assert(cnt === 6L) // 4 one-hop walks (both orientations) + 2 two-hop
  }

  test("allShortestPaths(): every min-hop path, nodes/length projectable") {
    val asp = run("MATCH p = allShortestPaths((a:person)-[*..2]-(s:software)) " +
      "WHERE a.name = 'marko' RETURN s.name AS sw, length(p) AS len, " +
      "count(*) AS n_paths")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // lop directly created (1 hop); ripple through josh (2 hops, 1 path) —
    // lop at 2 hops is NOT shortest so it stays at len 1
    assert(asp === Set(("lop", 1L, 1L), ("ripple", 2L, 1L)))
    // path projection: the actual vertex sequences
    val paths = run("MATCH p = allShortestPaths((a:person)-[*..2]-(s:software)) " +
      "WHERE a.name = 'vadas' RETURN p AS path")
      .collect().map(_.getString(0)).toSet
    assert(paths === Set("person:vadas->person:marko->software:lop"))
    // nodes(p) on allShortestPaths works (unlike shortestPath)
    val n = run("MATCH p = allShortestPaths((a:person)-[:knows*..2]->(b:person)) " +
      "WHERE a.name = 'marko' RETURN nodes(p) AS ns")
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(n === Set(List("person:marko", "person:vadas"),
      List("person:marko", "person:josh")))
  }

  test("path-variable misuse fails loudly at parse/plan time") {
    // nodes() on a shortestPath variable (only length is materialized)
    intercept[Exception](run(
      "MATCH p = shortestPath((a)-[:knows*..2]->(b)) RETURN nodes(p) AS n"))
    // length()/nodes() on a non-path variable
    intercept[Exception](run(
      "MATCH (a:person) RETURN length(a) AS l"))
    intercept[Exception](run(
      "MATCH (a:person)-[:knows]->(b) RETURN nodes(b) AS n"))
    // path projections don't survive WITH
    intercept[Exception](run(
      "MATCH p = (a:person)-[:knows*1..2]-(b:person) WITH a, b " +
        "RETURN length(p) AS len"))
    intercept[Exception](run(
      "MATCH p = (a:person)-[:knows*1..2]-(b:person) WITH a, b " +
        "RETURN p"))
    // …but aliasing them in the first WITH carries them forward
    val ok = run("MATCH p = (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' WITH b, length(p) AS len " +
      "RETURN b.name AS other, len ORDER BY len ASC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ok === Seq(("marko", 1L), ("josh", 2L)))
    // named path after WITH is unsupported (loud)
    intercept[Exception](run(
      "MATCH (a:person) WITH a MATCH p = (a)-[:knows*1..2]->(b) " +
        "RETURN length(p) AS l"))
    // a multi-segment named path is rejected
    intercept[Exception](run(
      "MATCH p = (a)-[:knows]->(b)-[:created]->(s) RETURN p"))
    // relationships(p) on a LABELED plain path is supported since r14 (see
    // the dedicated test); a non-path argument stays loud
    intercept[Exception](run(
      "MATCH (a:person)-[:knows]->(b) RETURN relationships(a) AS r"))
    // a named path on OPTIONAL MATCH would silently drop the binding —
    // rejected loudly instead
    intercept[Exception](run(
      "MATCH (a:person) OPTIONAL MATCH p = (a)-[:knows*1..2]->(b) " +
        "RETURN a.name AS who"))
  }

  test("WHERE expression comparisons: arithmetic, parens, functions") {
    val e = run("MATCH (p:person) WHERE p.age % 2 = 1 " +
      "RETURN p.name AS who ORDER BY who ASC")
      .collect().map(_.getString(0)).toSeq
    assert(e === Seq("marko", "peter", "vadas")) // 29, 35, 27 odd
    val f = run("MATCH (p:person) WHERE (p.age + 1) * 2 > 64 " +
      "RETURN p.name AS who").collect().map(_.getString(0)).toSet
    assert(f === Set("josh", "peter"))
    val s = run("MATCH (p:person) WHERE size(p.name) = 5 AND p.age < 30 " +
      "RETURN p.name AS who").collect().map(_.getString(0)).toSet
    assert(s === Set("marko", "vadas"))
    // expression-to-expression across variables
    val h = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WHERE a.age + 3 = b.age RETURN b.name AS who")
      .collect().map(_.getString(0)).toSet
    assert(h === Set("josh")) // 29 + 3 = 32
    // boolean grouping parens still group (no comparator at top level)
    val p = run("MATCH (p:person) WHERE (p.age > 30 OR p.age < 28) " +
      "AND p.name <> 'peter' RETURN p.name AS who")
      .collect().map(_.getString(0)).toSet
    assert(p === Set("vadas", "josh"))
  }

  test("CASE expressions: multi-branch, missing ELSE, inside aggregates") {
    val b = run("MATCH (p:person) RETURN CASE WHEN p.age > 30 THEN 'old' " +
      "ELSE 'young' END AS bucket, count(*) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(b === Set(("old", 2L), ("young", 2L)))
    // no ELSE → null for non-matching rows
    val v = run("MATCH (p:person) WHERE p.name = 'vadas' " +
      "RETURN CASE WHEN p.age >= 30 THEN 1 END AS x").collect().head
    assert(v.isNullAt(0))
    // boolean-grammar condition (OR) + CASE nested inside an aggregate
    val n = run("MATCH (p:person) RETURN " +
      "sum(CASE WHEN p.age < 30 OR p.age > 34 THEN 1 ELSE 0 END) AS n")
      .head().getLong(0)
    assert(n === 3L) // 29, 27, 35
    // multi-branch with arithmetic values
    val m = run("MATCH (p:person) RETURN p.name AS who, " +
      "CASE WHEN p.age % 2 = 0 THEN p.age * 10 ELSE p.age END AS v " +
      "ORDER BY who ASC").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(m === Seq(("josh", 320L), ("marko", 29L), ("peter", 35L), ("vadas", 27L)))
    // the simple CASE <expr> form compiles to subject-equality branches
    val simple = run("MATCH (p:person) RETURN p.name AS who, " +
      "CASE p.age WHEN 29 THEN 'exact' WHEN 27 THEN 'young' ELSE 'other' " +
      "END AS bucket ORDER BY who ASC")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(simple === Seq(("josh", "other"), ("marko", "exact"),
      ("peter", "other"), ("vadas", "young")))
    // no ELSE + no match → null
    assert(run("MATCH (p:person) WHERE p.name = 'peter' " +
      "RETURN CASE p.age WHEN 1 THEN 'x' END AS y").head().isNullAt(0))
  }

  test("string-literal + concatenates; other ops reject string operands") {
    val cat = run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN p.name + '!' AS x").head().getString(0)
    assert(cat === "marko!")
    // number + string literal concatenates too (Neo4j 'a1' contract)
    val mix = run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN p.age + '!' AS x").head().getString(0)
    assert(mix === "29!")
    intercept[Exception](run("MATCH (p:person) RETURN p.age - 'x' AS y"))
    intercept[Exception](run("MATCH (p:person) RETURN 'x' * 2 AS y"))
  }

  test("RETURN must be the last clause (only ORDER BY/SKIP/LIMIT follow)") {
    intercept[Exception](run(
      "MATCH (a:person) RETURN a.name AS x WITH a RETURN a.name AS y"))
    intercept[Exception](run(
      "MATCH (a:person) RETURN a.name AS x MATCH (b:software) RETURN b"))
    // the legal modifiers still work after RETURN
    val ok = run("MATCH (a:person) RETURN a.name AS x ORDER BY x ASC LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    assert(ok === Seq("josh", "marko"))
  }

  test("UNWIND edge cases: empty list, negative literals, alias collision") {
    assert(run("UNWIND [] AS x RETURN x").collect().isEmpty)
    val neg = run("UNWIND [-1, 2, -3.5] AS x RETURN x ORDER BY x ASC")
      .collect().map(_.getDouble(0)).toSeq
    assert(neg === Seq(-3.5, -1.0, 2.0))
    // post-WITH UNWIND must not silently rebind a carried variable
    intercept[Exception](run("MATCH (p:person)-[:created]->(s:software) " +
      "WITH p, collect(s.name) AS xs UNWIND xs AS p RETURN p"))
  }

  test("ORDER BY value expressions") {
    // function key over a non-returned property expression
    val bySize = run("MATCH (s:software) RETURN s.name AS nm " +
      "ORDER BY size(s.name) DESC").collect().map(_.getString(0)).toSeq
    assert(bySize === Seq("ripple", "lop"))
    // arithmetic key (unary minus flips the order); prop not in RETURN
    val arith = run("MATCH (p:person) RETURN p.name AS who ORDER BY -p.age ASC")
      .collect().map(_.getString(0)).toSeq
    assert(arith === Seq("peter", "josh", "marko", "vadas"))
    // under aggregation: expression over a RETURN alias is legal…
    val agg = run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN s.name AS sw, count(*) AS n ORDER BY n * -1 ASC")
      .collect().map(_.getString(0)).toSeq
    assert(agg === Seq("lop", "ripple"))
    // …but a grouped-away source property is rejected loudly
    intercept[Exception](run("MATCH (p:person)-[:created]->(s:software) " +
      "RETURN s.name AS sw, count(*) AS n ORDER BY p.age + 1"))
  }

  test("type(r) projects the relationship label; validated arguments") {
    // grouped by type over an UNLABELED relationship variable
    val t = run("MATCH (a:person)-[r]->(x) WHERE a.name = 'marko' " +
      "RETURN type(r) AS t, count(*) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t === Map("knows" -> 2L, "created" -> 1L))
    // type() in WHERE (expression comparison)
    val w = run("MATCH (a:person)-[r]->(x) WHERE type(r) = 'created' " +
      "RETURN a.name AS who, x.name AS what")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w === Set(("marko", "lop"), ("josh", "lop"),
      ("josh", "ripple"), ("peter", "lop")))
    // loud: node variable, var-length relationship variable
    intercept[Exception](run("MATCH (a:person) RETURN type(a) AS t"))
    intercept[Exception](run("MATCH (a)-[r:knows*1..2]-(b) " +
      "WHERE r.weight >= 0.5 RETURN type(r) AS t"))
    // labels(n): singleton label list for nodes (closed single-label schema)
    val l = run("MATCH (a)-[:created]->(s) " +
      "RETURN labels(a) AS la, labels(s) AS ls, count(*) AS n").head()
    assert(l.getSeq[String](0).toList === List("person") &&
      l.getSeq[String](1).toList === List("software") && l.getLong(2) === 4L)
    intercept[Exception](run(
      "MATCH (a)-[r:knows]->(b) RETURN labels(r) AS x"))
  }

  test("conversion functions: toInteger / toFloat / toString") {
    val r = run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN toInteger(p.age / 2) AS i, toFloat(p.age) AS f, " +
      "toString(p.age) AS s").head()
    assert(r.getLong(0) === 14L && r.getDouble(1) === 29.0 &&
      r.getString(2) === "29")
    // non-numeric string → null (openCypher)
    assert(run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN toInteger(p.city) AS i").head().isNullAt(0))
  }

  test("write clauses: CREATE / SET / DETACH DELETE, batch semantics") {
    // CREATE with the PRIMARY_KEY id splice (person ids are person:<name>)
    val g1 = CypherLite.evalWrite(g,
      "CREATE (v:person {name: 'newguy', age: 99, city: 'Oslo'})")
    val back = CypherLite.eval(g1,
      "MATCH (p:person) WHERE p.age > 40 RETURN p AS id, p.age AS age")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(back === Set(("person:newguy", 99)))
    // the source graph is untouched (immutable batches)
    assert(CypherLite.eval(g, "MATCH (p:person) WHERE p.age > 40 RETURN p")
      .collect().isEmpty)
    // id collision is loud (CREATE never upserts)
    intercept[Exception](CypherLite.evalWrite(g1,
      "CREATE (v:person {name: 'newguy', age: 1})"))
    // SET: a column update over the matched set, reading the row itself
    val g2 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.age > 30 SET p.age = p.age * 10")
    val ages = CypherLite.eval(g2,
      "MATCH (p:person) RETURN p.name AS nm, p.age AS age")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(ages === Set(("marko", 29), ("vadas", 27),
      ("josh", 320), ("peter", 350)))
    // DETACH DELETE drops the vertex and every incident edge
    val g3 = CypherLite.evalWrite(g,
      "MATCH (s:software) WHERE s.name = 'lop' DETACH DELETE s")
    assert(CypherLite.eval(g3, "MATCH (s:software) RETURN s.name AS nm")
      .collect().map(_.getString(0)).toSet === Set("ripple"))
    assert(CypherLite.eval(g3,
      "MATCH (p:person)-[:created]->(x) RETURN DISTINCT p.name AS nm")
      .collect().map(_.getString(0)).toSet === Set("josh"))
    // loud rejections: plain DELETE, SET reading another variable,
    // unknown property, underivable id
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (s:software) DELETE s"))
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (a:person)-[:knows]->(b) SET a.age = b.age"))
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (p:person) SET p.frobnitz = 1"))
    intercept[Exception](CypherLite.evalWrite(g,
      "CREATE (v:person {age: 5})"))
    // duplicate ids WITHIN one CREATE batch are loud too
    intercept[Exception](CypherLite.evalWrite(g,
      "CREATE (v:person {name: 'dup', age: 1}), (w:person {name: 'dup', age: 2})"))
    // MERGE (node form): idempotent — matching nodes are no-ops, absent
    // ids insert; re-merging the same batch changes nothing
    val m1 = CypherLite.evalWrite(g,
      "MERGE (v:person {name: 'marko', age: 29}), " +
        "(w:person {name: 'newbie', age: 1})")
    assert(m1.vertices.count() === g.vertices.count() + 1)
    val m2 = CypherLite.evalWrite(m1,
      "MERGE (v:person {name: 'marko', age: 29}), " +
        "(w:person {name: 'newbie', age: 1})")
    assert(m2.vertices.count() === m1.vertices.count())
    // same id, different given property → loud conflict
    intercept[Exception](CypherLite.evalWrite(g,
      "MERGE (v:person {name: 'marko', age: 99})"))
  }

  test("cross-segment relationship uniqueness in path mode (r13 ask #7)") {
    // diamond through marko: the same physical knows edge may not serve
    // BOTH segments of one MATCH (openCypher match-wide uniqueness) — so
    // a walk out and straight back on one edge is excluded
    val rows = run("MATCH (a:person)-[:knows]-(b:person)-[:knows]-(c:person) " +
      "RETURN a.name AS a, b.name AS b, c.name AS c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(("vadas", "marko", "josh"), ("josh", "marko", "vadas")))
    // single-hop + var-length mix: the var-length walk may not reuse the
    // first segment's edge
    val mix = run("MATCH (a:person)-[:knows]-(b)-[:knows*1..2]-(c) " +
      "WHERE a.name = 'vadas' RETURN a.name AS a, b.name AS b, c.name AS c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(mix === Set(("vadas", "marko", "josh")))
    // pair mode (DISTINCT) keeps the documented walk-reachability
    // divergence: the same query under DISTINCT also reaches back
    val pair = run("MATCH (a:person)-[:knows]-(b)-[:knows*1..2]-(c) " +
      "WHERE a.name = 'vadas' RETURN DISTINCT c.name AS c")
      .collect().map(_.getString(0)).toSet
    assert(pair === Set("vadas", "josh", "marko"))
    // disjoint labeled segments never share an edge — results unchanged by
    // the threading guard (knows vs created)
    val dj = run("MATCH (a:person)-[:knows]->(b:person)-[:created]->(s:software) " +
      "RETURN a.name AS a, s.name AS s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dj === Set(("marko", "lop"), ("marko", "ripple")))
  }

  test("relationships(p) renders the per-hop relationship list") {
    // var-length named path: one array element per hop, traversal order
    val r = run("MATCH p = (a:person)-[:knows*1..2]->(b) " +
      "WHERE a.name = 'marko' RETURN b.name AS nm, relationships(p) AS rels")
      .collect().map(x => (x.getString(0), x.getSeq[String](1).toList)).toSet
    assert(r === Set(
      ("vadas", List("person:marko-[knows]-person:vadas")),
      ("josh", List("person:marko-[knows]-person:josh"))))
    // single-hop named path
    val s1 = run("MATCH p = (j:person)-[:created]->(s:software) " +
      "WHERE j.name = 'josh' RETURN relationships(p) AS rels")
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(s1 === Set(List("person:josh-[created]-software:lop"),
      List("person:josh-[created]-software:ripple")))
    // allShortestPaths with a labeled segment renders too
    val asp = run("MATCH p = allShortestPaths((a:person)-[:knows*..2]->(b)) " +
      "WHERE a.name = 'marko' RETURN relationships(p) AS rels")
      .collect().map(_.getSeq[String](0).toList)
    assert(asp.forall(_.forall(_.contains("-[knows]-"))))
    // unlabeled segments and shortestPath() are loud
    val e1 = intercept[Exception](run(
      "MATCH p = (a:person)-[*1..2]->(b) RETURN relationships(p) AS r"))
    assert(e1.getMessage.contains("SINGLE-LABEL"))
    intercept[Exception](run(
      "MATCH p = shortestPath((a:person)-[:knows*..2]->(b)) " +
        "RETURN relationships(p) AS r"))
  }

  test("path-mode explosion warning fires without changing results") {
    // factor 1: any expansion wider than its source count warns — from
    // marko, *1..2 yields 2 paths from 1 source. The observation is an
    // accumulator (no extra jobs); results are untouched.
    System.setProperty("graft.cypher.pathWarnFactor", "1")
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
    var msg = ""
    val out = try {
      val o = run("MATCH (a:person)-[:knows*1..2]-(b) WHERE a.name = 'marko' " +
        "RETURN b.name").collect().map(_.getString(0)).toSet
      // the listener reports asynchronously on the listener bus — keep the
      // stderr redirect active while polling for it
      msg = errBuf.toString("UTF-8")
      val deadline = System.nanoTime() + 10000000000L
      while (!msg.contains("PATH expansion") && System.nanoTime() < deadline) {
        Thread.sleep(50); msg = errBuf.toString("UTF-8")
      }
      o
    } finally {
      System.setErr(prevErr)
      System.setProperty("graft.cypher.pathWarnFactor", "32")
    }
    assert(out === Set("vadas", "josh"))
    assert(msg.contains("PATH expansion") && msg.contains("distinct source"),
      s"expected an explosion warning, got: $msg")
  }

  test("UNION and UNION ALL combine complete queries") {
    // bare UNION dedups (set semantics): marko appears on both sides once
    val u = run("MATCH (p:person)-[:knows]->(q:person) RETURN p.name AS nm " +
      "UNION MATCH (p:person)-[:created]->(s:software) RETURN p.name AS nm")
      .collect().map(_.getString(0)).toSet
    assert(u === Set("marko", "josh", "peter"))
    // UNION ALL preserves multiplicity: marko knows 2 + creates 4 rows
    val ua = run("MATCH (p:person)-[:knows]->(q:person) RETURN p.name AS nm " +
      "UNION ALL MATCH (p:person)-[:created]->(s:software) RETURN p.name AS nm")
      .collect().map(_.getString(0)).toList.sorted
    assert(ua === List("josh", "josh", "marko", "marko", "marko", "peter"))
    // three segments chain; ORDER BY binds to its own segment
    val t3 = run("MATCH (p:person) WHERE p.age > 30 RETURN p.name AS nm " +
      "UNION ALL MATCH (s:software) RETURN s.name AS nm " +
      "UNION ALL MATCH (p:person) WHERE p.age < 28 RETURN p.name AS nm " +
      "ORDER BY nm LIMIT 1")
      .collect().map(_.getString(0)).toList.sorted
    assert(t3 === List("josh", "lop", "peter", "ripple", "vadas"))
    // a literal ' UNION ' never splits (quote-aware scan)
    val lit = run("MATCH (p:person) WHERE p.city = 'UNION town' " +
      "RETURN p.name AS nm").collect()
    assert(lit.isEmpty)
    // mismatched columns and mixed UNION kinds are loud
    intercept[Exception](run("MATCH (p:person) RETURN p.name AS a " +
      "UNION MATCH (s:software) RETURN s.name AS b"))
    intercept[Exception](run("MATCH (p:person) RETURN p.name AS nm " +
      "UNION MATCH (s:software) RETURN s.name AS nm " +
      "UNION ALL MATCH (s:software) RETURN s.name AS nm"))
  }

  test("relationship MERGE: match-by-key-else-create, ON CREATE/ON MATCH") {
    val stmt = "MERGE (a:person {name: 'vadas'})-[r:created]->" +
      "(s:software {name: 'lop'}) " +
      "ON CREATE SET r.weight = 0.3 ON MATCH SET r.weight = 0.7"
    // vadas never created lop → created with the ON CREATE value
    val g1 = CypherLite.evalWrite(g, stmt)
    assert(g1.edges.count() === g.edges.count() + 1)
    def w(gr: graft.core.PropertyGraph) = CypherLite.eval(gr,
      "MATCH (a:person)-[r:created]->(s:software) WHERE a.name = 'vadas' " +
        "RETURN r.weight AS w").collect().map(_.getDouble(0)).toSeq
    assert(w(g1) === Seq(0.3))
    // re-merge: key matches → no new edge, ON MATCH SET fires
    val g2 = CypherLite.evalWrite(g1, stmt)
    assert(g2.edges.count() === g1.edges.count())
    assert(w(g2) === Seq(0.7))
    // key-matching edge with DIFFERENT given props is a loud conflict
    intercept[Exception](CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:created {weight: 9.9}]->" +
        "(s:software {name: 'lop'})"))
    // …matching given props are a no-op
    val g3 = CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:created {weight: 0.4}]->" +
        "(s:software {name: 'lop'})")
    assert(g3.edges.count() === g.edges.count())
    // an absent endpoint is node-MERGEd in (whole-pattern MERGE)
    val g4 = CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:created]->" +
        "(s:software {name: 'neo', lang: 'scala'})")
    assert(g4.vertices.count() === g.vertices.count() + 1)
    assert(g4.edges.count() === g.edges.count() + 1)
    // sort-keyed MULTIPLE label: same sort key matches, a different one
    // creates the sort-distinguished second edge (EdgeId splice semantics)
    val g5 = CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:knows {date: '20160110'}]->" +
        "(b:person {name: 'vadas'})")
    assert(g5.edges.count() === g.edges.count())
    val g6 = CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:knows {date: '20991231'}]->" +
        "(b:person {name: 'vadas'})")
    assert(g6.edges.count() === g.edges.count() + 1)
    // backward patterns and non-literal props are loud
    intercept[Exception](CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'vadas'})<-[r:knows]-(b:person {name: 'marko'})"))
    intercept[Exception](CypherLite.evalWrite(g,
      "MERGE (a:person {name: 'marko'})-[r:knows]->(b:person {name: 'vadas'}) " +
        "ON MATCH SET r.weight = r.weight + 1"))
  }

  test("DISTINCT over an aggregated projection keeps path mode (r13 advice)") {
    // `RETURN DISTINCT b.name, count(*)` — DISTINCT over grouped rows is a
    // no-op, so the count must be the openCypher PER-PATH count, not the
    // pair-distinct walk count: from vadas, hop2 back to vadas reuses the
    // edge and is excluded (no vadas row at all)
    val m = run("MATCH (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN DISTINCT b.name AS nm, count(*) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("marko" -> 1L, "josh" -> 1L))
    // an all-plain DISTINCT projection still picks the pair plan
    val d = run("MATCH (a:person)-[:knows*1..2]-(b:person) " +
      "WHERE a.name = 'vadas' RETURN DISTINCT b.name AS nm")
      .collect().map(_.getString(0)).toSet
    assert(d === Set("marko", "vadas", "josh"))
  }

  test("nested string concat classifies recursively (r13 advice)") {
    val s = run("MATCH (p:person) WHERE p.name = 'marko' " +
      "RETURN ('x_' + p.name) + p.city AS s")
      .collect().map(_.getString(0)).toSet
    assert(s === Set("x_markoBeijing"))
    // a numeric operator over a string-producing nested expression is loud,
    // not a silent NULL
    val e = intercept[Exception](run("MATCH (p:person) " +
      "RETURN ('a_' + p.name) * 2 AS x"))
    assert(e.getMessage.contains("string"))
  }

  test("ORDER BY length(p) after WITH fails loudly (r13 advice)") {
    val e = intercept[Exception](run(
      "MATCH p = (a:person)-[:knows*1..2]->(b) WITH a.name AS nm " +
        "RETURN nm ORDER BY length(p)"))
    assert(e.getMessage.contains("do not survive WITH"))
  }

  test("SET/DELETE keywords inside string literals don't split (r13 advice)") {
    // ' set ' inside the WHERE literal must not be taken as the SET clause
    val g1 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.city = 'the set place' SET p.age = 1")
    assert(g1.vertices.count() === g.vertices.count())
    assert(CypherLite.eval(g1, "MATCH (p:person) WHERE p.age = 1 RETURN p")
      .collect().isEmpty)
    // ' delete ' inside a literal likewise
    val g2 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.name = 'they delete things' DETACH DELETE p")
    assert(g2.vertices.count() === g.vertices.count())
  }

  test("variable-length rejects unbounded and over-cap windows loudly") {
    intercept[Exception](
      run("MATCH (a)-[:knows*]->(b) RETURN a.name")) // bare * unbounded
    intercept[Exception](
      run("MATCH (a)-[:knows*2..]->(b) RETURN a.name")) // open max
    intercept[Exception](
      run("MATCH (a)-[:knows*1..99]->(b) RETURN a.name")) // over the 16 cap
    intercept[Exception](
      run("MATCH (a)-[:knows*3..2]->(b) RETURN a.name")) // inverted range
  }

  test("REMOVE nulls out the matched rows' property cells") {
    val g1 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.age > 30 REMOVE p.age, p.city")
    assert(CypherLite.eval(g1,
      "MATCH (p:person) WHERE p.age IS NULL RETURN count(*) AS n")
      .head().getLong(0) === 2L) // josh + peter
    // unmatched rows keep their values; the source graph is untouched
    assert(CypherLite.eval(g1,
      "MATCH (p:person) WHERE p.name = 'marko' RETURN p.age AS a")
      .head().getInt(0) === 29)
    assert(run("MATCH (p:person) WHERE p.age IS NULL RETURN count(*) AS n")
      .head().getLong(0) === 0L)
    // REMOVE v:Label and unknown properties are loud
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (p:person) REMOVE p:person"))
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (p:person) REMOVE p.nope"))
    // ' remove ' inside a WHERE string literal never splits the clause
    val g2 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.name = 'they remove things' REMOVE p.age")
    assert(CypherLite.eval(g2,
      "MATCH (p:person) WHERE p.age IS NULL RETURN count(*) AS n")
      .head().getLong(0) === 0L)
  }

  test("multi-assignment SET: items apply in order over ONE match") {
    // the second item reads the FIRST one's update (openCypher SET-item
    // sequencing) — and the match never re-runs, so updating the very
    // property the WHERE filtered on still hits the originally-matched rows
    val g1 = CypherLite.evalWrite(g,
      "MATCH (p:person) WHERE p.age < 30 " +
        "SET p.age = 999, p.city = toString(p.age)")
    val rows = CypherLite.eval(g1,
      "MATCH (p:person) WHERE p.age = 999 RETURN p.name AS n, p.city AS c")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows === Map("marko" -> "999", "vadas" -> "999"))
    // assignments across two variables are loud (one match, one target)
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (a:person)-[:knows]->(b:person) SET a.age = 1, b.age = 2"))
  }

  test("string functions: substring 0-based, left/right/replace/split/trim") {
    val r = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "substring(p.name, 1, 3) AS s1, substring(p.name, 3) AS s2, " +
      "left(p.name, 2) AS l, right(p.name, 2) AS rr, reverse(p.name) AS rv, " +
      "replace(p.name, 'ko', 'KO') AS rp, trim(p.name) AS tr, " +
      "ltrim(p.name) AS lt, rtrim(p.name) AS rt, split(p.name, 'a') AS parts")
      .head()
    assert(r.getString(0) === "ark" && r.getString(1) === "ko")
    assert(r.getString(2) === "ma" && r.getString(3) === "ko")
    assert(r.getString(4) === "okram" && r.getString(5) === "marKO")
    assert(r.getString(6) === "marko" && r.getString(7) === "marko" &&
      r.getString(8) === "marko")
    assert(r.getSeq[String](9) === Seq("m", "rko"))
    // replace is LITERAL, never a regex — '.' matches only a dot
    assert(run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "replace(p.name, '.', 'X') AS x").head().getString(0) === "marko")
    // size() is LIST length on list-producing expressions, string
    // length otherwise
    val sz = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "size(split(p.name, 'a')) AS ns, size(p.name) AS nc").head()
    assert(sz.getLong(0) === 2L && sz.getLong(1) === 5L)
    // right(s, n) with n beyond the length returns the whole string
    assert(run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "right(p.name, 99) AS x").head().getString(0) === "marko")
  }

  test("math functions: sqrt/floor/ceil/sign/exp/log/round(x, n)") {
    val r = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "sqrt(p.age * 0 + 4) AS sq, floor(p.age / 2) AS fl, " +
      "ceil(p.age / 2) AS ce, sign(0 - p.age) AS sg, " +
      "round(exp(p.age * 0), 6) AS ex, round(log(p.age * 0 + 1), 6) AS ln, " +
      "log10(p.age * 0 + 100) AS lg, round(p.age / 7, 2) AS r2").head()
    assert(r.getDouble(0) === 2.0)
    assert(r.getDouble(1) === 14.0 && r.getDouble(2) === 15.0) // FLOAT, openCypher
    assert(r.getLong(3) === -1L) // INTEGER, openCypher
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 0.0)
    assert(r.getDouble(6) === 2.0)
    assert(r.getDouble(7) === 4.14)
  }

  test("EXISTS { … } subqueries: inner WHERE, NOT form, edge props, loud OR") {
    // inner WHERE on a node property
    assert(run("MATCH (p:person) WHERE EXISTS " +
      "{ MATCH (p)-[:created]->(s:software) WHERE s.name = 'ripple' } " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("josh"))
    // semi-join semantics: never a row multiplier (josh created TWO
    // java-lang packages but appears once)
    assert(run("MATCH (p:person) WHERE EXISTS " +
      "{ MATCH (p)-[:created]->(s:software) WHERE s.lang = 'java' } " +
      "RETURN p.name AS n").count() === 3L)
    // NOT EXISTS → anti join
    assert(run("MATCH (p:person) WHERE NOT EXISTS " +
      "{ MATCH (p)-[:created]->(:software) } RETURN p.name AS n")
      .collect().map(_.getString(0)).toSet === Set("vadas"))
    // relationship variable + edge-property filter inside the subquery
    assert(run("MATCH (p:person) WHERE EXISTS " +
      "{ MATCH (p)-[r:knows]->(x:person) WHERE r.weight >= 0.9 } " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("marko"))
    // MATCH keyword optional; anonymous end node
    assert(run("MATCH (p:person) WHERE EXISTS { (p)-[:knows]->() } " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("marko"))
    // combined with an ordinary conjunct
    assert(run("MATCH (p:person) WHERE p.age > 30 AND EXISTS " +
      "{ MATCH (p)-[:created]->(s:software) WHERE s.lang = 'java' } " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet ===
      Set("josh", "peter"))
    // inner WHERE referencing an unbound variable is loud
    intercept[Exception](run("MATCH (p:person) WHERE EXISTS " +
      "{ MATCH (p)-[:knows]->(x) WHERE zz.age > 1 } RETURN p.name AS n")
      .collect())
    // OR-nesting is loud (only the conjunct placement lowers to a join)
    intercept[Exception](run("MATCH (p:person) WHERE p.age > 90 OR EXISTS " +
      "{ MATCH (p)-[:knows]->(x) } RETURN p.name AS n").collect())
  }

  test("COUNT { … } subquery conjuncts: zero counts, inner WHERE, loud NOT") {
    // marko created 1, josh 2, peter 1, vadas 0
    assert(run("MATCH (p:person) WHERE COUNT { (p)-[:created]->(:software) } >= 2 " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("josh"))
    // zero-match rows count 0 (the LEFT join, not an inner join)
    assert(run("MATCH (p:person) WHERE COUNT { (p)-[:created]->(:software) } = 0 " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("vadas"))
    // inner WHERE filters the chain before counting
    assert(run("MATCH (p:person) WHERE " +
      "COUNT { MATCH (p)-[r:knows]->(x) WHERE r.weight >= 0.9 } = 1 " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("marko"))
    // composes with ordinary conjuncts; never multiplies rows
    assert(run("MATCH (p:person) WHERE p.age < 33 AND " +
      "COUNT { (p)-[:created]->() } >= 1 RETURN p.name AS n")
      .collect().map(_.getString(0)).toSet === Set("marko", "josh"))
    // NOT COUNT is loud — invert the comparator instead
    intercept[Exception](run("MATCH (p:person) WHERE " +
      "NOT COUNT { (p)-[:created]->() } > 0 RETURN p.name AS n").collect())
    // missing comparator is loud
    intercept[Exception](run("MATCH (p:person) WHERE " +
      "COUNT { (p)-[:created]->() } RETURN p.name AS n").collect())
  }

  test("IN list membership: strings, numbers, NOT IN, empty list") {
    assert(run("MATCH (p:person) WHERE p.name IN ['marko', 'vadas', 'nope'] " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet ===
      Set("marko", "vadas"))
    assert(run("MATCH (p:person) WHERE p.age IN [29, 35] RETURN p.name AS n")
      .collect().map(_.getString(0)).toSet === Set("marko", "peter"))
    assert(run("MATCH (p:person) WHERE NOT p.name IN ['marko'] " +
      "RETURN count(*) AS n").head().getLong(0) === 3L)
    // `IN []` is always false (openCypher), never an error
    assert(run("MATCH (p:person) WHERE p.name IN [] RETURN count(*) AS n")
      .head().getLong(0) === 0L)
    // composes with other conjuncts and edge props
    assert(run("MATCH (a:person)-[r:knows]->(b) " +
      "WHERE r.weight IN [1.0] RETURN b.name AS n")
      .collect().map(_.getString(0)).toSet === Set("josh"))
  }

  test("id(n) projects the element id; query parameters substitute") {
    assert(run("MATCH (p:person) WHERE p.name = 'marko' RETURN id(p) AS i")
      .head().getString(0) === "person:marko")
    // $param substitution: strings, numbers, lists; quote-aware ($ inside
    // a string literal is text)
    assert(CypherLite.eval(g,
      "MATCH (p:person) WHERE p.name = $who AND p.age > $min " +
        "RETURN p.name AS n", Map("who" -> "marko", "min" -> 20))
      .head().getString(0) === "marko")
    assert(CypherLite.eval(g,
      "MATCH (p:person) WHERE p.name IN $names RETURN count(*) AS n",
      Map("names" -> Seq("marko", "vadas"))).head().getLong(0) === 2L)
    assert(CypherLite.eval(g,
      "MATCH (p:person) WHERE p.name = '$who' RETURN count(*) AS n",
      Map("who" -> "x")).head().getLong(0) === 0L) // literal '$who', no sub
    intercept[Exception](CypherLite.eval(g,
      "MATCH (p:person) WHERE p.name = $who RETURN p.name AS n", Map.empty))
    intercept[Exception](CypherLite.eval(g,
      "MATCH (p:person) WHERE p.name = $who RETURN p.name AS n",
      Map("who" -> "o'brien"))) // unescapable quote is loud
    // Gremlin scripts share the machinery
    assert(graft.api.GremlinLite.eval(g,
      "g.V().hasLabel('person').has('age', gt($min)).values('name')",
      Map("min" -> 30)).collect().map(_.getString(0)).toSet ===
      Set("josh", "peter"))
  }

  test("RETURN * expands to the declared node variables") {
    val df = run("MATCH (a:person)-[:created]->(s:software) " +
      "WHERE s.name = 'ripple' RETURN *")
    assert(df.columns.toSeq === Seq("a", "s"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("person:josh", "software:ripple")))
    // mixes with explicit items; leading UNWIND alias joins the expansion
    val df2 = run("MATCH (a:person)-[:knows]->(b) RETURN *, a.age AS age")
    assert(df2.columns.toSeq === Seq("a", "b", "age"))
    // rel variables are omitted (no scalar binding) — project explicitly
    assert(run("MATCH (a:person)-[r:knows]->(b) RETURN *").columns.toSeq ===
      Seq("a", "b"))
    // WITH * / post-WITH RETURN * are supported since r15 (see the
    // dedicated WITH * test); the rename flows through the star
    assert(run("MATCH (a:person) WITH * RETURN a").columns.toSeq === Seq("a"))
    assert(run("MATCH (a:person) WITH a AS x RETURN *").columns.toSeq ===
      Seq("x"))
  }

  test("=~ regex operator (whole-string) and head()/last() list functions") {
    // =~ matches the WHOLE string (openCypher / java matches())
    assert(run("MATCH (p:person) WHERE p.name =~ 'm.*o' RETURN p.name AS n")
      .collect().map(_.getString(0)).toSet === Set("marko"))
    assert(run("MATCH (p:person) WHERE p.name =~ 'ark' RETURN count(*) AS n")
      .head().getLong(0) === 0L) // substring find() would match marko
    // alternation + NOT
    assert(run("MATCH (p:person) WHERE NOT p.name =~ 'marko|vadas' " +
      "RETURN count(*) AS n").head().getLong(0) === 2L)
    // head()/last() over split lists
    val hl = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "head(split(p.name, 'r')) AS h, last(split(p.name, 'r')) AS l").head()
    assert(hl.getString(0) === "ma" && hl.getString(1) === "ko")
  }

  test("string-producing functions concatenate under +") {
    assert(run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "left(p.name, 3) + p.age AS x").head().getString(0) === "mar29")
  }

  test("list comprehension filters and transforms a collected list") {
    // marko knows vadas(27) and josh(32); collect is sorted → [27, 32]
    val r = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a.name AS who, collect(b.age) AS ages " +
      "RETURN who, [x IN ages WHERE x > 27 | x * 2] AS big, " +
      "size([x IN ages WHERE x > 27]) AS n").head()
    assert(r.getString(0) === "marko")
    assert(r.getSeq[Int](1).toList === List(64))
    assert(r.getLong(2) === 1L)
  }

  test("filter-only and transform-only comprehension forms") {
    val r = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH collect(b.age) AS ages " +
      "RETURN [x IN ages WHERE x < 30] AS kept, [x IN ages | x + 1] AS bumped")
      .head()
    assert(r.getSeq[Int](0).toList === List(27))
    assert(r.getSeq[Int](1).toList === List(28, 33))
  }

  test("reduce folds a collected list left-to-right") {
    val r = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a.name AS who, collect(b.age) AS ages " +
      "RETURN who, reduce(s = 0, x IN ages | s + x) AS total").head()
    assert(r.getString(0) === "marko" && r.getLong(1) === 59L)
    // string fold: init fixes the accumulator type, + concatenates
    val cat = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH collect(b.name) AS names " +
      "RETURN reduce(s = '', x IN names | s + x) AS cat").head().getString(0)
    assert(cat === "joshvadas") // sorted collect
  }

  test("quantified list predicates any/all/none/single") {
    // marko knows vadas(27) and josh(32); collect sorted → [27, 32]
    val r = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a.name AS who, collect(b.age) AS ages " +
      "RETURN who, any(x IN ages WHERE x > 30) AS a1, " +
      "all(x IN ages WHERE x > 30) AS a2, " +
      "none(x IN ages WHERE x > 40) AS a3, " +
      "single(x IN ages WHERE x > 30) AS a4").head()
    assert(r.getString(0) === "marko")
    assert((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
      r.getBoolean(4)) === ((true, false, true, true)))
  }

  test("quantifier as a standalone WHERE conjunct and under NOT/AND") {
    val who = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a.name AS who, collect(b.age) AS ages " +
      "WHERE all(x IN ages WHERE x > 25) AND NOT none(x IN ages WHERE x > 30) " +
      "RETURN who").collect().map(_.getString(0)).toSet
    assert(who === Set("marko"))
    // inner predicate with AND + an outer-scope ref
    val n = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a, collect(b.age) AS ages " +
      "WHERE single(x IN ages WHERE x > 25 AND x < 30) " +
      "RETURN count(*) AS n").head().getLong(0)
    assert(n === 1L)
  }

  test("quantifier requires WHERE and rejects property access on the " +
      "lambda variable") {
    intercept[Exception](run(
      "MATCH (p:person) RETURN any(x IN range(1, 3)) AS a"))
    intercept[Exception](run(
      "MATCH (p:person) RETURN any(x IN range(1, 3) WHERE x.p = 1) AS a"))
  }

  test("trig/toBoolean/tail/isEmpty/elementId scalar functions") {
    val r = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "round(sin(pi() / 2), 6) AS s, round(degrees(pi()), 4) AS d, " +
      "round(atan2(1.0, 1.0) * 4, 6) AS pi4, " +
      "toBoolean('TRUE') AS tb, toBoolean('nope') AS tn, " +
      "elementId(p) AS eid").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 180.0)
    assert(r.getDouble(2) === math.Pi.floor + 0.141593) // rounded pi
    assert(r.getBoolean(3) === true)
    assert(r.isNullAt(4))
    assert(r.getString(5) === "person:marko")
    // tail: list minus head; isEmpty on strings and lists
    val t = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "tail(split(p.name, 'a')) AS tl, size(tail(range(1, 3))) AS n, " +
      "isEmpty(tail(range(1, 1))) AS e1, isEmpty(p.name) AS e2").head()
    assert(t.getSeq[String](0).toList === List("rko"))
    assert(t.getLong(1) === 2L)
    assert(t.getBoolean(2) === true && t.getBoolean(3) === false)
  }

  test("IN over list-producing expressions (range/split/comprehension)") {
    // ages 27,29,32,35; range(25, 33, 2) = [25,27,29,31,33]
    val n = run("MATCH (p:person) WHERE p.age IN range(25, 33, 2) " +
      "RETURN count(*) AS n").head().getLong(0)
    assert(n === 2L) // 27, 29
    val who = run("MATCH (p:person) " +
      "WHERE 'mar' IN split(p.name, 'ko') RETURN p.name AS w")
      .collect().map(_.getString(0)).toSet
    assert(who === Set("marko"))
    // membership in a filtered comprehension over a collected alias
    val w2 = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a, collect(b.age) AS ages " +
      "WHERE 32 IN [x IN ages WHERE x > 30] RETURN a.name AS w")
      .collect().map(_.getString(0)).toSet
    assert(w2 === Set("marko"))
    // expression LHS: the general `<expr> IN <expr>` split
    val n3 = run("MATCH (p:person) " +
      "WHERE p.age + 1 IN range(28, 36, 2) RETURN count(*) AS n")
      .head().getLong(0)
    assert(n3 === 3L) // 27+1=28, 29+1=30, 35+1=36 (inclusive end)
  }

  test("node label alternation (n:a|b) filters to either label") {
    val rows = run("MATCH (x:person|software) RETURN x AS id, labels(x) AS l")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).head))
    assert(rows.length === 6)
    assert(rows.map(_._2).toSet === Set("person", "software"))
    // composes with a relationship and a WHERE over a shared prop
    val tg = run("MATCH (a:person)-[:knows|created]->(x:person|software) " +
      "WHERE a.name = 'marko' RETURN count(*) AS n").head().getLong(0)
    assert(tg === 3L)
    // inside a pattern predicate
    val who = run("MATCH (a:person) " +
      "WHERE (a)-[:created]->(:software|person) RETURN a.name AS w")
      .collect().map(_.getString(0)).toSet
    assert(who === Set("marko", "josh", "peter"))
  }

  test("label alternation -[:a|b]-> matches any listed edge label") {
    // marko -[:knows]-> vadas, josh; marko -[:created]-> lop
    val rows = run("MATCH (a:person)-[:knows|created]->(x) " +
      "WHERE a.name = 'marko' RETURN x AS tgt ORDER BY tgt ASC")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("person:josh", "person:vadas", "software:lop"))
    // var-length with alternation: 2 hops over either label
    val n2 = run("MATCH (a:person)-[:knows|created*2]->(x) " +
      "WHERE a.name = 'marko' RETURN count(*) AS n").head().getLong(0)
    assert(n2 === 2L) // marko->josh->{ripple, lop}
    // whitespace around the pipe normalizes; rel var + alternation compose
    val withVar = run("MATCH (a:person)-[r:knows | created]->(x) " +
      "WHERE a.name = 'marko' RETURN type(r) AS t, count(*) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(withVar === Map("knows" -> 2L, "created" -> 1L))
    // relationships(p) refuses a multi-label named path (cannot name it)
    intercept[Exception](run(
      "MATCH p = (a:person)-[:knows|created*1..2]->(x) " +
        "RETURN relationships(p) AS r"))
  }

  test("DISTINCT inside sum/avg aggregates (item and expression level)") {
    // marko creates lop(0.4); josh creates ripple(1.0) + lop(0.4);
    // peter creates lop(0.2) — weights on created edges... use ages:
    // knows targets of marko: vadas 27, josh 32; plus josh also knows
    // nothing. Duplicate values via BOTH-direction: simpler — person ages
    // 27,29,32,35 all distinct; force dupes via two patterns on b.age
    // pairs a.age > b.age: b.age 27 appears 3x, 29 2x, 32 1x — DISTINCT
    // collapses to {27, 29, 32}: sum 88, avg 29.33, count 3
    val r = run("MATCH (a:person) MATCH (b:person) WHERE a.age > b.age " +
      "RETURN sum(DISTINCT b.age) AS sd, " +
      "round(avg(DISTINCT b.age), 2) AS ad, " +
      "count(DISTINCT b.age) AS cd").head()
    assert(r.getLong(0) === 88L)
    assert(r.getDouble(1) === 29.33)
    assert(r.getLong(2) === 3L)
    // min/max accept and ignore DISTINCT
    assert(run("MATCH (p:person) RETURN min(DISTINCT p.age) AS m")
      .head().getInt(0) === 27)
  }

  test("statistics aggregates stDev/stDevP/percentileCont/percentileDisc") {
    // person ages: 27, 29, 32, 35 — mean 30.75, pop var 8.6875
    val r = run("MATCH (p:person) RETURN " +
      "round(stDev(p.age), 6) AS sd, round(stDevP(p.age), 6) AS sdp, " +
      "percentileCont(p.age, 0.5) AS med, " +
      "percentileDisc(p.age, 0.5) AS dmed, " +
      "percentileDisc(p.age, 1.0) AS dmax").head()
    assert(r.getDouble(0) === 3.5) // sqrt(36.75/3)
    assert(r.getDouble(1) === 3.031089) // sqrt(36.75/4)
    assert(r.getDouble(2) === 30.5) // (29+32)/2
    assert(r.getInt(3) === 29) // ceil(0.5*4)=2nd of [27,29,32,35]
    assert(r.getInt(4) === 35)
    // grouped + composed in an expression; p out of range is loud
    val g1 = run("MATCH (a:person)-[:knows]->(b:person) " +
      "RETURN a.name AS who, percentileDisc(b.age, 0.5) AS m").head()
    assert(g1.getString(0) === "marko" && g1.getInt(1) === 27)
    intercept[Exception](run(
      "MATCH (p:person) RETURN percentileCont(p.age, 1.5) AS x"))
  }

  test("range() is inclusive and empty when unreachable") {
    val r = run("MATCH (p:person) WHERE p.name = 'marko' RETURN " +
      "size(range(1, 10)) AS a, size(range(1, 10, 3)) AS b, " +
      "size(range(5, 1)) AS c, reduce(s = 0, x IN range(1, 4) | s + x) AS d")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 4L, 0L, 10L)))
  }

  test("nested comprehension over a range with outer-scope refs") {
    // per person: count of range(1, age) values divisible by 10
    val rows = run("MATCH (p:person) " +
      "RETURN p.name AS who, size([x IN range(1, p.age) WHERE x % 10 = 0]) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("marko", 2L), ("vadas", 2L), ("josh", 3L), ("peter", 3L)))
  }

  test("literal IN collected alias filters a WITH stage") {
    val rows = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a, collect(b.name) AS known WHERE 'josh' IN known " +
      "MATCH (a)-[:created]->(s:software) " +
      "RETURN s.name AS sw").collect().map(_.getString(0)).toSet
    assert(rows === Set("lop"))
  }

  test("ref IN collected alias joins per-row membership") {
    val n = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH a, collect(b.age) AS ages MATCH (a)-[:knows]->(c:person) " +
      "WHERE c.age IN ages RETURN count(*) AS n").head().getLong(0)
    assert(n === 2L)
  }

  test("list literal projects and quote-aware IN list brackets") {
    val r = run("MATCH (p:person) WHERE p.name IN ['a]b', 'marko'] " +
      "RETURN size([1, 2, 3]) AS n, head([p.age, 0]) AS h").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 29L)
  }

  test("IN list keeps integral literals as longs (ANSI fail-loud on " +
      "type mismatch, exact match on long columns)") {
    // integral literals stay Long (r14 ADVICE #2): a long-typed column
    // matches exactly; a STRING column vs integer members is a TYPE error
    // under ANSI (loud), never a silent implicit-cast match
    val n = run("MATCH (p:person) WHERE p.age IN [29, 35] " +
      "RETURN count(*) AS n").head().getLong(0)
    assert(n === 2L)
    intercept[Exception](run("MATCH (p:person) WHERE p.city IN [1, 2] " +
      "RETURN count(*) AS n").head())
  }

  test("WITH * carries all bindings and RETURN * works after WITH") {
    val rows = run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH * WHERE b.age > 27 RETURN a.name AS x, b.name AS y")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "josh")))
    // WITH *, expr AS alias composes; post-WITH RETURN * expands to the
    // stage's bindings in declaration order
    val df = run("MATCH (a:person)-[:created]->(s:software) " +
      "WITH *, a.age AS age WHERE age > 30 RETURN *")
    assert(df.columns.toSeq === Seq("a", "s", "age"))
    val r2 = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(r2 === Set(("person:josh", "software:lop", 32),
      ("person:josh", "software:ripple", 32),
      ("person:peter", "software:lop", 35)))
  }

  test("CALL subquery: all-aggregate form left-joins, count 0 on empty") {
    val rows = run("MATCH (p:person) " +
      "CALL { WITH p MATCH (p)-[:created]->(s:software) " +
      "RETURN count(*) AS n } " +
      "RETURN p.name AS who, n ORDER BY who ASC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("josh", 2L), ("marko", 1L), ("peter", 1L),
      ("vadas", 0L)))
  }

  test("CALL subquery: non-aggregate form inner-joins (empty drops rows)") {
    val rows = run("MATCH (p:person) " +
      "CALL { WITH p MATCH (p)-[:created]->(s:software) " +
      "RETURN s.name AS sw } " +
      "RETURN p.name AS who, sw")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "lop"), ("josh", "lop"),
      ("josh", "ripple"), ("peter", "lop")))
  }

  test("CALL rejections are loud") {
    // no importing WITH
    intercept[Exception](run("MATCH (p:person) " +
      "CALL { MATCH (q:person) RETURN count(*) AS n } RETURN n"))
    // write inside CALL
    intercept[Exception](run("MATCH (p:person) " +
      "CALL { WITH p CREATE (x:person {name: 'z'}) } RETURN p.name AS w"))
    // inner LIMIT (per-outer-row in openCypher — would silently diverge)
    intercept[Exception](run("MATCH (p:person) " +
      "CALL { WITH p MATCH (p)-[:created]->(s:software) " +
      "RETURN s.name AS sw LIMIT 1 } RETURN p.name AS w, sw"))
  }

  test("node MERGE ON CREATE SET / ON MATCH SET") {
    // first merge creates → ON CREATE SET applies
    val g1 = CypherLite.evalWrite(g, "MERGE (v:person {name: 'newguy'}) " +
      "ON CREATE SET v.age = 1, v.city = 'Oslo' ON MATCH SET v.age = 2")
    val r1 = run2(g1, "MATCH (p:person) WHERE p.name = 'newguy' " +
      "RETURN p.age AS a, p.city AS c").head()
    assert(r1.getInt(0) === 1 && r1.getString(1) === "Oslo")
    // second merge matches → ON MATCH SET applies
    val g2 = CypherLite.evalWrite(g1, "MERGE (v:person {name: 'newguy'}) " +
      "ON MATCH SET v.age = 2")
    assert(run2(g2, "MATCH (p:person) WHERE p.name = 'newguy' " +
      "RETURN p.age AS a").head().getInt(0) === 2)
    // a key-matched row with conflicting pattern props stays loud
    intercept[Exception](CypherLite.evalWrite(g2,
      "MERGE (v:person {name: 'marko', age: 99}) ON MATCH SET v.age = 1"))
  }

  test("SET += map merges the given keys only") {
    val g1 = CypherLite.evalWrite(g, "MATCH (p:person) WHERE p.age > 30 " +
      "SET p += {city: 'BigCity', age: 40}")
    val rows = run2(g1, "MATCH (p:person) RETURN p.name AS n, p.age AS a, " +
      "p.city AS c").collect().map(r =>
      (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows.contains(("josh", 40, "BigCity")))
    assert(rows.contains(("peter", 40, "BigCity")))
    // untouched rows keep every property
    assert(rows.exists(t => t._1 == "marko" && t._2 == 29))
  }

  test("FOREACH over a collected alias batch-updates the elements") {
    val g1 = CypherLite.evalWrite(g,
      "MATCH (a:person)-[:created]->(s:software) WITH collect(a) AS makers " +
        "FOREACH (x IN makers | SET x.city = 'DevTown', x.age = x.age + 100)")
    val rows = run2(g1, "MATCH (p:person) WHERE p.city = 'DevTown' " +
      "RETURN p.name AS n, p.age AS a").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows === Set(("marko", 129), ("josh", 132), ("peter", 135)))
    // rejections: non-element target, missing WITH pipeline
    intercept[Exception](CypherLite.evalWrite(g,
      "MATCH (a:person)-[:created]->(s:software) WITH collect(a) AS ms " +
        "FOREACH (x IN ms | SET a.city = 'X')"))
  }

  test("list expression rejections are loud") {
    // property access on a lambda variable
    intercept[Exception](run("MATCH (a:person)-[:knows]->(b:person) " +
      "WITH collect(b.name) AS xs RETURN [x IN xs WHERE x.foo = 1 | x] AS z"))
    // reduce without the | body
    intercept[Exception](run("MATCH (p:person) " +
      "RETURN reduce(s = 0, x IN [1, 2]) AS z"))
    // negative substring start
    intercept[Exception](run("MATCH (p:person) " +
      "RETURN substring(p.name, -1) AS z"))
    // IN with a non-alias RHS expression
    intercept[Exception](run("MATCH (p:person) " +
      "WHERE p.age IN size(p.name) RETURN p.name AS x"))
  }
}
