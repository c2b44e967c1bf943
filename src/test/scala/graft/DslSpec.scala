package graft

import graft.api.Graft
import graft.core.{Cond, ModernGraph}
import org.apache.spark.sql.functions._

/** Gremlin-step DSL semantics on the modern graph — mirrors the TinkerPop
  * process-suite shapes the reference runs (SURVEY §2.9). */
class DslSpec extends SparkSpec {
  lazy val g = ModernGraph.build(spark)
  def t = Graft.g(g)

  test("g.V().hasLabel(person).has(age>29).values(name)") {
    val names = t.V().hasLabel("person").has(Cond.gt("age", 29))
      .values("name").collect().map(_.getString(0)).toSet
    assert(names === Set("josh", "peter"))
  }

  test("g.V(marko).out(knows).values(name)") {
    val names = t.V("person:marko").out("knows")
      .values("name").collect().map(_.getString(0)).toSet
    assert(names === Set("vadas", "josh"))
  }

  test("g.V(marko).out().out() reaches software only") {
    assert(ids(t.V("person:marko").out().out().dedup().id()) ===
      Set("software:lop", "software:ripple"))
  }

  test("in() reverses created") {
    val creators = t.V("software:lop").in("created").values("name")
      .collect().map(_.getString(0)).toSet
    assert(creators === Set("marko", "josh", "peter"))
  }

  test("groupCount by label") {
    val m = t.V().both().toDF.groupBy(col("label")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("person") > 0 && m("software") > 0)
  }

  test("count/sum/mean aggregation steps") {
    assert(t.V().hasLabel("person").count().head().getLong(0) === 4L)
    assert(t.V().hasLabel("software").sum("price").head().getLong(0) === 527L)
  }

  test("outE/inV edge traversal with properties") {
    val w = t.V("person:marko").outE("knows").toDF
      .agg(sum(col("weight"))).head().getDouble(0)
    assert(math.abs(w - 1.5) < 1e-9)
    assert(ids(t.V("person:marko").outE("knows").inV().id()) ===
      Set("person:vadas", "person:josh"))
  }

  test("repeat(2)(out) == out().out()") {
    assert(ids(t.V("person:marko").repeat(2)(_.out()).dedup().id()) ===
      ids(t.V("person:marko").out().out().dedup().id()))
  }

  test("path tracking + simplePath") {
    val paths = t.withPath("person:marko").out().out().simplePath()
      .path().collect().map(_.getString(0)).toSet
    assert(paths === Set(
      "person:marko->person:josh->software:lop",
      "person:marko->person:josh->software:ripple"))
  }

  test("order + limit + range") {
    val top = t.V().hasLabel("person").order("age", asc = false).limit(2)
      .values("name").collect().map(_.getString(0))
    assert(top.toSeq === Seq("peter", "josh"))
  }

  test("union of traversals") {
    val u = t.V("person:marko").out("knows")
      .union(t.V("person:marko").out("created"))
    assert(ids(u.dedup().id()) === Set("person:vadas", "person:josh", "software:lop"))
  }

  test("where/not sub-traversal filters") {
    // persons who created something
    val creators = t.V().hasLabel("person").where(_.out("created"))
      .values("name").collect().map(_.getString(0)).toSet
    assert(creators === Set("marko", "josh", "peter"))
    // persons who created nothing
    val non = t.V().hasLabel("person").not(_.out("created"))
      .values("name").collect().map(_.getString(0)).toSet
    assert(non === Set("vadas"))
    // nested: persons who know someone who created ripple
    val knowsRippleDev = t.V().hasLabel("person")
      .where(_.out("knows").has("name", "josh"))
      .values("name").collect().map(_.getString(0)).toSet
    assert(knowsRippleDev === Set("marko"))
  }

  test("optional keeps elements without a match") {
    val r = ids(t.V().hasLabel("person").optional(_.out("created")).id())
    // creators resolve to their software; vadas (no created) stays himself
    assert(r === Set("software:lop", "software:ripple", "person:vadas"))
  }

  test("E() with label filter") {
    assert(t.E("knows").toDF.count() === 2L)
  }

  test("choose branches per element") {
    // persons over 30 resolve to their creations; others to who they know
    val r = ids(t.V().hasLabel("person")
      .choose(Cond.gt("age", 30))(_.out("created"))(_.out("knows"))
      .dedup().id())
    assert(r === Set("software:lop", "software:ripple", "person:vadas", "person:josh"))
  }

  test("coalesce takes the first non-empty branch per element") {
    // created if any, else knows: vadas has neither → disappears;
    // marko has created → lop (knows branch NOT taken)
    val r = ids(t.V().hasLabel("person")
      .coalesceT(_.out("created"))(_.out("knows"))
      .dedup().id())
    assert(r === Set("software:lop", "software:ripple"))
    // restrict to marko: only the created branch fires
    val m = ids(t.V("person:marko").coalesceT(_.out("created"))(_.out("knows")).id())
    assert(m === Set("software:lop"))
  }

  test("inject/is/constant/tail steps") {
    assert(ids(t.V("person:marko").inject("software:lop").id()) ===
      Set("person:marko", "software:lop"))
    assert(t.V().is("person:vadas").toDF.count() === 1L)
    assert(t.V().hasLabel("person").constant("x").distinct().count() === 1L)
    assert(ids(t.V().hasLabel("person").tail(2).id()) ===
      Set("person:peter", "person:vadas"))
  }

  test("subgraph step: edge-induced view") {
    import org.apache.spark.sql.functions.col
    val sub = g.subgraph(col("label") === "knows")
    assert(sub.edges.count() === 2L)
    assert(ids(sub.vertices) === Set("person:marko", "person:vadas", "person:josh"))
    // traversals on the induced view stay inside it
    assert(ids(graft.api.Graft.g(sub).V("person:marko").out().id()) ===
      Set("person:vadas", "person:josh"))
  }

  test("OLAP property read-mode join") {
    import org.apache.spark.sql.functions.{col, lit}
    val spark2 = spark; import spark2.implicits._
    val olap = Seq(("person:marko", 0.42)).toDF("id", "pagerank")
    val enriched = g.withOlapProps(olap)
    val r = enriched.vertices.filter(col("id") === "person:marko").head()
    assert(r.getAs[Double]("pagerank") === 0.42)
    assert(enriched.vertices.filter(col("pagerank").isNull).count() === 5L)
  }

  test("valueMap projects requested keys") {
    val row = t.V("person:marko").valueMap("name", "age").head()
    assert(row.getString(1) === "marko" && row.getInt(2) === 29)
  }

  test("match(): co-creators via shared variable join") {
    import graft.api.MatchPattern.as
    // g.V().match(as("a").out("created").as("b"),
    //             as("b").in("created").as("c")).where(a != c).select(a, c)
    val pairs = t.V().matchStep(
        as("a").hasLabel("person").out("created").as("b"),
        as("b").in("created").as("c"))
      .where(col("a") =!= col("c"))
      .select("a", "c").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(
      ("person:marko", "person:josh"), ("person:marko", "person:peter"),
      ("person:josh", "person:marko"), ("person:josh", "person:peter"),
      ("person:peter", "person:marko"), ("person:peter", "person:josh")))
  }

  test("match(): incoming traverser binds the first pattern's start variable") {
    import graft.api.MatchPattern.as
    // only marko survives the frontier filter, so a is pinned to marko
    val rows = t.V().hasLabel("person").has(Cond.eq("age", 29)).matchStep(
        as("a").out("knows").as("b"),
        as("a").out("created").as("c"))
      .withProp("b", "name", "who").withProp("c", "name", "what")
      .select("who", "what").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("vadas", "lop"), ("josh", "lop")))
  }

  test("match() result equals the CypherLite multi-MATCH plan") {
    import graft.api.MatchPattern.as
    val viaMatch = t.V().matchStep(
        as("a").hasLabel("person").out("created").as("s"),
        as("a").out("knows").as("f"))
      .withProp("a", "name", "who").withProp("s", "name", "sw")
      .select("who", "sw").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaCypher = graft.api.CypherLite.eval(g,
      "MATCH (a:person)-[:created]->(s) MATCH (a)-[:knows]->(f) " +
        "RETURN a.name AS who, s.name AS sw")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaMatch === viaCypher && viaMatch.nonEmpty)
  }

  test("match() rejects disconnected patterns") {
    import graft.api.MatchPattern.as
    val ex = intercept[IllegalArgumentException] {
      t.V().matchStep(
        as("a").out("knows").as("b"),
        as("x").out("created").as("y"))
    }
    assert(ex.getMessage.contains("shares no variable"))
  }

  test("match() rejects a non-vertex frontier (after outE)") {
    import graft.api.MatchPattern.as
    val ex = intercept[IllegalArgumentException] {
      t.V().outE("knows").matchStep(as("a").out("created").as("b"))
    }
    assert(ex.getMessage.contains("vertex step"))
  }
}
