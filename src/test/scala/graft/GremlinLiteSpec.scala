package graft

import graft.api.GremlinLite
import graft.core.ModernGraph

/** Gremlin-text frontend on the modern graph — mirrors the reference's
  * §3.1 script entry point for declarative chains. */
class GremlinLiteSpec extends SparkSpec {
  lazy val g = ModernGraph.build(spark)
  def run(s: String) = GremlinLite.eval(g, s)

  test("filter + traverse + values") {
    val names = run("g.V().hasLabel('person').has('age', gt(29)).values('name')")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("josh", "peter"))
  }

  test("start from id, out with label") {
    assert(ids(run("g.V('person:marko').out('knows').id()")) ===
      Set("person:vadas", "person:josh"))
  }

  test("repeat().times() + dedup + count") {
    assert(run("g.V('person:marko').repeat(out()).times(2).dedup().count()")
      .head().getLong(0) === 2L)
  }

  test("within predicate and groupCount") {
    val m = run("g.V().has('name', within('lop','ripple','marko')).groupCount('label')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("person" -> 1L, "software" -> 2L))
  }

  test("edge traversal: outE/inV") {
    assert(ids(run("g.V('person:marko').outE('knows').inV().id()")) ===
      Set("person:vadas", "person:josh"))
  }

  test("order().by(decr) + limit") {
    val top = run("g.V().hasLabel('person').order().by('age', 'decr').limit(1).values('name')")
      .head().getString(0)
    assert(top === "peter")
  }

  test("order() with multiple by() keys on a traversal") {
    val names = run("g.V().hasLabel('software')" +
      ".order().by('lang').by('name', 'decr').values('name')")
      .collect().map(_.getString(0)).toSeq
    assert(names === Seq("ripple", "lop")) // same lang, name DESC
  }

  test("aggregations: sum and mean") {
    assert(run("g.V().hasLabel('software').sum('price')").head().getLong(0) === 527L)
    assert(run("g.V().hasLabel('person').mean('age')").head().getDouble(0) === 30.75)
  }

  test("path tracking via withPath") {
    val p = run("g.withPath('person:marko').out('knows').out('created').simplePath().path()")
      .collect().map(_.getString(0)).toSet
    assert(p === Set(
      "person:marko->person:josh->software:lop",
      "person:marko->person:josh->software:ripple"))
  }

  test("textContains predicate through the frontend") {
    assert(ids(run("g.V().has('name', textContains('lop')).id()")) === Set("software:lop"))
  }

  test("repeat().until(): traversers exit at first predicate hit, rest loop") {
    // round 1 from marko: lop exits (software), vadas/josh loop;
    // round 2: josh → ripple + lop exit, vadas drains — multiplicity kept
    val names = run(
      "g.V('person:marko').repeat(out()).until(hasLabel('software')).values('name')")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names === Seq("lop", "lop", "ripple"))
  }

  test("repeat().until() that never fires drains the frontier and returns empty") {
    assert(run(
      "g.V('person:marko').repeat(out()).until(has('age', gt(100))).id()")
      .collect().isEmpty)
  }

  test("until() script equals the DSL repeatUntil") {
    import graft.core.Cond
    val viaScript = run(
      "g.V('person:marko').repeat(out()).until(hasLabel('software')).id()")
      .collect().map(_.getString(0)).sorted.toSeq
    val viaDsl = graft.api.Graft.g(g).V("person:marko")
      .repeatUntil(Cond.eq("label", "software"))(_.out()).id()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaScript === viaDsl)
  }

  test("emit-first repeat: layer 0 is emitted alongside the repeat layers") {
    val names = run(
      "g.V('person:marko').emit().repeat(out('knows')).times(2).values('name')")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names === Seq("josh", "marko", "vadas"))
  }

  test("multi-step repeat body: filters apply inside every round") {
    assert(ids(run(
      "g.V('person:marko').repeat(out('knows').has('age', gt(30))).times(1).id()")) ===
      Set("person:josh"))
  }

  test("bothE/otherV/bothV edge navigation") {
    // josh's incident edges: knows IN from marko, created OUT to lop+ripple
    assert(ids(run("g.V('person:josh').bothE().otherV().id()")) ===
      Set("person:marko", "software:lop", "software:ripple"))
    // bothV on an edge frame: both endpoints, two traversers per edge
    val labels = run("g.E('knows').bothV().groupCount('label')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels === Map("person" -> 4L)) // 2 edges x 2 person endpoints
    // hasId mid-chain
    assert(ids(run("g.V().hasLabel('person').hasId('person:marko').out('created').id()")) ===
      Set("software:lop"))
  }

  test("TextP and numeric P predicates") {
    assert(ids(run("g.V().has('name', startingWith('ma')).id()")) === Set("person:marko"))
    assert(ids(run("g.V().has('name', endingWith('pple')).id()")) === Set("software:ripple"))
    assert(ids(run("g.V().has('name', containing('o s'))" +
      ".id()")).isEmpty) // substring, not token match
    assert(ids(run("g.V().hasLabel('person').has('name', notContaining('a')).id()")) ===
      Set("person:josh", "person:peter"))
    // inside/outside/between: (27,32) exclusive → only 29
    assert(ids(run("g.V().has('age', inside(27, 32)).id()")) === Set("person:marko"))
    assert(ids(run("g.V().has('age', outside(28, 34)).id()")) ===
      Set("person:vadas", "person:peter"))
    assert(ids(run("g.V().has('age', between(27, 32)).id()")) ===
      Set("person:vadas", "person:marko")) // [27, 32)
    assert(ids(run("g.V().hasLabel('person').has('name', without('marko', 'josh')).id()")) ===
      Set("person:vadas", "person:peter"))
  }

  test("group()/groupCount() modulator by() forms") {
    // groupCount().by(key)
    val gc = run("g.V().hasLabel('person').groupCount().by('age')")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gc === Map(29 -> 1L, 27 -> 1L, 32 -> 1L, 35 -> 1L))
    // group().by(key).by(agg(prop)) and the values(prop).agg() longhand
    val s1 = run("g.V().hasLabel('person').group().by('label').by(sum('age'))")
      .head().getLong(1)
    assert(s1 === 123L)
    val s2 = run("g.V().hasLabel('person').group().by('label')" +
      ".by(values('age').sum())").head().getLong(1)
    assert(s2 === 123L)
    // count() value traversal
    val c = run("g.V().group().by('label').by(count())")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c === Map("person" -> 4L, "software" -> 2L))
    // no value by(): collect ids; values(prop).fold() longhand collects props
    val ids0 = run("g.V().hasLabel('software').group().by('lang')")
      .head().getSeq[String](1).toList
    assert(ids0 === List("software:lop", "software:ripple"))
    val names = run("g.V().hasLabel('software').group().by('lang')" +
      ".by(values('name').fold())").head().getSeq[String](1).toList
    assert(names === List("lop", "ripple"))
    // loud: group() without by
    intercept[Exception](run("g.V().group()"))
  }

  test("bare emit() not before repeat() fails loudly") {
    val e = intercept[IllegalArgumentException] {
      run("g.V('person:marko').emit().out().id()")
    }
    assert(e.getMessage.contains("emit()"))
  }

  test("malformed scripts fail cleanly") {
    intercept[Exception](run("g.V().nonsenseStep()"))
    intercept[Exception](run("notatraversal"))
  }

  test("match() through the text frontend equals the DSL matchStep") {
    val script = run(
      "g.V().match(as('a').hasLabel('person').out('knows').as('b'), " +
        "as('b').out('created').as('c')).select('a', 'b', 'c')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    import graft.api.MatchPattern.as
    val dsl = graft.api.Graft.g(g).V().matchStep(
        as("a").hasLabel("person").out("knows").as("b"),
        as("b").out("created").as("c"))
      .select("a", "b", "c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(script === dsl && script.nonEmpty)
  }

  test("match() pattern-level has() filters bindings; select().by() projects properties") {
    val rows = run(
      "g.V().match(as('a').out('created').as('s').has('name', 'lop'))" +
        ".select('a', 's').by('name').by('lang')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "java"), ("josh", "java"), ("peter", "java")))
    // order()/range() page the binding table
    val paged = run(
      "g.V().match(as('a').out('created').as('s').has('name', 'lop'))" +
        ".select('a').by('name').order().by('a').range(1, 3)")
      .collect().map(_.getString(0)).toList
    assert(paged === List("marko", "peter"))
  }

  test("match() through the frontend rejects disconnected and dangling patterns") {
    intercept[Exception](run(
      "g.V().match(as('a').out('knows').as('b'), as('x').out('created').as('y'))" +
        ".select('a')"))
    intercept[Exception](run("g.V().match(as('a').out('knows')).select('a')"))
  }

  test("script branch/filter sub-traversals equal their DSL twins") {
    import graft.api.Graft
    import graft.core.Cond
    // where(sub): persons who created something
    assert(ids(run("g.V().hasLabel('person').where(out('created')).id()")) ===
      ids(Graft.g(g).V().hasLabel("person").where(_.out("created")).id()))
    // not(sub): persons who created nothing
    assert(ids(run("g.V().hasLabel('person').not(out('created')).id()")) ===
      Set("person:vadas"))
    // optional(sub): creators step to software, vadas stays himself
    assert(ids(run("g.V().hasLabel('person').optional(out('created')).id()")) ===
      ids(Graft.g(g).V().hasLabel("person").optional(_.out("created")).id()))
    // choose(cond, t, f) with chained sub-traversals and identity()
    val script = ids(run("g.V().hasLabel('person')" +
      ".choose(has('age', gt(30)), out('created').hasLabel('software'), identity()).id()"))
    val dsl = ids(Graft.g(g).V().hasLabel("person")
      .choose(Cond.gt("age", 30))(_.out("created").hasLabel("software"))(t => t).id())
    assert(script === dsl && script.contains("software:lop"))
    // coalesce(sub, sub): created if any, else knows
    assert(ids(run("g.V().hasLabel('person').coalesce(out('created'), out('knows')).id()")) ===
      ids(Graft.g(g).V().hasLabel("person")
        .coalesceT(_.out("created"))(_.out("knows")).id()))
    // coin(p): deterministic md5 draw — reproducible and monotone in p
    val half = ids(run("g.V().coin(0.5).id()"))
    assert(half === ids(run("g.V().coin(0.5).id()"))) // same draw every run
    assert(half.subsetOf(ids(run("g.V().coin(0.99).id()"))))
    assert(ids(run("g.V().coin(1.0).id()")).size === 6)
    // unsupported sub-traversal steps fail loudly
    intercept[Exception](run("g.V().where(repeat(out()).times(2)).id()"))
  }

  test("traversal steps after a terminal fail loudly instead of being silently ignored") {
    // pre-guard, these mutated the dead pre-terminal traversal and the
    // caller got complete data believing it was sampled/filtered
    intercept[Exception](run("g.V().values('age').coin(0.5)"))
    intercept[Exception](run("g.V().id().where(out('created'))"))
    intercept[Exception](run("g.V().count().out('knows')"))
    // the result-frame modulators still compose
    assert(run("g.V().hasLabel('person').values('name').order().by('name').limit(2)")
      .collect().map(_.getString(0)).toSeq === Seq("josh", "marko"))
  }

  test("match() fails loudly instead of mis-routing recognized steps") {
    // count()/limit() after match() would otherwise run on the PRE-match
    // frontier and return plausible wrong data
    intercept[Exception](run("g.V().match(as('a').out('knows').as('b')).count()"))
    intercept[Exception](run(
      "g.V().match(as('a').out('knows').as('b')).limit(5).select('a')"))
    // a match() whose bindings are never projected is a silent no-op
    intercept[Exception](run("g.V().match(as('a').out('knows').as('b'))"))
    // has() between out() and the closing as() would bind to the WRONG var
    intercept[Exception](run(
      "g.V().match(as('a').out('knows').has('age', 27).as('b')).select('a')"))
    // select result then count(): the count would be the frontier's
    intercept[Exception](run(
      "g.V().match(as('a').out('knows').as('b')).select('a').count()"))
  }

  test("as()/select() step labeling: binding map projection with by()") {
    // multi-select of the binding map with per-variable property projection
    val rows = run("g.V().hasLabel('person').as('a').out('created').as('s')" +
      ".select('a', 's').by('name').by('name')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("marko", "lop"), ("josh", "lop"),
      ("josh", "ripple"), ("peter", "lop")))
    // no by(): raw ids
    val ids2 = run("g.V('person:josh').as('a').out('created').as('s').select('a', 's')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ids2 === Set(("person:josh", "software:lop"), ("person:josh", "software:ripple")))
    // script equals the DSL twin
    import graft.api.Graft
    import org.apache.spark.sql.functions.col
    val dsl = Graft.g(g).V().hasLabel("person").asStep("a").out("created").asStep("s")
      .selectBindings(Seq("a", "s"))
      .withProp("a", "name", "an").withProp("s", "name", "sn")
      .df.select(col("an").as("a"), col("sn").as("s"))
    val script = run("g.V().hasLabel('person').as('a').out('created').as('s')" +
      ".select('a', 's').by('name').by('name')")
    assert(dsl.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      script.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq)
  }

  test("select(one) mid-traversal is the back-step and the traversal continues") {
    // per-traverser multiplicity: marko binds a, steps to 2 created-sw? no —
    // out('created') from each person, back-step to 'a', then groupCount:
    // each person counted once per software they created
    val m = run("g.V().hasLabel('person').as('a').out('created')" +
      ".select('a').groupCount('name')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("marko" -> 1L, "josh" -> 2L, "peter" -> 1L))
    // back-step then continue traversing: creators' knows-neighbours
    val n = run("g.V().hasLabel('software').as('sw').in('created').as('p')" +
      ".select('p').out('knows').values('name')")
      .collect().map(_.getString(0)).toSet
    assert(n === Set("vadas", "josh")) // only marko knows anyone
    // bindings survive edge steps (outE/inV); an unbound label is loud
    intercept[Exception](run("g.V('person:marko').as('a').outE('knows').inV()" +
      ".select('a', 'b')")) // 'b' never bound
    val okE = run("g.V('person:marko').as('a').outE('knows').inV().as('b')" +
      ".select('a', 'b').by('name').by('name')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(okE === Set(("marko", "vadas"), ("marko", "josh")))
  }

  test("project() maps the current element onto named columns") {
    val rows = run("g.V().hasLabel('software').project('n', 'l').by('name').by('lang')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("lop", "java"), ("ripple", "java")))
    // by() with no args projects the id; no by() at all → keys are props
    val withId = run("g.V('software:lop').project('sid', 'n').by().by('name')")
      .head()
    assert(withId.getString(0) === "software:lop" && withId.getString(1) === "lop")
    val noBys = run("g.V('software:lop').project('name', 'lang')").head()
    assert(noBys.getString(0) === "lop" && noBys.getString(1) === "java")
    // project is a terminal: further traversal steps fail loudly
    intercept[Exception](run("g.V().project('n').by('name').out('knows')"))
    // arity mismatch fails loudly
    intercept[Exception](run("g.V().project('a', 'b').by('name')"))
  }

  test("repeat().emit().times() emits every intermediate layer") {
    // layers from marko: 1 = {vadas, josh, lop}, 2 = {lop, ripple} (via josh)
    val ids4 = run("g.V('person:marko').repeat(out()).emit().times(2).id()")
      .collect().map(_.getString(0)).toList.sorted
    assert(ids4 === List("person:josh", "person:vadas",
      "software:lop", "software:lop", "software:ripple"))
    // without emit: final layer only
    assert(run("g.V('person:marko').repeat(out()).times(2).id()")
      .collect().map(_.getString(0)).toSet === Set("software:lop", "software:ripple"))
  }

  test("union(sub, sub) branches from the same traversers") {
    val ids3 = run("g.V('person:marko').union(out('knows'), out('created')).id()")
      .collect().map(_.getString(0)).toSet
    assert(ids3 === Set("person:vadas", "person:josh", "software:lop"))
    // multiplicity: both branches contribute per-traverser rows
    assert(run("g.V().hasLabel('person').union(out('created'), out('created')).count()")
      .head().getLong(0) === 8L)
    intercept[Exception](run("g.V().union()")) // empty union
  }

  test("binding-compare where(): current-vs-binding and binding-vs-binding") {
    // co-creators excluding self
    val co = run("g.V().hasLabel('person').as('a').out('created').in('created')" +
      ".where(neq('a')).dedup().values('name')")
      .collect().map(_.getString(0)).toSet
    assert(co === Set("marko", "josh", "peter"))
    // eq: back to self only
    val self = run("g.V().hasLabel('person').as('a').out('created').in('created')" +
      ".where(eq('a')).dedup().values('name')")
      .collect().map(_.getString(0)).toSet
    assert(self === Set("marko", "josh", "peter")) // each creator loops back
    // binding vs binding
    assert(run("g.V().as('a').out('knows').as('b').where('a', neq('b')).count()")
      .head().getLong(0) === 2L)
    assert(run("g.V().as('a').out('knows').as('b').where('a', eq('b')).count()")
      .head().getLong(0) === 0L)
    intercept[Exception](run("g.V().where(neq('a')).id()")) // no binding
  }

  test("as()/select() misuse fails loudly") {
    intercept[Exception](run("g.V().select('a').values('name')")) // no binding
    intercept[Exception](run("g.V().as('a').out('knows').as('a').id()")) // rebind
    intercept[Exception](
      run("g.V().as('a').out('knows').select('a', 'b')")) // unbound b
    intercept[Exception]( // one by() per variable
      run("g.V().as('a').out('x').as('b').select('a', 'b').by('name')"))
  }

  test("sack(): carried weight accumulates along edge steps") {
    // one hop: each knows edge's weight lands in its traverser's sack
    val one = run("g.withSack(0).V('person:marko').outE('knows')" +
      ".sack(sum).by('weight').inV().sack()")
      .collect().map(_.getDouble(0)).toSet
    assert(one === Set(0.5, 1.0))
    // two hops: weights accumulate per WALK (marko→josh 1.0, then josh's
    // created edges 0.4 / 1.0 → sums 1.4, 2.0; the vadas walk dies —
    // vadas created nothing)
    val two = run("g.withSack(0).V('person:marko').outE('knows')" +
      ".sack(sum).by('weight').inV().outE('created')" +
      ".sack(sum).by('weight').inV().sack()")
      .collect().map(_.getDouble(0)).toSet
    assert(two === Set(1.4, 2.0))
    // script == DSL
    import graft.api.Graft
    val dsl = Graft.g(g).V("person:marko").withSack(0.0)
      .outE("knows").sackBy("sum", "weight").inV()
      .sack().collect().map(_.getDouble(0)).toSet
    assert(dsl === one)
    // loud errors: sack without withSack; sack(op) at a vertex position
    intercept[Exception](run("g.V('person:marko').outE('knows')" +
      ".sack(sum).by('weight').inV().sack()"))
    intercept[Exception](run("g.withSack(0).V('person:marko')" +
      ".sack(sum).by('age').id()"))
  }

  test("aggregate()/store() snapshots + cap() emit the sorted collection") {
    val xs = run("g.V().hasLabel('person').has('age', gt(29))" +
      ".aggregate('x').cap('x')")
      .head().getSeq[String](0).toList
    assert(xs === List("person:josh", "person:peter"))
    // store().by(prop) snapshots a property; the traversal CONTINUES
    // past the snapshot before cap() reads it
    val names = run("g.V().hasLabel('person').store('n').by('name')" +
      ".out('created').cap('n')")
      .head().getSeq[String](0).toList
    assert(names === List("josh", "marko", "peter", "vadas"))
    intercept[Exception](run("g.V().cap('nope')"))
  }

  test("tree() emits the traversal tree as its path-prefix set") {
    val br = run("g.withPath('person:marko').out('knows').out('created').tree()")
      .collect().map(_.getString(0)).toSet
    // surviving traversers: marko→josh→{lop, ripple} (the vadas branch
    // dies — vadas created nothing); the tree = every prefix
    assert(br === Set(
      "person:marko",
      "person:marko->person:josh",
      "person:marko->person:josh->software:lop",
      "person:marko->person:josh->software:ripple"))
    // tree() without path tracking is loud
    intercept[Exception](run("g.V('person:marko').out('knows').tree()"))
  }

  test("repeat().emit().until(): every surviving round emitted") {
    // round 1: marko.out() = {vadas, josh, lop} all EMITTED, lop exits;
    // round 2: out(vadas) = {}, out(josh) = {lop, ripple} emitted, both
    // exit -> drained. Multiset keeps the two lop sightings.
    val ids = run("g.V('person:marko').repeat(out()).emit()" +
      ".until(hasLabel('software')).id()")
      .collect().map(_.getString(0)).sorted.toList
    assert(ids === List("person:vadas", "person:josh", "software:lop",
      "software:lop", "software:ripple").sorted)
    // emit-first with until stays rejected (loud)
    intercept[Exception](run(
      "g.V('person:marko').emit().repeat(out()).until(hasLabel('software')).id()"))
  }

  test("branch(sel).option(v, sub).option(none, sub) routes per element") {
    import graft.api.Graft
    import org.apache.spark.sql.functions.col
    // age-29 people hop to their created software, everyone else stays
    val s = run("g.V().hasLabel('person').branch(values('age'))" +
      ".option(29, out('created')).option(none, identity()).id()")
      .collect().map(_.getString(0)).toSet
    assert(s === Set("software:lop", "person:vadas", "person:josh", "person:peter"))
    // DSL parity
    val d = Graft.g(g).V().hasLabel("person")
      .branch(col("age"), Seq(
        (Some(29L), (t: graft.api.GraphTraversal) => t.out("created")),
        (None, (t: graft.api.GraphTraversal) => t)))
      .id().collect().map(_.getString(0)).toSet
    assert(d === s)
    // label() selector
    val l = run("g.V().branch(label()).option('software', identity())" +
      ".option(none, out('created')).id()")
      .collect().map(_.getString(0)).toList.sorted
    assert(l === List("software:lop", "software:lop", "software:lop",
      "software:lop", "software:ripple", "software:ripple"))
  }

  test("local(): per-element limit window and per-element count") {
    import graft.api.Graft
    // per-person first created edge (deterministic content order), then inV
    val s = run("g.V().hasLabel('person').local(outE('created').limit(1)).inV().id()")
      .collect().map(_.getString(0)).toList.sorted
    // marko→lop, josh→{lop,ripple} take lop (content order), peter→lop
    assert(s === List("software:lop", "software:lop", "software:lop"))
    val d = Graft.g(g).V().hasLabel("person")
      .localLimit(1)(_.outE("created")).inV().id()
      .collect().map(_.getString(0)).toList.sorted
    assert(d === s)
    // a GLOBAL limit(1) would return one row total — local is per element
    assert(s.length === 3)
    // per-element count including zeros (vadas created nothing)
    val c = run("g.V().hasLabel('person').local(out('created').count())")
      .collect().map(_.getLong(0)).toList.sorted
    assert(c === List(0L, 1L, 1L, 2L))
    val dc = Graft.g(g).V().hasLabel("person").localCount(_.out("created"))
      .collect().map(_.getLong(0)).toList.sorted
    assert(dc === c)
  }

  test("math() over bindings and _ with by() modulators") {
    // two bindings, round-robin bys
    val m = run("g.V().hasLabel('person').as('a').out('knows').as('b')" +
      ".math('a + b').by('age')")
      .collect().map(_.getDouble(0)).toList.sorted
    assert(m === List(29.0 + 27.0, 29.0 + 32.0).sorted)
    // `_` = the current element; mixed with a binding and arithmetic
    val m2 = run("g.V('person:marko').as('a').out('knows')" +
      ".math('_ - a / 2').by('age')")
      .collect().map(_.getDouble(0)).toSet
    assert(m2 === Set(27.0 - 14.5, 32.0 - 14.5))
    // loud: no by(), unknown binding
    intercept[Exception](run("g.V().as('a').math('a + 1')"))
    intercept[Exception](run("g.V().math('zz + 1').by('age')"))
  }

  test("write steps: addV / addE / drop, script == DSL") {
    import graft.api.{Graft, GremlinLite => GL}
    // addV: chained batch, PRIMARY_KEY id splice — script and DSL agree
    val s1 = GL.evalWrite(g,
      "g.addV('person').property('name', 'newguy').property('age', 99)" +
        ".addV('person').property('name', 'other').property('age', 1)")
    val d1 = Graft.g(g).addV("person",
      Map("name" -> "newguy", "age" -> 99L), Map("name" -> "other", "age" -> 1L))
    assert(s1.vertices.count() === g.vertices.count() + 2)
    assert(GL.eval(s1, "g.V('person:newguy').values('age')")
      .head().getInt(0) === 99)
    assert(d1.vertices.orderBy("id").collect().toSeq ===
      s1.vertices.orderBy("id").collect().toSeq)
    // addV id collision is loud (never upserts)
    intercept[Exception](GL.evalWrite(g,
      "g.addV('person').property('name', 'marko')"))
    // addE single form, from()/to() with both id-literal and V('id') args;
    // created label is SINGLE frequency → duplicate is loud
    val s2 = GL.evalWrite(g,
      "g.addE('created').from(V('person:vadas')).to('software:ripple')" +
        ".property('weight', 0.9)")
    val d2 = Graft.g(g).addE("created", "person:vadas", "software:ripple",
      Map("weight" -> 0.9))
    assert(GL.eval(s2, "g.V('person:vadas').outE('created').values('weight')")
      .head().getDouble(0) === 0.9)
    assert(d2.edges.orderBy("src", "dst", "label").collect().toSeq ===
      s2.edges.orderBy("src", "dst", "label").collect().toSeq)
    intercept[Exception](GL.evalWrite(g,
      "g.addE('created').from('person:marko').to('software:lop')"))
    // endpoints must exist
    intercept[Exception](GL.evalWrite(g,
      "g.addE('created').from('person:ghost').to('software:lop')"))
    // batch fan-in: one edge per matched vertex to the fixed target
    val s3 = GL.evalWrite(g,
      "g.V().hasLabel('person').has('age', gt(30)).addE('knows')" +
        ".to('person:vadas').property('weight', 0.1)")
    assert(GL.eval(s3, "g.V('person:vadas').inE('knows').count()")
      .head().getLong(0) === 3L) // marko + josh + peter
    // the source graph is untouched (immutable batches)
    assert(GL.eval(g, "g.V('person:vadas').inE('knows').count()")
      .head().getLong(0) === 1L)
    // vertex drop: DETACH semantics, script == DSL
    val s4 = GL.evalWrite(g, "g.V().hasLabel('software').has('name', 'lop').drop()")
    val d4 = Graft.g(g).V().hasLabel("software").has("name", "lop").drop()
    assert(ids(GL.eval(s4, "g.V().hasLabel('software').id()")) ===
      Set("software:ripple"))
    assert(GL.eval(s4, "g.V('person:peter').out('created').count()")
      .head().getLong(0) === 0L)
    assert(d4.vertices.orderBy("id").collect().toSeq ===
      s4.vertices.orderBy("id").collect().toSeq)
    // edge drop via E(label) and via outE (stored orientation)
    val s5 = GL.evalWrite(g, "g.E('knows').drop()")
    assert(GL.eval(s5, "g.V('person:marko').out('knows').count()")
      .head().getLong(0) === 0L)
    assert(s5.vertices.count() === g.vertices.count()) // vertices untouched
    val s6 = GL.evalWrite(g, "g.V('person:marko').outE('created').drop()")
    assert(GL.eval(s6, "g.V().out('created').count()").head().getLong(0) === 3L)
    // inE/bothE before drop() is loud (reversed view)
    intercept[Exception](Graft.g(g).V("person:vadas").inE("knows").drop())
  }

  test("loops() exit counter: pure, or-combined (both orders), DSL twin") {
    import graft.api.Graft
    import graft.core.Cond
    // pure loops().is(2): everyone exits after round 2 — josh's layer-2
    // fan-out only (vadas/lop dead-end silently)
    assert(ids(run("g.V('person:marko').repeat(out()).until(loops().is(2)).id()"))
      === Set("software:lop", "software:ripple"))
    // DSL twin
    assert(Graft.g(g).V("person:marko").repeatUntilLoops(_ == 2)(_.out())
      .id().collect().map(_.getString(0)).toSet ===
      Set("software:lop", "software:ripple"))
    // or-combined: lop exits at round 1 via the property condition, the
    // people run to the loops() cap — 3 rows (lop twice: r1 exit + josh's
    // r2 copy)
    val comb = run("g.V('person:marko').repeat(out())" +
      ".until(hasLabel('software').or().loops().is(2)).id()")
    assert(comb.count() === 3L)
    assert(ids(comb) === Set("software:lop", "software:ripple"))
    // reversed operand order parses to the same plan
    assert(run("g.V('person:marko').repeat(out())" +
      ".until(loops().is(2).or().hasLabel('software')).id()").count() === 3L)
    // gt form: loops().is(gt(1)) exits after round 2
    assert(ids(run("g.V('person:marko').repeat(out())" +
      ".until(loops().is(gt(1))).id()")) ===
      Set("software:lop", "software:ripple"))
    // DSL twin with a combined condition
    assert(Graft.g(g).V("person:marko")
      .repeatUntilLoops(_ == 2, untilCond = Some(Cond.eq("label", "software")))(
        _.out()).id().count() === 3L)
  }

  test("elementMap(): id + label + properties") {
    val r = run("g.V('person:marko').elementMap('name', 'age')").head()
    assert(r.getString(0) === "person:marko" && r.getString(1) === "person" &&
      r.getString(2) === "marko" && r.getInt(3) === 29)
    // valueMap(true, k…) is the with-tokens spelling of the same projection
    val vm = run("g.V('person:marko').valueMap(true, 'name', 'age')").head()
    assert(vm.getString(0) === "person:marko" && vm.getString(1) === "person")
    // no-arg form projects every property column, riders excluded
    val cols = run("g.V().hasLabel('person').elementMap()").columns.toSeq
    assert(cols.take(2) === Seq("id", "label"))
    assert(cols.contains("name") && cols.contains("age"))
    assert(!cols.exists(c => c.startsWith("~") || c.startsWith("__")))
  }

  test("property() update: script == DSL, batch column update, loud unknowns") {
    import graft.api.Graft
    import graft.core.Cond
    val s1 = GremlinLite.evalWrite(g,
      "g.V().hasLabel('person').has('age', gt(30)).property('age', 99)" +
        ".property('city', 'zeta')")
    val d1 = Graft.g(g).V().hasLabel("person").has(Cond.gt("age", 30))
      .property("age" -> 99, "city" -> "zeta")
    assert(d1.vertices.orderBy("id").collect().toSeq ===
      s1.vertices.orderBy("id").collect().toSeq)
    // josh(32) + peter(35) updated, marko/vadas untouched
    val ages = GremlinLite.eval(s1, "g.V().hasLabel('person').valueMap('age')")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ages === Map("person:marko" -> 29, "person:vadas" -> 27,
      "person:josh" -> 99, "person:peter" -> 99))
    // source graph untouched (immutable batches)
    assert(run("g.V('person:josh').values('age')").head().getInt(0) === 32)
    // unknown property / identity columns are loud
    intercept[Exception](GremlinLite.evalWrite(g,
      "g.V().hasLabel('person').property('nope', 1)"))
    intercept[Exception](GremlinLite.evalWrite(g,
      "g.V().hasLabel('person').property('label', 'x')"))
    // property() updates must trail the chain
    intercept[Exception](GremlinLite.evalWrite(g,
      "g.V().property('age', 1).hasLabel('person')"))
  }

  test("path().by(prop): property rendering with id fallback, DSL twin") {
    import graft.api.Graft
    val p = run("g.withPath('person:marko').out('created').path().by('name')")
      .collect().map(_.getString(0)).toSet
    assert(p === Set("marko->lop"))
    // multiplicity preserved: one row per traverser, not per distinct path
    val p2 = run("g.withPath('person:josh').out('created').path().by('name')")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(p2 === Seq("josh->lop", "josh->ripple"))
    // absent property degrades to the id (software has no age)
    val p3 = run("g.withPath('person:marko').out('created').path().by('age')")
      .head().getString(0)
    assert(p3 === "29->software:lop")
    // DSL twin
    assert(Graft.g(g).withPath("person:marko").out("created").pathBy("name")
      .head().getString(0) === "marko->lop")
    intercept[Exception](run(
      "g.withPath('person:marko').out('created').path().by('nope')"))
  }

  test("inject/constant/is/unfold/properties script steps") {
    // inject adds literal vertex elements to the stream
    assert(ids(run("g.V('person:marko').inject('person:peter').id()")) ===
      Set("person:marko", "person:peter"))
    // constant maps every traverser to a constant
    assert(run("g.V().hasLabel('software').constant('x')")
      .collect().map(_.getString(0)).toSeq === Seq("x", "x"))
    // is(P) filters a produced value frame; count() tails it
    assert(run("g.V().hasLabel('person').values('age').is(gt(30)).count()")
      .head().getLong(0) === 2L)
    assert(run("g.V().hasLabel('person').values('age').is(29)")
      .head().getInt(0) === 29)
    // is('id') on the vertex stream is identity equality
    assert(ids(run("g.V().hasLabel('person').is('person:josh').id()")) ===
      Set("person:josh"))
    // fold().unfold() round-trips
    assert(run("g.V().hasLabel('software').fold().unfold()").count() === 2L)
    // properties(k…) emits the PRESENT (id, key, value) rows
    val pr = run("g.V('person:marko').properties('name', 'age')")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(pr === Set(("name", "marko"), ("age", "29")))
    // absent property rows are dropped, unknown keys loud
    assert(run("g.V().hasLabel('software').properties('age')").count() === 0L)
    intercept[Exception](run("g.V('person:marko').properties('nope')"))
  }

  test("repeat().until() cap hit warns with the dropped-frontier count") {
    import graft.api.Graft
    import graft.core.Cond
    // marko.out() → {vadas, josh, lop}; lop exits (software), the two
    // people would need another round — maxRounds = 1 drops them
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
    val out = try {
      Graft.g(g).V("person:marko")
        .repeatUntil(Cond.eq("label", "software"), maxRounds = 1)(_.out())
        .id().collect().map(_.getString(0)).toSet
    } finally System.setErr(prevErr)
    // results are the emitted exits only — unchanged by the warning
    assert(out === Set("software:lop"))
    val msg = errBuf.toString("UTF-8")
    assert(msg.contains("still looping") && msg.contains("2 traverser"),
      s"expected a dropped-frontier warning, got: $msg")
  }

  test("subgraph('k') collects traversed edges, cap emits the edge list") {
    val rows = run("g.E('knows').subgraph('sg').cap('sg')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rows === Set(
      ("person:marko", "knows", "person:vadas"),
      ("person:marko", "knows", "person:josh")))
    // the traversal continues past the side effect
    val rows2 = run("g.E('created').has('weight', gte(1)).subgraph('sg')" +
      ".cap('sg')").collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(rows2 === Set(("person:josh", "software:ripple")))
    // vertex-position subgraph is loud
    intercept[Exception](run("g.V().subgraph('sg').cap('sg')"))
  }

  test("profile() leaves results identical and captures per-step counts") {
    val plain = run("g.V().hasLabel('person').out('knows').values('name')")
      .collect().map(_.getString(0)).sorted.toSeq
    val prof =
      run("g.V().hasLabel('person').out('knows').values('name').profile()")
    assert(prof.collect().map(_.getString(0)).sorted.toSeq === plain)
    // metrics arrive via the (async) QueryExecutionListener — poll briefly
    val deadline = System.currentTimeMillis + 15000
    while (GremlinLite.lastProfile.size < 3 &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    import scala.jdk.CollectionConverters._
    val m = GremlinLite.lastProfile.asScala.toMap
    assert(m === Map("001_hasLabel" -> 4L, "002_out" -> 2L,
      "003_values" -> 2L))
    // profile() anywhere but last is loud
    intercept[Exception](run("g.V().profile().count()"))
  }

  test("post-terminal count() rejects multi-column results loudly") {
    intercept[Exception](
      run("g.V().hasLabel('person').groupCount('age').count()"))
    // single-column tail stays supported
    assert(run("g.V().hasLabel('person').values('age').count()")
      .head().getLong(0) === 4L)
  }
}
