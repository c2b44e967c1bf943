package graft

import graft.core.{Direction, ModernGraph}
import graft.olap.{AlgorithmPool, Algorithms}
import org.apache.spark.sql.functions._

/** Unit tests of OLAP algorithms on hand-computable fixtures
  * (FIXTURES.md §3 synthetic shapes). */
class AlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  lazy val g = ModernGraph.build(spark)

  // triangle fixture: a-b-c triangle plus pendant d
  lazy val triEdges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    .toDF("src", "dst")
  lazy val triVerts = Seq("a", "b", "c", "d").toDF("id")

  test("degree centrality on modern graph") {
    val m = Algorithms.degreeCentrality(g, Direction.BOTH)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("person:marko") === 3L)
    assert(m("software:lop") === 3L)
    assert(m("person:vadas") === 1L)
  }

  test("pagerank sums to ~1 minus dangling leakage and ranks sinks highest") {
    val pr = Algorithms.pageRank(g, 0.85, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // lop (3 in-edges) must outrank every person
    assert(pr("software:lop") > pr.filterKeys(_.startsWith("person:")).values.max)
    assert(pr.values.forall(_ > 0))
  }

  test("wcc: two components") {
    val verts = Seq("a", "b", "c", "x", "y", "z").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val m = Algorithms.wcc(verts, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a") === "a" && m("b") === "a" && m("c") === "a")
    assert(m("x") === "x" && m("y") === "x")
    assert(m("z") === "z") // isolated vertex is its own component
  }

  test("wcc pointer jumping: chain of 65 converges in O(log n) rounds") {
    // min-label alone needs ~64 rounds to push v000 down a 65-chain;
    // pointer jumping must land in ~log2(64)+slack
    val n = 65
    val idsSeq = (0 until n).map(i => f"v$i%03d")
    val verts = idsSeq.toDF("id")
    val edges = idsSeq.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("src", "dst")
    val (comp, rounds) = Algorithms.wccWithRounds(verts, edges)
    val m = comp.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.values.toSet === Set("v000"))
    assert(rounds <= 10, s"expected O(log n) rounds, got $rounds")
  }

  test("wcc partition equals GraphX connectedComponents partition on modern graph") {
    val edges = g.edges.select(col("src"), col("dst"))
    val df = Algorithms.wcc(g.vertices.select(col("id")), edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gx = graft.core.GraphXBridge.connectedComponents(g)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // same grouping (labels may differ in representation)
    assert(df.groupBy(_._2).values.map(_.map(_._1).toSet).toSet ===
      gx.groupBy(_._2).values.map(_.map(_._1).toSet).toSet)
  }

  test("triangle count on triangle+pendant") {
    val m = Algorithms.triangleCount(Algorithms.canonical(triEdges))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("clustering coefficient: triangle corners 1.0 (deg 2), c lower, pendant 0") {
    val m = Algorithms.clusterCoefficient(Algorithms.canonical(triEdges))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") === 1.0 && m("b") === 1.0)
    assert(math.abs(m("c") - 1.0 / 3.0) < 1e-8) // deg 3, one closed pair of 3
    assert(m("d") === 0.0)
  }

  test("kcore k=2 peels the pendant") {
    val surv = Algorithms.kcore(Algorithms.canonical(triEdges), 2)
      .collect().map(_.getString(0)).toSet
    assert(surv === Set("a", "b", "c"))
  }

  test("kTruss peels cascades: K5 survives k=5, hanging triangle dies, second round strands nothing") {
    // K5 on a..e (every edge in 3 triangles) + triangle (e,x,y) hanging off
    // (its edges in 1 triangle each) + pendant (y,z) (0 triangles)
    val k5 = Seq("a", "b", "c", "d", "e").combinations(2).map(p => (p(0), p(1))).toSeq
    val edges = (k5 ++ Seq(("e", "x"), ("e", "y"), ("x", "y"), ("y", "z")))
      .toDF("src", "dst")
    val surv = Algorithms.kTruss(Algorithms.canonical(edges), k = 5, rounds = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(surv.keySet === k5.toSet)       // exactly the K5 edges survive
    assert(surv.values.forall(_ === 3L))   // each in C(3,1)=3 triangles
    // k=3 (support >= 1): only the pendant dies; hanging triangle survives
    val s3 = Algorithms.kTruss(Algorithms.canonical(edges), k = 3, rounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s3 === (k5 ++ Seq(("e", "x"), ("e", "y"), ("x", "y"))).toSet)
    graft.core.Pin.clear()
  }

  test("kTruss peel rounds bypass the triangle memo (no unbounded entry growth)") {
    graft.core.Pin.clear()
    val k5 = Seq("a", "b", "c", "d", "e").combinations(2).map(p => (p(0), p(1))).toSeq
    val edges = (k5 ++ Seq(("e", "x"), ("e", "y"), ("x", "y"))).toDF("src", "dst")
    val before = Algorithms.triMemoSize
    Algorithms.kTruss(Algorithms.canonical(edges), k = 5, rounds = 3).count()
    val afterOne = Algorithms.triMemoSize
    // only round 1 (the session-pinned input, shared with triangle_count)
    // may memoize; rounds 2..3 pass fresh survivor frames and must not
    assert(afterOne - before <= 1, s"peel rounds leaked memo entries: $before -> $afterOne")
    Algorithms.kTruss(Algorithms.canonical(edges), k = 5, rounds = 3).count()
    assert(Algorithms.triMemoSize === afterOne) // re-invocation re-hits, never grows
    graft.core.Pin.clear()
  }

  test("landmarkDistances: triangle-inequality upper bound over the landmark legs; index memoized") {
    // path graph a-b-c-d-e; landmark c: d(a,c)=2, d(c,e)=2 → ub(a,e)=4 (true 4);
    // landmark b: ub(a,e)=1+3=4; min stays 4. ub(a,d) = min(2+1, 1+2) = 3 (true 3)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("src", "dst")
    val sym = graft.core.Pin.pin(
      edges.union(edges.select(col("dst"), col("src"))).toDF("src", "dst"))
    val pairs = Seq(("a", "e"), ("a", "d"), ("a", "b")).toDF("a", "b")
    val out = Algorithms.landmarkDistances(pairs, Seq("b", "c"), sym, maxDepth = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a", "e")) === 4L)
    assert(out(("a", "d")) === 3L)
    assert(out(("a", "b")) === 1L) // via landmark b itself: d(a,b) + d(b,b) = 1 + 0
    val idx1 = Algorithms.landmarkIndex(Seq("b", "c"), sym, 4)
    val idx2 = Algorithms.landmarkIndex(Seq("c", "b"), sym, 4) // order-insensitive key
    assert(idx1 eq idx2)
    graft.core.Pin.clear()
  }

  test("weightedLandmarkDistances: triangle-inequality bound on a weighted path; exact through an on-path landmark") {
    // weighted path a -1.5- b -2.0- c -0.5- d: true d(a,c)=3.5, d(a,d)=4.0,
    // d(b,d)=2.5. Landmark b lies on every a→x path, so the bound is EXACT
    // for pairs (a, x): d(a,b)+d(b,x). Landmark d gives (a,c): 4.0+0.5=4.5 —
    // the min over landmarks must pick the exact 3.5.
    val e = Seq(("a", "b", 1.5), ("b", "c", 2.0), ("c", "d", 0.5))
      .toDF("src", "dst", "w")
    val wadj = graft.core.Pin.pin(
      e.union(e.select(col("dst"), col("src"), col("w"))).toDF("src", "dst", "w"))
    val pairs = Seq(("a", "c"), ("a", "d"), ("b", "d")).toDF("a", "b")
    val out = Algorithms.weightedLandmarkDistances(pairs, Seq("b", "d"), wadj,
        rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("a", "c")) === 3.5) // via b: 1.5 + 2.0 (exact, beats via-d 4.5)
    assert(out(("a", "d")) === 4.0) // via d itself: d(a,d) + 0
    assert(out(("b", "d")) === 2.5)
    // upper-bound property vs the converged SSSP truth from every vertex
    val truth = Map(("a", "c") -> 3.5, ("a", "d") -> 4.0, ("b", "d") -> 2.5)
    truth.foreach { case (k, t) => assert(out(k) >= t - 1e-9, s"$k: ${out(k)} < $t") }
    val idx1 = Algorithms.weightedLandmarkIndex(Seq("b", "d"), wadj, 4)
    val idx2 = Algorithms.weightedLandmarkIndex(Seq("d", "b"), wadj, 4)
    assert(idx1 eq idx2) // memoized, order-insensitive key
    graft.core.Pin.clear()
  }

  test("closeness on line graph a-b-c") {
    val verts = Seq("a", "b", "c").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val m = Algorithms.closenessCentrality(verts, edges, 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("b") - 2.0) < 1e-9)       // 1/1 + 1/1
    assert(math.abs(m("a") - 1.5) < 1e-9)       // 1/1 + 1/2
  }

  test("eigenvector concentrates on the best-connected corner") {
    // triangle+pendant is non-bipartite, so undamped power iteration
    // converges (a star would oscillate between its two sides)
    val m = Algorithms.eigenvector(triVerts, Algorithms.canonical(triEdges), 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("c") > m("a") && m("c") > m("d"))
    assert(math.abs(m("a") - m("b")) < 1e-6)
  }

  test("lpa converges on two cliques joined weakly") {
    val verts = Seq("a1", "a2", "a3", "b1", "b2", "b3").toDF("id")
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3")).toDF("src", "dst")
    val m = Algorithms.lpa(verts, edges, 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set(m("a1"), m("a2"), m("a3")).size === 1)
    assert(Set(m("b1"), m("b2"), m("b3")).size === 1)
    assert(m("a1") !== m("b1"))
  }

  test("bitmask MS-BFS equals the row-tagged formulation on a pseudo-random graph") {
    // 80 vertices, ~240 deterministic LCG edges (directed), 70 roots so the
    // bitmask path spans two 63-bit batches; compare against the tagged
    // loop the queries used before the bitmask path existed
    var s = 12345L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffffffffffL; s }
    val n = 80
    val edges = (0 until 240).map { _ =>
      (f"v${nxt() % n}%02d", f"v${nxt() % n}%02d")
    }.distinct.filter(e => e._1 != e._2).toDF("src", "dst")
    val roots = (0 until 70).map(i => f"v$i%02d").toDF("id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val bitmask = canon(Algorithms.multiSourceBfsAdj(roots, edges, maxDepth = 4))
    val tagged = canon(Algorithms.multiSourceBfsTagged(roots, edges,
      maxDepth = 4, symmetric = false))
    assert(bitmask === tagged)
    // and on a symmetric view with the two-layer guard
    val sym = edges.union(edges.select(col("dst"), col("src"))).distinct()
    val bm2 = canon(Algorithms.multiSourceBfsAdj(roots.limit(20), sym, maxDepth = 3))
    val tg2 = canon(Algorithms.multiSourceBfsTagged(roots.limit(20), sym,
      maxDepth = 3, symmetric = true))
    assert(bm2 === tg2)
  }

  test("algorithm pool dispatches by job name with parameter maps") {
    // dispatch parity: the named entry returns the same relation as the
    // direct call it adapts
    val pooled = AlgorithmPool.call("degree_centrality", g,
      Map("direction" -> "OUT")).collect().toSet
    val direct = Algorithms.degreeCentrality(g, Direction.OUT).collect().toSet
    assert(pooled === direct)
    val cv = AlgorithmPool.call("count_vertex", g)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cv === Map("person" -> 4L, "software" -> 2L))
    // parameterized dispatch: pool wcc == direct wcc on the modern graph
    val wccPool = AlgorithmPool.call("weak_connected_component", g)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(wccPool.values.toSet.size === 1) // modern graph is connected
    // checkParameters rejects unknown keys (the reference contract)
    val err = intercept[IllegalArgumentException] {
      AlgorithmPool.call("page_rank", g, Map("bogus" -> 1))
    }
    assert(err.getMessage.contains("bogus"))
    // unknown algorithm name fails at lookup
    assertThrows[RuntimeException](AlgorithmPool.get("no_such_algorithm"))
  }
}
