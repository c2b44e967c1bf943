package graft

import graft.olap.{Algorithms, Centrality, Louvain}

/** Brandes betweenness/stress + Louvain on hand-computable fixtures. */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  test("betweenness/stress on a line a-b-c-d") {
    val verts = Seq("a", "b", "c", "d").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val m = Centrality.betweennessStress(verts, edges, 5)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // pairs through b: (a,c), (a,d) → 2; same for c; endpoints 0
    assert(m("b") === ((2.0, 2L)))
    assert(m("c") === ((2.0, 2L)))
    assert(m("a") === ((0.0, 0L)))
  }

  test("betweenness splits over equal shortest paths on a square") {
    // square a-b-d-c-a: pair (a,d) has two paths via b and via c
    val verts = Seq("a", "b", "c", "d").toDF("id")
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")).toDF("src", "dst")
    val m = Centrality.betweennessStress(verts, edges, 5)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m("b") === ((0.5, 1L))) // half of pair (a,d); 1 path through b
    assert(m("c") === ((0.5, 1L)))
  }

  test("louvain separates two cliques joined by a bridge") {
    val verts = Seq("a1", "a2", "a3", "b1", "b2", "b3").toDF("id")
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("a1", "b1")).toDF("src", "dst")
    val m = Louvain.louvain(verts, Algorithms.canonical(edges), 4, 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set(m("a1"), m("a2"), m("a3")).size === 1)
    assert(Set(m("b1"), m("b2"), m("b3")).size === 1)
    assert(m("a1") !== m("b1"))
  }

  test("louvain modularity trace is non-decreasing and ends positive") {
    val verts = Seq("a1", "a2", "a3", "b1", "b2", "b3").toDF("id")
    val edges = Algorithms.canonical(Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("a1", "b1")).toDF("src", "dst"))
    val (m, trace) = Louvain.louvainWithModularity(verts, edges, 4, 2)
    assert(trace.size === 2)
    assert(trace.sliding(2).forall(p => p.size < 2 || p(1) >= p(0) - 1e-12),
      s"modularity decreased across passes: $trace")
    assert(trace.last > 0.0) // two cliques + bridge: clearly positive Q
    // the singleton partition of pass 0's input scores 0 or less; sanity:
    val singleton = verts.select(org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("id").as("community"))
    assert(Louvain.modularity(singleton, edges) < trace.last)
    assert(m.collect().length === 6)
  }

  test("louvain is deterministic across runs") {
    val verts = Seq("a", "b", "c", "d").toDF("id")
    val edges = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val r1 = Louvain.louvain(verts, edges, 2, 1).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val r2 = Louvain.louvain(verts, edges, 2, 1).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(r1 === r2)
  }

  test("louvain in-memory tail is bit-equal to the distributed rounds") {
    // three uneven communities + cross links + a vertex id ordering that
    // exercises both parity directions; coarsened passes create self-loops
    val ids = Seq("a1", "a2", "a3", "a4", "b1", "b2", "b3", "c1", "c2", "z9")
    val verts = ids.toDF("id")
    val edges = Algorithms.canonical(Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"), ("a3", "a4"), ("a1", "a4"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("c1", "c2"),
      ("a4", "b1"), ("b3", "c1"), ("c2", "z9")).toDF("src", "dst"))
    val (mMem, tMem) = Louvain.louvainWithModularity(verts, edges, 4, 3)
    val (mDist, tDist) = Louvain.louvainWithModularity(verts, edges, 4, 3,
      inMemoryMaxVerts = 0)
    val a = mMem.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = mDist.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a === b)
    assert(tMem === tDist) // modularity traces bit-equal, not just close
  }
}
