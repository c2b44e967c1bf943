package graft

import graft.core.{Direction, GraphXBridge, ModernGraph}
import graft.olap.Algorithms
import org.apache.spark.sql.functions._

class GraphXSpec extends SparkSpec {

  lazy val g = ModernGraph.build(spark)

  test("toGraphX round-trips vertices and edges") {
    val p = GraphXBridge.toGraphX(g)
    assert(p.graph.vertices.count() === 6L)
    assert(p.graph.edges.count() === 6L)
    assert(p.mapping.count() === 6L)
  }

  test("GraphX connected components agree with DataFrame WCC grouping") {
    val gx = GraphXBridge.connectedComponents(g)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val df = Algorithms.wcc(g.vertices.select(col("id")),
        g.edges.select(col("src"), col("dst")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // same partition into components (representatives may differ)
    def groups(m: Map[String, String]) = m.groupBy(_._2).values.map(_.keySet).toSet
    assert(groups(gx) === groups(df))
  }

  test("Pregel SSSP agrees with the converged Bellman-Ford dataflow") {
    val px = GraphXBridge.ssspPregel(g, "person:marko", Direction.OUT, Nil, "weight")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bf = graft.traverse.PathTraversals.weightedSsspConverged(
        g, "person:marko", Direction.OUT, Nil, "weight")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(px === bf)
    assert(px("person:marko") === 0.0)
  }

  test("GraphX pagerank ranks lop above persons") {
    val pr = GraphXBridge.pageRank(g, tol = 0.0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("software:lop") > pr("person:marko"))
  }

  test("converged DF pagerank matches the fixed-iteration fixpoint and GraphX tol ordering") {
    val conv = graft.olap.Algorithms.pageRankConverged(g, 0.85, precision = 1e-10, maxTimes = 100)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fixed = graft.olap.Algorithms.pageRank(g, 0.85, iterations = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(conv.keySet === fixed.keySet)
    conv.foreach { case (id, r) => assert(math.abs(r - fixed(id)) < 1e-7, id) }
    // a loose precision must stop early: with precision >= the total initial
    // mass the very first delta check terminates the loop at round 1
    val one = graft.olap.Algorithms.pageRankConverged(g, 0.85, precision = 10.0, maxTimes = 100)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneIter = graft.olap.Algorithms.pageRank(g, 0.85, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    conv.foreach { case (id, _) => assert(math.abs(one(id) - oneIter(id)) < 1e-12, id) }
    // same stationary ordering as GraphX's tolerance-converged variant
    // (normalizations differ: GraphX ranks sum to ~N, ours to ~1)
    val gx = GraphXBridge.pageRank(g, tol = 1e-6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byConv = conv.toSeq.sortBy { case (id, r) => (-r, id) }.map(_._1)
    val byGx = gx.toSeq.sortBy { case (id, r) => (-r, id) }.map(_._1)
    assert(byConv === byGx)
  }
}
