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
}
