package graft.olap

import graft.core.{Direction, EdgeStep, Pin, PropertyGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named algorithm dispatch — the reference's OLAP job pool
  * (`job/algorithm/AlgorithmPool.java:42-73` registers every algorithm
  * under its job name; `Algorithm.java:24-31` is the call surface: name +
  * category + `call(params)` + `checkParameters`). Here an algorithm is a
  * function from (graph, string-keyed parameter map) to a DataFrame — the
  * scheduler/REST-facing surface; the typed methods in [[Algorithms]] /
  * [[Louvain]] / [[Centrality]] remain the programmatic API. Unknown
  * parameter keys are rejected up front (the reference's
  * `checkParameters` contract), known ones fall back to the reference's
  * defaults.
  *
  * Every entry plans against the session-pinned adjacency family (the
  * same views the direct queries use), so dispatching through the pool
  * adds no extra materialization.
  */
object AlgorithmPool {
  type Params = Map[String, Any]

  final case class PoolAlgorithm(name: String, category: String,
                                 knownParams: Set[String],
                                 run: (PropertyGraph, Params) => DataFrame) {
    def checkParameters(params: Params): Unit = {
      val unknown = params.keySet -- knownParams
      require(unknown.isEmpty,
        s"unknown parameters ${unknown.mkString(",")} for algorithm " +
          s"'$name' (known: ${knownParams.toSeq.sorted.mkString(",")})")
    }
    def call(g: PropertyGraph, params: Params = Map.empty): DataFrame = {
      checkParameters(params)
      run(g, params)
    }
  }

  private def pInt(p: Params, k: String, d: Int): Int =
    p.get(k).map { case n: Number => n.intValue(); case s: String => s.toInt }
      .getOrElse(d)
  private def pDouble(p: Params, k: String, d: Double): Double =
    p.get(k).map { case n: Number => n.doubleValue(); case s: String => s.toDouble }
      .getOrElse(d)
  private def pDir(p: Params, d: Direction.Value): Direction.Value =
    p.get("direction").map(v => Direction.withName(v.toString.toUpperCase))
      .getOrElse(d)

  /** Whole-graph undirected inputs: vertex ids + the canonical (src<dst)
    * distinct edge set, derived from the session-pinned BOTH adjacency. */
  private def verts(g: PropertyGraph): DataFrame = g.vertices.select(col("id"))
  private def canonEdges(g: PropertyGraph): DataFrame =
    Pin.pinDerived(Algorithms.canonical(
      EdgeStep(Direction.OUT).edgesFor(g).select(col("src"), col("dst"))))

  val algorithms: Map[String, PoolAlgorithm] = Seq(
    PoolAlgorithm("count_vertex", "stats", Set.empty,
      (g, _) => Algorithms.countVertex(g)),
    PoolAlgorithm("count_edge", "stats", Set.empty,
      (g, _) => Algorithms.countEdge(g)),

    PoolAlgorithm("degree_centrality", "centrality", Set("direction"),
      (g, p) => Algorithms.degreeCentrality(g, pDir(p, Direction.BOTH))),
    PoolAlgorithm("closeness_centrality", "centrality", Set("depth"),
      (g, p) => Algorithms.closenessCentrality(verts(g), canonEdges(g),
        maxDepth = pInt(p, "depth", 6))),
    PoolAlgorithm("eigenvector_centrality", "centrality", Set("times"),
      (g, p) => Algorithms.eigenvector(verts(g), canonEdges(g),
        iterations = pInt(p, "times", 5))),
    PoolAlgorithm("betweenness_centrality", "centrality", Set("depth"),
      (g, p) => Centrality.betweennessStress(verts(g), canonEdges(g),
        maxDepth = pInt(p, "depth", 6))
        .select(col("id"), col("betweenness"))),
    PoolAlgorithm("stress_centrality", "centrality", Set("depth"),
      (g, p) => Centrality.betweennessStress(verts(g), canonEdges(g),
        maxDepth = pInt(p, "depth", 6))
        .select(col("id"), col("stress"))),

    PoolAlgorithm("triangle_count", "community", Set.empty,
      (g, _) => Algorithms.triangleCount(canonEdges(g))),
    PoolAlgorithm("cluster_coefficient", "community", Set.empty,
      (g, _) => Algorithms.clusterCoefficient(canonEdges(g))),
    PoolAlgorithm("lpa", "community", Set("times"),
      (g, p) => Algorithms.lpa(verts(g), canonEdges(g),
        iterations = pInt(p, "times", 3))),
    PoolAlgorithm("louvain", "community", Set("times", "passes"),
      (g, p) => Louvain.louvain(verts(g), canonEdges(g),
        localRounds = pInt(p, "times", 4), passes = pInt(p, "passes", 2))),
    PoolAlgorithm("weak_connected_component", "community", Set.empty,
      (g, _) => Algorithms.wcc(verts(g), canonEdges(g))),
    PoolAlgorithm("kcore", "community", Set("k"),
      (g, p) => Algorithms.kcore(canonEdges(g), k = pInt(p, "k", 3))),

    PoolAlgorithm("page_rank", "rank", Set("alpha", "times"),
      (g, p) => Algorithms.pageRank(g, alpha = pDouble(p, "alpha", 0.85),
        iterations = pInt(p, "times", 10))),

    PoolAlgorithm("rings", "path", Set("source", "depth", "direction"),
      (g, p) => graft.traverse.PathTraversals.rings(g,
        p.getOrElse("source",
          sys.error("rings requires a 'source' parameter")).toString,
        pDir(p, Direction.OUT), Nil, maxDepth = pInt(p, "depth", 5))),

    PoolAlgorithm("fusiform_similarity", "similarity",
      Set("direction", "label", "min_neighbors", "alpha", "min_similars",
        "top"),
      (g, p) => graft.traverse.SimilarityTraversals.fusiformSimilarity(
        g, verts(g), pDir(p, Direction.OUT),
        label = p.getOrElse("label",
          sys.error("fusiform_similarity requires a 'label' parameter"))
          .toString,
        minNeighbors = pInt(p, "min_neighbors", 2),
        alpha = pDouble(p, "alpha", 0.5),
        minSimilars = pInt(p, "min_similars", 1),
        top = pInt(p, "top", 10)))
  ).map(a => a.name -> a).toMap

  def get(name: String): PoolAlgorithm =
    algorithms.getOrElse(name, sys.error(s"not exists algorithm: $name"))

  /** `AlgorithmPool.find(name).call(job, params)` in the reference; here a
    * one-call dispatch. */
  def call(name: String, g: PropertyGraph,
           params: Params = Map.empty): DataFrame =
    get(name).call(g, params)
}
