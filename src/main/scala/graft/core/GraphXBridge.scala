package graft.core

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX projection of a PropertyGraph (SURVEY §1.5): string vertex ids are
  * mapped to dense longs once, then Pregel-style algorithms (GraphX's
  * partitioned edge arrays play the reference RamTable's role,
  * `.../backend/store/ram/RamTable.java:63-330`) run on the projected graph
  * and results join back through the id mapping.
  *
  * The DataFrame loops in graft.olap are the default path — they keep
  * everything in Catalyst/Tungsten. The GraphX path exists for genuinely
  * unbounded iteration (PageRank-to-convergence, Pregel programs) where
  * per-iteration DataFrame planning overhead dominates.
  */
object GraphXBridge {

  final case class Projected(
      graph: Graph[String, String],
      /** id ↔ long mapping as a DataFrame for joining results back */
      mapping: DataFrame)

  def toGraphX(g: PropertyGraph): Projected = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val idMap = g.vertices.select(col("id")).rdd
      .map(_.getString(0)).zipWithUniqueId().toDF("id", "vid")
      .localCheckpoint(true)
    val vertices: RDD[(VertexId, String)] =
      idMap.rdd.map(r => (r.getLong(1), r.getString(0)))
    val edges: RDD[Edge[String]] = g.edges.select(col("src"), col("dst"), col("label"))
      .join(idMap.withColumnRenamed("id", "src").withColumnRenamed("vid", "svid"), Seq("src"))
      .join(idMap.withColumnRenamed("id", "dst").withColumnRenamed("vid", "dvid"), Seq("dst"))
      .select(col("svid"), col("dvid"), col("label"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    Projected(
      Graph(vertices, edges, defaultVertexAttr = null.asInstanceOf[String],
        edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
        vertexStorageLevel = StorageLevel.MEMORY_AND_DISK),
      idMap)
  }

  /** GraphX PageRank joined back to string ids — the unbounded-iteration
    * twin of Algorithms.pageRank. */
  def pageRank(g: PropertyGraph, tol: Double): DataFrame = {
    val p = toGraphX(g)
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val ranks = p.graph.pageRank(tol).vertices.toDF("vid", "rank")
    p.mapping.join(ranks, Seq("vid"))
      .select(col("id"), round(col("rank"), 9).as("rank"))
  }

  /** Pregel single-source shortest path over an edge weight property — the
    * unbounded-iteration twin of `PathTraversals.weightedSsspConverged`
    * (reference `SingleSourceShortestPathTraverser:49` Dijkstra semantics).
    * Each superstep relaxes improved distances only, so the message volume
    * decays to zero; GraphX's cached edge partitions make many rounds cheap
    * where one DataFrame plan per round would dominate. Missing/null weight
    * → 1.0; direction/labels select the relaxed edge set. */
  def ssspPregel(g: PropertyGraph, source: String, dir: Direction.Value,
                 labels: Seq[String], weightCol: String): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val idMap = g.vertices.select(col("id")).rdd
      .map(_.getString(0)).zipWithUniqueId().toDF("id", "vid")
      .localCheckpoint(true)
    val wEdges = EdgeStep(dir, labels).edgesFor(g)
      .select(col("src"), col("dst"),
        coalesce(col(weightCol).cast("double"), lit(1.0)).as("w"))
    val edges: RDD[Edge[Double]] = wEdges
      .join(idMap.withColumnRenamed("id", "src").withColumnRenamed("vid", "svid"), Seq("src"))
      .join(idMap.withColumnRenamed("id", "dst").withColumnRenamed("vid", "dvid"), Seq("dst"))
      .select(col("svid"), col("dvid"), col("w"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcVid = idMap.filter(col("id") === source).head().getLong(1)
    val vertices: RDD[(VertexId, Double)] =
      idMap.rdd.map(r => (r.getLong(1),
        if (r.getString(0) == source) 0.0 else Double.PositiveInfinity))
    val graph = Graph(vertices, edges, Double.PositiveInfinity,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val result = graph.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr + triplet.attr < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + triplet.attr))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    val dists = result.vertices.filter(_._2 < Double.PositiveInfinity)
      .toDF("vid", "dist")
    idMap.join(dists, Seq("vid"))
      .select(col("id"), round(col("dist"), 6).as("dist"))
  }

  /** GraphX connected components joined back to string ids. */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val p = toGraphX(g)
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val comps = p.graph.connectedComponents().vertices.toDF("vid", "cvid")
    comps.join(p.mapping, Seq("vid"))
      .join(p.mapping.withColumnRenamed("vid", "cvid").withColumnRenamed("id", "cid"), Seq("cvid"))
      .select(col("id"), col("cid").as("component_rep"))
  }
}
