package graft

import graft.core._
import graft.olap.Algorithms
import graft.traverse.Traversals
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized invariant tests over generated graphs — the
  * property-test upgrade over the reference's example-based suites
  * (SURVEY §5 implication d). */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  /** deterministic random graph: n vertices, expected degree ~d */
  private def randomGraph(seed: Long, n: Int, d: Double): PropertyGraph = {
    val rnd = new Random(seed)
    val verts = (0 until n).map(i => (s"v$i", "node")).toDF("id", "label")
    val p = d / n
    val es = for {
      i <- 0 until n; j <- 0 until n
      if i != j && rnd.nextDouble() < p
    } yield (s"v$i", s"v$j")
    val edges = es.toDF("src", "dst")
      .withColumn("label", lit("e"))
      .withColumn("sort_values", lit(null).cast("string"))
    PropertyGraph(verts, edges, GraphSchema(Nil,
      Seq(VertexLabelDef("node", Nil)), Seq(EdgeLabelDef("e", "node", "node"))))
  }

  test("kneighbor is monotone in depth; kout(nearest) is the layer difference") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val g = randomGraph(seed, 14, 3.0)
      val k1 = ids(Traversals.kneighbor(g, "v0", Direction.OUT, Nil, 1))
      val k2 = ids(Traversals.kneighbor(g, "v0", Direction.OUT, Nil, 2))
      val k3 = ids(Traversals.kneighbor(g, "v0", Direction.OUT, Nil, 3))
      assert(k1.subsetOf(k2) && k2.subsetOf(k3), s"seed=$seed")
      val layer2 = ids(Traversals.koutNearest(g, "v0", Direction.OUT, Nil, 2))
      assert(layer2 === (k2 -- k1) -- Set("v0"), s"seed=$seed")
    }
  }

  test("jaccard similarity is symmetric and within [0,1]") {
    for (seed <- Seq(5L, 6L)) {
      val g = randomGraph(seed, 12, 3.0)
      val ab = Traversals.jaccardSimilarity(g, "v1", "v2", Direction.OUT).head().getDouble(0)
      val ba = Traversals.jaccardSimilarity(g, "v2", "v1", Direction.OUT).head().getDouble(0)
      assert(ab === ba && ab >= 0.0 && ab <= 1.0, s"seed=$seed")
    }
  }

  test("shortest BOTH distance is symmetric") {
    for (seed <- Seq(7L, 8L)) {
      val g = randomGraph(seed, 12, 3.0)
      def dist(a: String, b: String): Long = {
        val d = Traversals.shortestPathDist(g, a, b, Direction.BOTH, Nil, 6)
        if (d.isEmpty) -1L else d.head().getLong(0)
      }
      assert(dist("v0", "v5") === dist("v5", "v0"), s"seed=$seed")
    }
  }

  test("wcc produces a valid partition: every edge stays inside one component") {
    for (seed <- Seq(9L, 10L)) {
      val g = randomGraph(seed, 15, 2.0)
      val comp = Algorithms.wcc(g.vertices.select(col("id")),
        g.edges.select(col("src"), col("dst")))
      val crossEdges = g.edges
        .join(comp.withColumnRenamed("id", "src").withColumnRenamed("component", "cs"), Seq("src"))
        .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("component", "cd"), Seq("dst"))
        .filter(col("cs") =!= col("cd")).count()
      assert(crossEdges === 0L, s"seed=$seed")
      // representative is a member of its own component
      val badReps = comp.withColumnRenamed("id", "m")
        .join(comp.filter(col("id") === col("component")).select(col("component")),
          Seq("component"), "left_anti").count()
      assert(badReps === 0L, s"seed=$seed")
    }
  }

  test("pagerank: positive ranks, total mass ≤ 1 (dangling leaks), N·(1-α)/N floor") {
    for (seed <- Seq(11L)) {
      val g = randomGraph(seed, 15, 3.0)
      val pr = Algorithms.pageRank(g, 0.85, 5)
      val vals = pr.collect().map(_.getDouble(1))
      assert(vals.forall(_ > 0.0))
      assert(vals.sum <= 1.0 + 1e-6)
      assert(vals.forall(_ >= (1 - 0.85) / 15 - 1e-9))
    }
  }

  test("triangle credit sums to 3 per triangle") {
    for (seed <- Seq(12L, 13L)) {
      val g = randomGraph(seed, 12, 4.0)
      val canon = Algorithms.canonical(g.edges.select(col("src"), col("dst")))
      val perVertex = Algorithms.triangleCount(canon)
        .agg(sum(col("triangles"))).head()
      val total = if (perVertex.isNullAt(0)) 0L else perVertex.getLong(0)
      assert(total % 3 === 0L, s"seed=$seed")
    }
  }
}
