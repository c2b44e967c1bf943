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

  test("assortativity is within [-1, 1] on random graphs") {
    for (seed <- Seq(21L, 22L, 23L)) {
      val g = randomGraph(seed, 20, 3.0)
      val e = g.edges.select(col("src"), col("dst"))
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val rows = Algorithms.degreeAssortativity(sym).collect()
      if (rows.nonEmpty && !rows(0).isNullAt(1)) {
        val r = rows(0).getDouble(1)
        assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"seed=$seed r=$r")
      }
    }
  }

  test("seeded lpa labels only spread from seeds and clamp them") {
    for (seed <- Seq(31L, 32L)) {
      val g = randomGraph(seed, 20, 2.5)
      val e = g.edges.select(col("src"), col("dst"))
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Seq(("v0", "A"), ("v1", "B")).toDF("id", "lbl")
      val out = Algorithms.seededLpa(g.vertices.select(col("id")), sym, seeds, 3)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // direct lookups: a dropped seed must FAIL, not default to expected
      assert(out.get("v0") === Some("A"), s"seed=$seed")  // clamped
      assert(out.get("v1") === Some("B"), s"seed=$seed")
      assert(out.values.toSet.subsetOf(Set("A", "B")), s"seed=$seed") // labels originate in seeds
      graft.core.Pin.clear()
    }
  }

  test("bpe never increases per-word symbol count; merges have decreasing-or-tied counts") {
    val docs = Seq((1L, "sparkling sparks sparked sparse parse parsec"),
      (2L, "parse parse sparks sparkling")).toDF("doc_id", "text")
    val (merges, words) = graft.ops.Bpe.train(docs, "doc_id", "text", 5)
    assert(merges.map(_.round) === (1 to merges.length))
    // each word's symbol count <= its char count
    words.collect().foreach { r =>
      assert(r.getSeq[String](2).length <= r.getString(0).length)
      assert(r.getSeq[String](2).mkString("") === r.getString(0)) // lossless
    }
    graft.core.Pin.clear()
  }
}
