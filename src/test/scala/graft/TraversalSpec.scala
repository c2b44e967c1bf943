package graft

import graft.core._
import graft.traverse.{PathTraversals, Traversals}
import org.apache.spark.sql.functions._

/** Golden tests of the traverser semantics on the modern-graph fixture —
  * mirrors the reference's api/traversers ApiTest expectations. */
class TraversalSpec extends SparkSpec {
  lazy val g = ModernGraph.build(spark)

  test("kneighbor depth 1 OUT from marko") {
    assert(ids(Traversals.kneighbor(g, "person:marko", Direction.OUT, Nil, 1)) ===
      Set("person:vadas", "person:josh", "software:lop"))
  }

  test("kneighbor depth 2 OUT from marko includes ripple, excludes source") {
    assert(ids(Traversals.kneighbor(g, "person:marko", Direction.OUT, Nil, 2)) ===
      Set("person:vadas", "person:josh", "software:lop", "software:ripple"))
  }

  test("kneighbor respects edge label filter") {
    assert(ids(Traversals.kneighbor(g, "person:marko", Direction.OUT, Seq("knows"), 2)) ===
      Set("person:vadas", "person:josh"))
  }

  test("kout nearest depth 2 excludes depth-1 vertices") {
    assert(ids(Traversals.koutNearest(g, "person:marko", Direction.OUT, Nil, 2)) ===
      Set("software:ripple")) // lop is already at depth 1 via created
  }

  test("kout all depth 2 keeps re-reachable vertices") {
    assert(ids(Traversals.koutAll(g, "person:marko", Direction.OUT, Nil, 2)) ===
      Set("software:lop", "software:ripple")) // lop via marko->josh->lop
  }

  test("kout DFS variants are set-equal to the BFS fixpoint") {
    assert(ids(Traversals.koutDfs(g, "person:marko", Direction.OUT, Nil, 2, nearest = false)) ===
      ids(Traversals.koutAll(g, "person:marko", Direction.OUT, Nil, 2)))
    assert(ids(Traversals.koutDfs(g, "person:marko", Direction.OUT, Nil, 2, nearest = true)) ===
      ids(Traversals.koutNearest(g, "person:marko", Direction.OUT, Nil, 2)))
  }

  test("kout degree knob truncates fan-out deterministically") {
    // marko's OUT neighbors ordered by (label, dst): created->lop,
    // knows->josh, knows->vadas; degree=1 keeps only created->lop
    assert(ids(Traversals.koutNearest(g, "person:marko", Direction.OUT, Nil, 1, degree = 1L)) ===
      Set("software:lop"))
  }

  test("kout capacity guard throws when exceeded") {
    intercept[Traversals.CapacityExceededException] {
      Traversals.koutNearest(g, "person:marko", Direction.OUT, Nil, 2, capacity = 2L).count()
    }
    intercept[Traversals.CapacityExceededException] {
      Traversals.koutAll(g, "person:marko", Direction.OUT, Nil, 2, capacity = 2L).count()
    }
  }

  test("kneighbor BOTH reaches everything within 2") {
    assert(ids(Traversals.kneighbor(g, "person:vadas", Direction.BOTH, Nil, 2)) ===
      Set("person:marko", "person:josh", "software:lop"))
  }

  test("sameNeighbors of marko and josh OUT") {
    assert(ids(Traversals.sameNeighbors(g, "person:marko", "person:josh", Direction.OUT)) ===
      Set("software:lop"))
  }

  test("sameNeighborsBatch over N vertices = iterated intersection") {
    // neighbors via BOTH: lop's are {marko, josh, peter}; common BOTH-
    // neighbors of (marko, josh, peter) = {lop}
    assert(ids(Traversals.sameNeighborsBatch(g,
      Seq("person:marko", "person:josh", "person:peter"), Direction.OUT)) ===
      Set("software:lop"))
    intercept[IllegalArgumentException](
      Traversals.sameNeighborsBatch(g, Seq("person:marko"), Direction.OUT))
  }

  test("shortestPathTrace reconstructs the reversed-lex-min shortest path") {
    val trace = Traversals.shortestPathTrace(g, "person:marko", "software:ripple",
      Direction.OUT, Nil, maxDepth = 3).head().getString(0)
    assert(trace === "person:marko->person:josh->software:ripple")
    // equals the min-reversed choice among ALL shortest paths
    val all = PathTraversals.allShortestPaths(g, "person:marko", "software:ripple",
      Direction.OUT, Nil, maxDepth = 3)
      .collect().map(_.getString(0))
    assert(all.contains(trace))
    // unreachable → empty
    assert(Traversals.shortestPathTrace(g, "software:lop", "person:marko",
      Direction.OUT, Nil, maxDepth = 3).count() === 0L)
  }

  test("jaccard similarity marko/josh OUT = 1/4") {
    val sim = Traversals.jaccardSimilarity(g, "person:marko", "person:josh", Direction.OUT)
      .head().getDouble(0)
    assert(math.abs(sim - 0.25) < 1e-9) // ∩={lop}, ∪={vadas,josh,lop,ripple}
  }

  test("shortest path vadas→ripple BOTH = 3") {
    val d = Traversals.shortestPathDist(g, "person:vadas", "software:ripple",
      Direction.BOTH, Nil, 5)
    assert(d.head().getLong(0) === 3L) // vadas-marko-josh-ripple
  }

  test("shortest path unreachable within maxDepth → empty") {
    val d = Traversals.shortestPathDist(g, "person:vadas", "software:ripple",
      Direction.OUT, Nil, 5)
    assert(d.count() === 0L) // vadas has no OUT edges
  }

  test("shortest path source==target → 0") {
    val d = Traversals.shortestPathDist(g, "person:marko", "person:marko",
      Direction.BOTH, Nil, 3)
    assert(d.head().getLong(0) === 0L)
  }

  test("paths marko→lop within 3 hops") {
    val p = Traversals.paths(g, "person:marko", "software:lop", Direction.OUT, Nil, 3)
      .collect().map(_.getString(0)).toSet
    assert(p === Set(
      "person:marko->software:lop",
      "person:marko->person:josh->software:lop"))
  }

  test("countWalks marko out-out") {
    val n = Traversals.countWalks(g, "person:marko",
      Seq(EdgeStep(Direction.OUT), EdgeStep(Direction.OUT))).head().getLong(0)
    assert(n === 2L) // marko->josh->{lop,ripple}; vadas/lop have no OUT
  }

  test("edgeExistence finds the marko-knows-vadas edge") {
    val e = Traversals.edgeExistence(g, "person:marko", "person:vadas", Some("knows"))
    assert(e.count() === 1L)
    assert(e.head().getString(3) === "20160110") // sort_values = date sortKey
  }

  test("capacity guard aborts oversized traversals") {
    intercept[graft.traverse.Traversals.CapacityExceededException] {
      Traversals.kneighbor(g, "person:marko", Direction.BOTH, Nil,
        maxDepth = 3, capacity = 2L).count()
    }
    // generous capacity → normal result
    assert(Traversals.kneighbor(g, "person:marko", Direction.BOTH, Nil,
      maxDepth = 2, capacity = 100L).count() > 0)
  }

  test("customizedKneighbor: step-filtered reach, kneighbor parity, deterministic limit") {
    // plain BOTH step at depth 2 must equal the classic kneighbor
    val viaSteps = Traversals.customizedKneighbor(g, "person:marko",
      EdgeStep(Direction.BOTH), maxDepth = 2)
      .collect().map(_.getString(0)).toSet
    val classic = Traversals.kneighbor(g, "person:marko", Direction.BOTH, Nil,
      maxDepth = 2).collect().map(_.getString(0)).toSet
    assert(viaSteps === classic)
    // per-edge property filter prunes the walk: only the weight-1.0 knows
    // edge survives, so depth 2 reaches exactly josh
    val filtered = Traversals.customizedKneighbor(g, "person:marko",
      EdgeStep(Direction.OUT, Seq("knows"), Some(Cond.gt("weight", 0.6))),
      maxDepth = 2).collect().map(_.getString(0)).toSet
    assert(filtered === Set("person:josh"))
    // limit cuts to the lowest ids (deterministic twin of the reference's
    // insertion-order truncation)
    val limited = Traversals.customizedKneighbor(g, "person:marko",
      EdgeStep(Direction.BOTH), maxDepth = 2, limit = 2L)
      .collect().map(_.getString(0)).toSet
    assert(limited === classic.toSeq.sorted.take(2).toSet)
  }

  test("degree cap truncates deterministically") {
    val e = EdgeStep(Direction.OUT, Nil, degree = 1).edgesFor(g)
      .filter(col("src") === "person:marko")
    // marko has 3 OUT edges; cap 1 keeps the (label,dst)-smallest: created→lop
    assert(e.count() === 1L)
    assert(e.head().getAs[String]("dst") === "software:lop")
  }

  test("skipDegree drops supernodes entirely") {
    val e = EdgeStep(Direction.OUT, Nil, skipDegree = 2).edgesFor(g)
    // marko (3 out-edges) skipped; josh (2) and peter (1) kept
    assert(e.select("src").distinct().collect().map(_.getString(0)).toSet ===
      Set("person:josh", "person:peter"))
  }
}
