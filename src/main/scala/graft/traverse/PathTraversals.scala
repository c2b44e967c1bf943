package graft.traverse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Path-producing traversers (SURVEY §2.12): allShortestPaths, rays, rings,
  * template/customized paths, collection paths, multi-node shortest path,
  * crosspoints, bounded weighted SSSP. All share the simple-path frontier
  * shape: a DataFrame of (id, path array) expanded one join per hop. */
object PathTraversals {

  private def pinned(df: DataFrame): DataFrame = graft.core.Pin.pin(df)

  private def pathCol = concat_ws("->", col("path"))

  private def seed(g: PropertyGraph, sources: Seq[String]): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    sources.map(s => (s, Seq(s))).toDF("id", "path")
  }

  /** All shortest (simple, vertex-distinct) paths source→target within
    * maxDepth (reference `ShortestPathTraverser.allShortestPaths:104`):
    * enumerate simple paths breadth-first, stop at the first depth where the
    * target appears, return every path of that depth. */
  def allShortestPaths(g: PropertyGraph, source: String, target: String,
                       dir: Direction.Value, labels: Seq[String] = Nil,
                       maxDepth: Int): DataFrame = {
    // distinct edge view, pinned once and shared across queries: with a
    // distinct seed, extended paths (path ++ [dst]) stay distinct by
    // construction, so NO per-hop distinct shuffle of the path frontier
    val edges = Traversals.adjacencyView(g, dir, labels)
    var frontier = seed(g, Seq(source))
    var result: Option[DataFrame] = None
    var d = 0
    val pruner = new Traversals.FrontierPruner
    while (result.isEmpty && d < maxDepth) {
      d += 1
      frontier = frontier.select(col("id").as("src"), col("path"))
        .join(pruner.prune(edges, frontier), Seq("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"))
        .localCheckpoint(true)
      val hits = frontier.filter(col("id") === target)
      if (hits.limit(1).count() > 0) result = Some(hits)
    }
    result.map(_.select(pathCol.as("path")).distinct())
      .getOrElse(seed(g, Nil).select(pathCol.as("path")))
  }

  /** Deterministic hash-guided random walks — DeepWalk/node2vec-style
    * corpus generation from the graph (extension surface; the reference has
    * no corpus generator). From each source, `steps` hops where the next
    * vertex is the out-neighbor minimizing md5("walkId:step:dst") — a
    * seeded uniform choice both engines reproduce bit-for-bit, so the walk
    * corpus is exactly oracle-able. Dead-end walks emit their partial path.
    * Scale shape: one adjacency join + one per-walk argmin aggregation per
    * step; only the walk table (|sources| rows) ever shuffles. */
  // PLAN-keyed memos (Pin.PlanMemo, r11 — previously edges-reference keys):
  // sameResult of the edges plan + hyper-params, so the memo hits in
  // store-resident mode where every call constructs a fresh edges frame.
  // Cleared via Pin.clear() (PlanMemo self-registers) for tests that
  // overwrite parquet in place.
  private val walksMemo =
    new Pin.PlanMemo[(Seq[String], Int, Direction.Value, Seq[String])]

  def guidedWalks(g: PropertyGraph, sources: Seq[String], steps: Int,
                  dir: Direction.Value, labels: Seq[String] = Nil): DataFrame =
    // PLAN-memoized per (graph, params): the walk corpus is a working set —
    // downstream consumers (skip-gram pairs, walk stats) reuse one
    // checkpoint-backed table; plan keys (not references) keep the memo
    // hitting in store-resident mode, where every call constructs a fresh
    // edges frame (the r10 landmark-memo lesson)
    walksMemo.getOrBuild(g.edges, (sources, steps, dir, labels))(
      guidedWalksCompute(g, sources, steps, dir, labels))

  /** Persist a walk corpus through
    * [[graft.sources.GraphStore.saveArtifact]] — the walks are md5-drawn
    * (deterministic), so the stored rows ARE the derived rows; a restarted
    * session loads them and the skip-gram/stats consumers never re-walk.
    * Builds first if this session hasn't (memoized). */
  def saveWalks(artifactDir: String, g: PropertyGraph, sources: Seq[String],
                steps: Int, dir: Direction.Value,
                labels: Seq[String] = Nil): Unit =
    graft.sources.GraphStore.saveArtifact(
      guidedWalks(g, sources, steps, dir, labels), artifactDir,
      "walk_corpus", walkParams(sources, steps, dir, labels) +
        graft.sources.GraphStore.inputIdentity(g.edges))

  /** Seed the walk memo from a persisted corpus; false when absent. */
  def loadWalks(artifactDir: String, g: PropertyGraph, sources: Seq[String],
                steps: Int, dir: Direction.Value,
                labels: Seq[String] = Nil): Boolean =
    graft.sources.GraphStore.loadArtifact(g.vertices.sparkSession,
      artifactDir, "walk_corpus", walkParams(sources, steps, dir, labels) +
        graft.sources.GraphStore.inputIdentity(g.edges))
      .exists { df =>
        walksMemo.getOrBuild(g.edges, (sources, steps, dir, labels))(
          Pin.pinDerived(df.select(col("walk_id"), col("path"))))
        true
      }

  private def walkParams(sources: Seq[String], steps: Int,
                         dir: Direction.Value, labels: Seq[String]) = {
    // the source LIST can be thousands of ids — hash it into the param
    // key; LENGTH-PREFIXED joining (GraphStore.keyOfList) so distinct
    // lists can never encode identically (ids/labels may contain commas)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(graft.sources.GraphStore.keyOfList(sources).getBytes("UTF-8"))
    Map("sources_md5" -> md.map("%02x".format(_)).mkString,
      "n_sources" -> sources.length.toString, "steps" -> steps.toString,
      "dir" -> dir.toString,
      "labels" -> graft.sources.GraphStore.keyOfList(labels))
  }

  /** Seed-count gate for the forced broadcasts inside the walk loops: walk
    * tables carry exactly one row per source, so every hinted side is
    * bounded by |sources| (hop key sets) or |sources| × per-vertex degree
    * (the node2vec candidate pair set). Past the gate the hints drop and
    * the joins fall back to Spark's own planning (shuffled at worst) — a
    * |V|-scale walk corpus must never force a driver-sized broadcast
    * (r15 verdict item 3). Declared walk queries pass dozens of sources;
    * the gate only exists for the 100 TB design point. */
  private[graft] val walkBroadcastMaxSources = 50000

  private def guidedWalksCompute(g: PropertyGraph, sources: Seq[String], steps: Int,
                                 dir: Direction.Value, labels: Seq[String]): DataFrame = {
    def maybeB(df: DataFrame): DataFrame =
      if (sources.size <= walkBroadcastMaxSources) broadcast(df) else df
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = Traversals.adjacencyView(g, dir, labels)
    var frontier = sources.toDF("wid")
      .select(col("wid"), col("wid").as("cur"), col("wid").as("path"))
    var acc = frontier.filter(lit(false)).select(col("wid"), col("path"))
    val pruner = new Traversals.FrontierPruner
    for (s <- 1 to steps) {
      // INNER join keeps the tiny walk table broadcastable (a left-outer
      // could only broadcast the edge side — a per-step sort-merge of the
      // whole edge table); dead walks are recovered with an anti join
      // against the (≤ |sources|-row) surviving-step keys
      val hop = frontier
        .join(pruner.prune(edges, frontier, "cur")
          .withColumnRenamed("src", "cur"), Seq("cur"))
        .withColumn("score", md5(concat_ws(":", col("wid"), lit(s), col("dst"))))
        .groupBy(col("wid"))
        .agg(min(struct(col("score"), col("dst"), col("path"))).as("m"))
        .select(col("wid"), col("m.dst").as("cur"),
          concat(col("m.path"), lit("->"), col("m.dst")).as("path"))
        .localCheckpoint(true)
      acc = acc.unionByName(
        frontier.join(maybeB(hop.select(col("wid"))), Seq("wid"), "left_anti")
          .select(col("wid"), col("path")))
      frontier = hop
    }
    acc.unionByName(frontier.select(col("wid"), col("path")))
      .select(col("wid").as("walk_id"), col("path"))
      .localCheckpoint(true)
  }

  /** node2vec-style SECOND-ORDER biased walks (Grover & Leskovec 2016):
    * like [[guidedWalks]], but each step's next-hop draw is weighted by the
    * p/q bias — 1/p for returning to the previous vertex, 1 for a
    * candidate adjacent to it (BFS-flavored), 1/q otherwise
    * (DFS-flavored). Selection = argmin of −ln(u)/w over the candidates,
    * u the md5-uniform per-(walk, step, candidate) draw — the A-Res top-1,
    * i.e. probability ∝ weight, and exactly reproducible by the oracle
    * (same hash, same key). One walk per source, `steps` hops, dead ends
    * keep their prefix.
    *
    * Scale shape: the [[guidedWalks]] discipline — tiny walk table joins
    * the pinned adjacency per step (frontier-pruned, broadcastable), plus
    * ONE extra (prev, dst)-keyed membership join against the same pinned
    * view for the BFS-flavor flag; everything else narrow. */
  def node2vecWalks(g: PropertyGraph, sources: Seq[String], steps: Int,
                    dir: Direction.Value, p: Double, q: Double,
                    labels: Seq[String] = Nil): DataFrame =
    // same PLAN-keyed corpus-builder discipline as [[guidedWalks]]: the
    // biased walk corpus is a trained artifact its consumers share — in
    // store-resident mode especially, where each un-memoized build pays
    // 2 store reads per hop (the r11 bucketed sweep's worst tail, 4.2×)
    n2vMemo.getOrBuild(g.edges, (sources, steps, dir, p, q, labels))(
      node2vecWalksCompute(g, sources, steps, dir, p, q, labels))

  private val n2vMemo = new Pin.PlanMemo[
    (Seq[String], Int, Direction.Value, Double, Double, Seq[String])]

  private def node2vecWalksCompute(g: PropertyGraph, sources: Seq[String], steps: Int,
                    dir: Direction.Value, p: Double, q: Double,
                    labels: Seq[String]): DataFrame = {
    // seed-count gate (r15 verdict item 3): the candidate pair set below is
    // walk-table-bounded (|sources| × per-step degree) — broadcast it only
    // while the walk count is point-query-sized; a |V|-scale walk sweep
    // falls back to Spark's planned join (the edge view then shuffles, but
    // so does everything at that frontier size — never a driver OOM)
    def maybeB(df: DataFrame): DataFrame =
      if (sources.size <= walkBroadcastMaxSources) broadcast(df) else df
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = Traversals.adjacencyView(g, dir, labels)
    val nbView = edges.select(col("src").as("prev"), col("dst"))
      .withColumn("__nb", lit(1))
    var frontier = sources.toDF("wid")
      .select(col("wid"), lit(null).cast("string").as("prev"),
        col("wid").as("cur"), col("wid").as("path"))
    var acc = frontier.filter(lit(false)).select(col("wid"), col("path"))
    val pruner = new Traversals.FrontierPruner
    for (s <- 1 to steps) {
      // the BFS-flavor membership flag ((prev, dst) is an edge) used to be
      // a LEFT join with the full pinned view on the RIGHT — a side that
      // big can only sort-merge, so every step re-shuffled+re-sorted the
      // whole edge table (the exact per-step anti-pattern the frontier
      // joins avoid). Invert it: stream the pinned view once against the
      // BROADCAST candidate pair set (walk-table-sized) to extract the
      // matching pairs, then left-join those (still walk-table-sized) back
      // — the edge table is never shuffled, any graph scale.
      val cand0 = frontier
        .join(pruner.prune(edges, frontier, "cur")
          .withColumnRenamed("src", "cur"), Seq("cur"))
        .localCheckpoint(false)
      val nbHits = nbView
        .join(maybeB(cand0.filter(col("prev").isNotNull)
          .select(col("prev"), col("dst")).distinct()),
          Seq("prev", "dst"), "left_semi")
      val cand = cand0.join(maybeB(nbHits), Seq("prev", "dst"), "left")
      val u = (graft.ops.Packing.hash16(
        concat_ws(":", col("wid"), lit(s), col("dst"))) + 1).cast("double") / 65536.0
      val w = when(col("dst") === col("prev"), lit(1.0 / p))
        .when(col("__nb").isNotNull, lit(1.0))
        .otherwise(lit(1.0 / q))
      val hop = cand
        .withColumn("key", -log(u) / w)
        .groupBy(col("wid"))
        .agg(min(struct(col("key"), col("dst"), col("cur"), col("path"))).as("m"))
        .select(col("wid"), col("m.cur").as("prev"), col("m.dst").as("cur"),
          concat(col("m.path"), lit("->"), col("m.dst")).as("path"))
        .localCheckpoint(true)
      acc = acc.unionByName(
        frontier.join(maybeB(hop.select(col("wid"))), Seq("wid"), "left_anti")
          .select(col("wid"), col("path")))
      frontier = hop
    }
    acc.unionByName(frontier.select(col("wid"), col("path")))
      .select(col("wid").as("walk_id"), col("path"))
      .localCheckpoint(true) // the memoized corpus artifact, like guidedWalks
  }

  /** Skip-gram pair extraction over a walk corpus (word2vec-style training
    * prep, composes with [[guidedWalks]]): for every position pair within
    * `window` hops of the same walk, emit (center, context) and count
    * across the corpus. One explode + one position-band self-join keyed by
    * walk_id — at scale the join is co-partitioned on the walk id and never
    * touches pairs across walks. */
  def walkSkipgrams(walks: DataFrame, window: Int): DataFrame = {
    val toks = walks.select(col("walk_id"), posexplode(split(col("path"), "->")))
      .select(col("walk_id"), col("pos"), col("col").as("v"))
    toks.as("a").join(toks.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
        col("a.pos") =!= col("b.pos") &&
        abs(col("a.pos") - col("b.pos")) <= window)
      .groupBy(col("a.v").as("center"), col("b.v").as("context"))
      .agg(count(lit(1)).as("n"))
  }

  /** GraphSAGE-style layered neighbor sampling (Hamilton et al., "Inductive
    * Representation Learning on Large Graphs", 2017): for each seed, layer
    * ℓ samples at most `fanouts(ℓ-1)` neighbors of every node reached at
    * layer ℓ-1 — the standard mini-batch subgraph extraction for GNN
    * training. Sampling is deterministic (md5-ranked per (seed, layer,
    * node), ties on dst) so the result is exactly reproducible by the SQL
    * oracle and across retries — the same seeded-choice contract as
    * [[guidedWalks]]. Returns sampled edges `(seed, layer, src, dst)`.
    *
    * Scale shape: per layer one frontier⋈edges join (frontier side stays
    * tiny and broadcastable; [[Traversals.pruneForFrontier]] pushes the
    * point-lookup IN-list when applicable) + one Window partitioned by
    * (seed, node) — never unpartitioned, and the partition width is
    * bounded by the node's degree before the cap. Frontier growth is
    * bounded by Π fanouts, not by graph degree — that bound is the whole
    * point of the operator at 100 TB. */
  def layeredNeighborSample(g: PropertyGraph, sources: Seq[String],
                            fanouts: Seq[Int], dir: Direction.Value,
                            labels: Seq[String] = Nil): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = Traversals.adjacencyView(g, dir, labels)
    var frontier = sources.toDF("seed")
      .select(col("seed"), col("seed").as("node")).distinct()
    var acc = frontier.filter(lit(false))
      .select(col("seed"), lit(0).as("layer"), col("node").as("src"), col("node").as("dst"))
    val pruner = new Traversals.FrontierPruner
    for ((f, i) <- fanouts.zipWithIndex) {
      val l = i + 1
      val expanded = frontier
        .join(pruner.prune(edges, frontier, "node")
          .withColumnRenamed("src", "node"), Seq("node"))
      val w = Window.partitionBy(col("seed"), col("node"))
        .orderBy(md5(concat_ws(":", col("seed"), lit(l), col("node"), col("dst"))),
          col("dst"))
      val sampled = expanded.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= f)
        .select(col("seed"), lit(l).as("layer"), col("node").as("src"), col("dst"))
        .localCheckpoint(true)
      acc = acc.unionByName(sampled)
      frontier = sampled.select(col("seed"), col("dst").as("node")).distinct()
    }
    acc
  }

  /** Rays: root-to-leaf simple paths — expansion stops at vertices with no
    * outgoing step edges or at maxDepth (reference `SubGraphTraverser.rays:59`). */
  def rays(g: PropertyGraph, source: String, dir: Direction.Value,
           labels: Seq[String] = Nil, maxDepth: Int): DataFrame = {
    val edges = Traversals.adjacencyView(g, dir, labels)
    var frontier = seed(g, Seq(source))
    var acc = frontier.filter(lit(false)).select(pathCol.as("path"))
    val pruner = new Traversals.FrontierPruner
    for (_ <- 1 to maxDepth) {
      // single materialization per hop: leaves and the next frontier both
      // derive from this checkpoint; distinct edges keep paths distinct.
      // Pruned view = ALL edges whose src is a frontier id, so the LEFT
      // join's null-dst (leaf) semantics survive the pushdown intact.
      val expanded = frontier.select(col("id").as("src"), col("path"))
        .join(pruner.prune(edges, frontier), Seq("src"), "left")
        .localCheckpoint(true)
      // leaves: no out-edge (dst null) → the walk ends here
      acc = acc.unionByName(
        expanded.filter(col("dst").isNull).select(pathCol.as("path")))
      frontier = expanded.filter(col("dst").isNotNull)
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"))
    }
    // paths cut off at maxDepth count as rays too
    acc.unionByName(frontier.select(pathCol.as("path"))).distinct()
  }

  /** Rings: simple cycles source→…→source up to maxDepth
    * (reference `SubGraphTraverser.rings:65`). With BOTH direction, the
    * depth-2 closure A→B→A over a SINGLE physical edge is a backtrack, not
    * a ring — it only counts when parallel edges exist between A and B
    * (reference `SubGraphTraverser.java:250-268`: target == parent closes a
    * ring iff direction != BOTH or hasMultiEdges). A deeper closure can
    * never revisit the source mid-path, so the parent==target rule reduces
    * to the path-length-2 case. */
  def rings(g: PropertyGraph, source: String, dir: Direction.Value,
            labels: Seq[String] = Nil, maxDepth: Int): DataFrame = {
    val edges = Traversals.adjacencyView(g, dir, labels)
    // (src,dst) pairs with ≥2 parallel edges in the raw (multiplicity-
    // preserving) step view — tiny, broadcast into the closure filter
    lazy val multiPairs = EdgeStep(dir, labels).edgesFor(g)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("__m"))
      .filter(col("__m") > 1).select(col("src"), col("dst"))
      .localCheckpoint(true)
    var frontier = seed(g, Seq(source))
    var acc = frontier.filter(lit(false)).select(pathCol.as("path"))
    val pruner = new Traversals.FrontierPruner
    for (_ <- 1 to maxDepth) {
      val expanded = frontier.select(col("id").as("src"), col("path"))
        .join(pruner.prune(edges, frontier), Seq("src"))
        .localCheckpoint(true)
      var closures = expanded.filter(col("dst") === source)
      if (dir == Direction.BOTH)
        closures = closures.filter(size(col("path")) > 2)
          .unionByName(closures.filter(size(col("path")) === 2)
            .join(broadcast(multiPairs), Seq("src", "dst"), "left_semi"))
      acc = acc.unionByName(closures
        .select(concat_ws("->", concat(col("path"), array(col("dst")))).as("path")))
      frontier = expanded
        .filter(col("dst") =!= source && !array_contains(col("path"), col("dst")))
        .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"))
    }
    acc.distinct()
  }

  /** Template paths: one typed step per template position — direction,
    * labels, a vertex predicate on the step's target, and `maxTimes`: the
    * step may repeat 1..maxTimes times (reference
    * `TemplatePathsTraverser.java:44,68-69,109` sums `maxTimes` into
    * `totalSteps` and folds each repeat's frontier into the step's
    * accumulated `sourcesAll`, so the NEXT step starts from the union of
    * all 1..maxTimes applications — "1 to 3 hops of label X" in one step;
    * `steps/RepeatEdgeStep.java`). */
  final case class TemplateStep(step: EdgeStep, targetFilter: Option[Cond] = None,
                                maxTimes: Int = 1)

  /** `withRing=false` (reference default) keeps paths simple — each hop
    * drops targets already on the path, the dataflow twin of the
    * reference's `source.contains(targetV)` skip in
    * `TemplatePathsTraverser.processOneForForward:158`; `withRing=true`
    * admits revisits (rings), skipping the filter entirely.
    *
    * Scale shape: per template position, 1..maxTimes frontier⋈edges hops
    * (each a key-partitioned join + layer-local distinct); the union over
    * repeat counts is lazy and feeds the next position as one frontier.
    * No driver-side path state — paths live in an array column. */
  def templatePaths(g: PropertyGraph, sources: Seq[String],
                    steps: Seq[TemplateStep],
                    withRing: Boolean = false): DataFrame = {
    var frontier = seed(g, sources)
    steps.foreach { ts =>
      val e = ts.step.edgesFor(g).select(col("src"), col("dst"))
      var cur = frontier
      var acc: DataFrame = null
      for (_ <- 1 to math.max(1, ts.maxTimes)) {
        var next = cur.select(col("id").as("src"), col("path")).join(e, Seq("src"))
        if (!withRing) next = next.filter(!array_contains(col("path"), col("dst")))
        var stepped = next
          .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"))
          .distinct() // layer-local multi-edge collapse, not a full-table one
        ts.targetFilter.foreach { c =>
          stepped = stepped.join(g.vertices.filter(c.compile).select(col("id")), Seq("id"), "left_semi")
        }
        // Eager cuts kept (r16: lazy cuts tried and reverted): `cur` feeds
        // TWO branches of the same downstream action when maxTimes > 1,
        // and with lazy cuts q_template_paths_repeat went bimodal in full-
        // bench sessions (2.1 s vs 5.5–6.3 s on identical code) — the
        // eager barrier pins each layer before its consumers fork, and the
        // ~2 driver jobs it costs are noise at this query's size.
        cur = stepped.localCheckpoint(true)
        acc = if (acc == null) cur else acc.unionByName(cur)
      }
      frontier = if (ts.maxTimes <= 1) cur else acc.localCheckpoint(true)
    }
    frontier.select(pathCol.as("path")).distinct()
  }

  /** Customized (weighted) paths: per-step weight property summed along the
    * path, global top-N by total weight (reference
    * `CustomizePathsTraverser.customizedPaths:76`, `topNPath:49`).
    * Deterministic tiebreak on the path string. */
  def customizedPaths(g: PropertyGraph, sources: Seq[String],
                      steps: Seq[(EdgeStep, Option[String])], // (step, weight prop)
                      topN: Int): DataFrame =
    customizedPathsWeighted(g, sources,
      steps.map { case (st, wp) => WeightedStep(st, wp) }, topN)

  /** Full weighted-step bundle (reference `steps/WeightedEdgeStep.java:
    * 58-88`): the per-step weight property with a `defaultWeight` fallback
    * for edges lacking it, and an optional per-vertex `sample` cap — the
    * reference draws `sample` of each vertex's edges uniformly at random
    * to bound fan-out; the deterministic twin orders a vertex's edges by
    * their md5 draw (the q_split_assign / weightedSample uniform-hash
    * precedent, tiebroken by (dst, weight)) and keeps the first `sample`. */
  final case class WeightedStep(step: EdgeStep, weightBy: Option[String] = None,
                                defaultWeight: Double = 0.0,
                                sample: Long = -1L)

  def customizedPathsWeighted(g: PropertyGraph, sources: Seq[String],
                              steps: Seq[WeightedStep], topN: Int): DataFrame = {
    var frontier = seed(g, sources).withColumn("w", lit(0.0))
    steps.foreach { ws =>
      val wcol = ws.weightBy
        .map(p => coalesce(col(p), lit(ws.defaultWeight))).getOrElse(lit(1.0))
      var e = ws.step.edgesFor(g).select(col("src"), col("dst"), wcol.as("ew"))
      if (ws.sample >= 0L) {
        // restrict to the frontier's sources BEFORE the window (r16, guide
        // §2.2 filter early): row_number is per-src, and the semi-join
        // keeps or drops COMPLETE src groups, so the sampled edge set for
        // surviving sources is identical — but the window sorts only the
        // frontier's fan-out, not the whole edge view (measured: the
        // full-view window was 1.69 s of q_customized_paths_sample's
        // 2.37 s at sf0.1 against a ~15-source frontier)
        e = e.join(frontier.select(col("id").as("src")).distinct(),
          Seq("src"), "left_semi")
        // src-partitioned window: sorts only per-vertex fan-out (the
        // degree-cap window shape), never O(|E|) globally
        val win = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(md5(concat(col("src"), lit("|"), col("dst"))), col("dst"), col("ew"))
        e = e.withColumn("__rn", row_number().over(win))
          .filter(col("__rn") <= ws.sample).drop("__rn")
      }
      frontier = frontier.select(col("id").as("src"), col("path"), col("w"))
        .join(e, Seq("src"))
        .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"),
          (col("w") + col("ew")).as("w"))
        // lazy cut — single consumer per step (the next hop / the final
        // aggregation); one driver job per step saved, see [[templatePaths]]
        .localCheckpoint(false)
    }
    val paths = frontier
      .groupBy(pathCol.as("path")).agg(sum(col("w")).as("total_weight"))
    // orderBy+limit compiles to TakeOrderedAndProject — a distributed
    // partial top-k per partition, not a single-partition global Window sort
    paths.orderBy(col("total_weight").desc, col("path").asc).limit(topN)
      .select(col("path"), round(col("total_weight"), 6).as("total_weight"))
  }

  /** Paths between two vertex sets (reference
    * `CollectionPathsTraverser.paths:43`). */
  def collectionPaths(g: PropertyGraph, sources: Seq[String], targets: Seq[String],
                      dir: Direction.Value, labels: Seq[String], maxDepth: Int): DataFrame = {
    val edges = Traversals.adjacencyView(g, dir, labels)
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val targetDf = targets.toDF("id")
    var frontier = seed(g, sources)
    var acc = frontier.filter(lit(false))
    val pruner = new Traversals.FrontierPruner
    for (_ <- 1 to maxDepth) {
      frontier = frontier.select(col("id").as("src"), col("path"))
        .join(pruner.prune(edges, frontier), Seq("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("id"), concat(col("path"), array(col("dst"))).as("path"))
        .localCheckpoint(true)
      acc = acc.unionByName(frontier.join(targetDf, Seq("id"), "left_semi"))
    }
    acc.select(pathCol.as("path")).distinct()
  }

  /** Pairwise shortest distances among a vertex set (reference
    * `MultiNodeShortestPathTraverser:68`): one multi-source BFS, every
    * source tagged, min first-visit distance per ordered pair a<b. */
  def multiNodeShortestDist(g: PropertyGraph, nodes: Seq[String],
                            dir: Direction.Value, labels: Seq[String],
                            maxDepth: Int): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val verts = nodes.toDF("id")
    // BOTH adjacency is already symmetric+distinct → reuse the session-pinned
    // shared view (same materialization every BFS query plans against)
    // instead of building a private union+distinct copy cold inside the query
    val dists =
      if (dir == Direction.BOTH)
        graft.olap.Algorithms.multiSourceBfsAdj(verts,
          Traversals.adjacencyView(g, dir, labels), maxDepth, symmetric = true)
      else
        graft.olap.Algorithms.multiSourceBfs(verts,
          EdgeStep(dir, labels).edgesFor(g)
            .select(col("src"), col("dst")).distinct(), maxDepth)
    dists.join(verts.withColumnRenamed("id", "root2"), col("id") === col("root2"), "left_semi")
      .filter(col("root") < col("id"))
      .select(col("root").as("a"), col("id").as("b"), col("dist"))
  }

  /** Crosspoints: vertices reachable from ALL sources within maxDepth,
    * sources excluded (reference `Path.crosspoint`, CrosspointsAPI).
    * One tagged multi-source BFS over a single pinned edge view — not one
    * BFS per source. */
  def crosspoints(g: PropertyGraph, sources: Seq[String], dir: Direction.Value,
                  labels: Seq[String], maxDepth: Int): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = Traversals.adjacencyView(g, dir, labels)
    var seen = sources.map(s => (s, s)).toDF("root", "id")
    var frontier = seen
    val pruner = new Traversals.FrontierPruner
    for (d <- 1 to maxDepth) {
      frontier = frontier.select(col("root"), col("id").as("src"))
        .join(pruner.prune(edges, frontier), Seq("src"))
        .select(col("root"), col("dst").as("id")).distinct()
        .join(seen, Seq("root", "id"), "left_anti")
        .localCheckpoint(true)
      seen = seen.union(frontier)
    }
    seen.groupBy(col("id")).agg(countDistinct(col("root")).as("nroots"))
      .filter(col("nroots") === sources.length)
      .select(col("id"))
      .filter(!col("id").isin(sources: _*))
  }

  /** Bounded weighted SSSP: Bellman-Ford relaxation for `rounds` rounds —
    * equals the reference's Dijkstra result (`SingleSourceShortestPath
    * Traverser:49`) whenever rounds ≥ weighted-path hop diameter. Weight =
    * `weightCol` (missing → 1.0), must be non-negative. */
  private val ssspMemo =
    new Pin.PlanMemo[(String, Direction.Value, Seq[String], String, Int)]

  def weightedSssp(g: PropertyGraph, source: String, dir: Direction.Value,
                   labels: Seq[String], weightCol: String, rounds: Int): DataFrame =
    // PLAN-memoized per (graph, params): weightedShortestPath s→t is SSSP
    // filtered at the target — the distance table is the shared working set
    // (checkpoint-backed, so reuse costs nothing; plan keys survive
    // store-resident mode, the walksMemo note)
    ssspMemo.getOrBuild(g.edges, (source, dir, labels, weightCol, rounds))(
      weightedSsspCompute(g, source, dir, labels, weightCol, rounds))

  /** The co-partitioned weighted edge view SSSP rounds plan against —
    * shared, pinned once per session (the pageRankViews shape). Exposed so
    * Bench.warmup can build it in the load phase: constructing it inside
    * the first timed SSSP query charges the full-edge repartition to that
    * query's cold time. */
  def weightedEdgeView(g: PropertyGraph, dir: Direction.Value,
                       labels: Seq[String], weightCol: String): DataFrame =
    pinned(EdgeStep(dir, labels).edgesFor(g)
      .select(col("src"), col("dst"),
        coalesce(col(weightCol).cast("double"), lit(1.0)).as("w"))
      .repartition(col("src")))

  private def weightedSsspCompute(g: PropertyGraph, source: String, dir: Direction.Value,
                                  labels: Seq[String], weightCol: String, rounds: Int): DataFrame =
    // co-partitioned by src once (the pageRank shape): rounds join on src,
    // so only the small dist side ever moves — the edge table never
    // re-shuffles across rounds
    relaxLoop(weightedEdgeView(g, dir, labels, weightCol), source, rounds,
        cut = None, tag = "sssp")
      .select(col("id"), round(col("dist"), 6).as("dist"))

  /** The ONE bounded delta-relaxation loop — shared verbatim by
    * [[weightedSssp]] (cut = None) and [[weightedPathPruned]] (cut = the
    * landmark bound), so the pruned search stays bit-identical to the
    * plain one by construction, not by parallel maintenance. Per round:
    * only vertices whose distance IMPROVED last round (and, with a cut,
    * sit within the bound) relax their edges — an unimproved vertex
    * already contributed the identical dist(u)+w candidates to an earlier
    * round's min, so the result is bit-for-bit the classic every-vertex
    * Bellman-Ford (dist after k rounds = min over ≤k-hop paths, restricted
    * under a cut to paths whose prefixes stay within the bound), while the
    * per-round join shrinks from |reached| to |frontier|. An empty delta
    * frontier means every later round is a no-op — the bounded result is
    * already final (one cheap scan of the round's checkpoint vs. a wasted
    * relaxation round). Returns the UNROUNDED (id, dist) table. */
  private def relaxLoop(edges: DataFrame, source: String, rounds: Int,
                        cut: Option[Double], tag: String): DataFrame =
    relaxLoopStatus(edges, source, rounds, cut, tag)._1

  /** [[relaxLoop]] plus a CONVERGED flag (frontier emptied before the round
    * budget ran out). Callers that prune on an upper bound need it: the
    * bit-equality argument (pruned == bounded-unpruned at the target) only
    * holds at fixpoint — a non-converged bounded search can legitimately
    * settle the target via a ≤rounds-hop path whose prefix exceeds the
    * landmark bound, which the cut would have dropped. */
  private def relaxLoopStatus(edges: DataFrame, source: String, rounds: Int,
                              cut: Option[Double], tag: String): (DataFrame, Boolean) = {
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0.0)).toDF("id", "dist")
    var changed = dist
    var converged = false
    for (r <- 1 to rounds if !converged) {
      // settled-merge fused into the candidate min-aggregation (r16, the
      // [[weightedSsspConverged]] / pageRank union pattern): raw dist+w
      // candidates and the previous distances (riding a self row, unique
      // per id → max(old)) share ONE id-keyed exchange — the former
      // per-round groupBy + full-outer sort-merge join paid a second
      // exchange plus two O(|reached| log) sorts. min() is
      // order-insensitive, so distances stay bit-identical.
      // min(dist) over the union ≡ least(coalesce(old,rdist),
      // coalesce(rdist,old)); improved ≡ old is null or the min beat it.
      val merged = changed.select(col("id").as("src"), col("dist"))
        .join(edges, Seq("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"),
          lit(null).cast("double").as("old"))
        .unionByName(dist.select(col("id"), col("dist"), col("dist").as("old")))
        .groupBy(col("id")).agg(min(col("dist")).as("dist"), max(col("old")).as("old"))
        .select(col("id"), col("dist"),
          (col("old").isNull || col("dist") < col("old")).as("improved"))
        // lazy cut: the frontier count below materializes it — one driver
        // job per round where the eager checkpoint + limit(1) probe paid two
        .localCheckpoint(false)
      val improved = merged.filter(col("improved"))
      changed = cut.fold(improved)(c => improved.filter(col("dist") <= c))
        .select(col("id"), col("dist"))
      val frontierN = changed.count()
      if (wspDebug) System.err.println(
        s"[wsp:$tag] round=$r frontier=$frontierN")
      converged = frontierN == 0
      dist = merged.select(col("id"), col("dist"))
    }
    (dist, converged)
  }

  /** Weighted SSSP relaxed to FIXPOINT — the reference's Dijkstra semantics
    * (`SingleSourceShortestPathTraverser:49`) without a round bound. Each
    * round relaxes every edge once (distributed Bellman-Ford); terminates
    * when no distance improves, ≤ |V|-1 rounds on non-negative weights.
    * `maxRounds` is a runaway guard, not a semantic bound. */
  def weightedSsspConverged(g: PropertyGraph, source: String, dir: Direction.Value,
                            labels: Seq[String], weightCol: String,
                            maxRounds: Int = 100): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = pinned(EdgeStep(dir, labels).edgesFor(g)
      .select(col("src"), col("dst"),
        coalesce(col(weightCol).cast("double"), lit(1.0)).as("w"))
      .repartition(col("src")))
    var dist = Seq((source, 0.0)).toDF("id", "dist").localCheckpoint(true)
    var changed = 1L
    var r = 0
    while (changed > 0 && r < maxRounds) {
      r += 1
      val relaxed = dist.select(col("id").as("src"), col("dist"))
        .join(edges, Seq("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"),
          lit(null).cast("double").as("old"))
      // carry the previous distance through the aggregation so convergence
      // is a scan of this round's checkpoint, not an extra join job
      val next = dist
        .select(col("id"), col("dist"), col("dist").as("old"))
        .unionByName(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"), max(col("old")).as("old"))
        .localCheckpoint(true)
      changed = next.filter(col("old").isNull || col("dist") < col("old")).count()
      dist = next.select(col("id"), col("dist"))
    }
    dist.select(col("id"), round(col("dist"), 6).as("dist"))
  }

  /** Probe-then-verify weighted s→t distance: the warmup-built weighted
    * landmark index ([[graft.olap.Algorithms.weightedLandmarkIndex]])
    * yields an UPPER BOUND ub = min_l d(s,l)+d(l,t) in one 1-row probe;
    * the exact delta Bellman-Ford then PRUNES every settled vertex with
    * dist(s,u) > ub — on non-negative weights such a vertex cannot lie on
    * any s→t path shorter than ub ≥ d(s,t), so the surviving relaxation is
    * bit-for-bit [[weightedSssp]] at the target while the frontier stays
    * goal-bounded (Goldberg-Harrelson ALT family, landmark-bound variant;
    * the index is the same artifact `q_landmark_weighted` probes). The
    * +1e-5 margin absorbs the index's per-leg 6-decimal rounding, keeping
    * the prune strictly conservative. Falls back to the unpruned search
    * when no landmark reaches both endpoints within `rounds`, and ALSO when
    * the pruned loop exhausts `rounds` without converging — the cut is only
    * sound at fixpoint (see the Some(bound) branch).
    *
    * The 1-row `collect` is a gated driver-side probe (the FrontierPruner
    * discipline): the bound must reach the driver to parameterize the
    * loop's filter literal. */
  /** GRAFT_WSP_DEBUG=1: print per-round pruned vs unpruned frontier sizes
    * (dev-only counts; off in benchmarks). */
  private lazy val wspDebug = sys.env.get("GRAFT_WSP_DEBUG").contains("1")

  def weightedPathPruned(g: PropertyGraph, source: String, target: String,
                         dir: Direction.Value, labels: Seq[String],
                         weightCol: String, rounds: Int,
                         landmarks: Seq[String]): DataFrame = {
    // SYMMETRIC views only: the landmark index stores from-landmark legs,
    // so ub = d(l,s)+d(l,t) upper-bounds d(s,t) only when d(l,s) = d(s,l) —
    // on a directed view the "bound" could be SMALLER than the true
    // distance and the prune would silently drop the optimal path
    require(dir == graft.core.Direction.BOTH,
      "weightedPathPruned needs the symmetric BOTH view: one-sided " +
        "landmark legs only bound d(s,t) when edges are undirected")
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edges = weightedEdgeView(g, dir, labels, weightCol)
    val ub = graft.olap.Algorithms.weightedLandmarkDistances(
        Seq((source, target)).toDF("a", "b"), landmarks, edges, rounds)
      .collect().headOption.map(_.getDouble(2))
    ub match {
      case None =>
        weightedSssp(g, source, dir, labels, weightCol, rounds)
          .filter(col("id") === target).select(col("dist"))
      case Some(bound) =>
        // The prune is only sound once the search CONVERGES within the round
        // budget: ub is witnessed by a ≤2·rounds-hop walk through the
        // landmark, so a non-converged rounds-bounded search can settle the
        // target via a ≤rounds-hop route whose prefix exceeds ub — a route
        // the cut drops. At fixpoint the optimal path (every prefix ≤
        // d(s,t) ≤ ub) is fully explored by a ≤rounds-hop relaxation
        // sequence, so pruned == bounded-unpruned bit-for-bit. Non-converged
        // → fall back to the unpruned (memoized) search.
        val (pruned, converged) = relaxLoopStatus(edges, source, rounds,
          cut = Some(bound + 1e-5), tag = "pruned")
        if (converged)
          pruned.filter(col("id") === target)
            .select(round(col("dist"), 6).as("dist"))
        else
          weightedSssp(g, source, dir, labels, weightCol, rounds)
            .filter(col("id") === target).select(col("dist"))
    }
  }
}
