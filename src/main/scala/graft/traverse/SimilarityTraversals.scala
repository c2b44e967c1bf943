package graft.traverse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Similarity-flavoured traversers: batch fusiform similarity, top-N jaccard
  * around a source, layered neighborRank. */
object SimilarityTraversals {

  /** Fusiform ("spindle") similarity, batch over a source set — semantics
    * copied from reference `FusiformSimilarityTraverser
    * .fusiformSimilarityForVertex` (see file:103-186):
    *  - neighbors(v) = DISTINCT targets of v via (dir, label); sources with
    *    |neighbors| < minNeighbors are skipped;
    *  - candidate counts = per DISTINCT (neighbor, candidate) back-edge pair;
    *  - score(c) = count(c) / |neighbors(v)|, keep score ≥ alpha, drop v
    *    itself; sources with < minSimilars matches produce nothing;
    *  - top > 0 keeps the top-N by (score desc, candidate asc — our
    *    deterministic tiebreak; the reference's map order is unspecified).
    * One aggregation pipeline for ALL sources — the reference loops vertex
    * by vertex; at scale the whole frontier is two joins + two groupBys. */
  def fusiformSimilarity(g: PropertyGraph, sources: DataFrame, dir: Direction.Value,
                         label: String, minNeighbors: Int, alpha: Double,
                         minSimilars: Int, top: Int): DataFrame = {
    val fwd = g.adjacency(dir, Seq(label)).select(col("src"), col("dst")).distinct()
    val nbrs = fwd.join(sources.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .select(col("src").as("v"), col("dst").as("t"))
    val nbrCount = nbrs.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minNeighbors)
    val back = fwd.select(col("dst").as("t"), col("src").as("cand"))
    val counts = nbrs.join(nbrCount, Seq("v"), "left_semi")
      .join(back, Seq("t"))
      .groupBy(col("v"), col("cand")).agg(count(lit(1)).as("c"))
      .filter(col("v") =!= col("cand"))
    val scored = counts.join(nbrCount, Seq("v"))
      .withColumn("score", col("c").cast("double") / col("n"))
      .filter(col("score") >= alpha)
    val withEnough = scored.join(
      scored.groupBy(col("v")).agg(count(lit(1)).as("ns"))
        .filter(col("ns") >= minSimilars).select(col("v")),
      Seq("v"), "left_semi")
    val ranked =
      if (top > 0) {
        val w = Window.partitionBy(col("v")).orderBy(col("score").desc, col("cand").asc)
        withEnough.withColumn("rn", row_number().over(w)).filter(col("rn") <= top)
      } else withEnough
    ranked.select(col("v").as("source"), col("cand").as("similar"),
      round(col("score"), 9).as("score"))
  }

  /** Top-similar map around a source (reference `JaccardSimilarTraverser:71`):
    * candidates = 2-hop vertices via (dir, label); score = jaccard of the
    * DISTINCT neighbor sets. Returns every candidate with score > 0 (no
    * top-N cap → no tie nondeterminism). */
  def jaccardSimilar(g: PropertyGraph, source: String, dir: Direction.Value,
                     label: String): DataFrame = {
    val adj = graft.core.Pin.pin(
      g.adjacency(dir, Seq(label)).select(col("src"), col("dst")).distinct())
    val srcN = adj.filter(col("src") === source).select(col("dst"))
    val cands = adj.join(srcN.withColumnRenamed("dst", "mid"),
        col("dst") === col("mid"), "inner")
      .select(col("src").as("cand")).filter(col("cand") =!= source).distinct()
    // |N(source) ∩ N(cand)| and |N(cand)| via one aggregation
    val inter = adj.join(cands.withColumnRenamed("cand", "src"), Seq("src"), "left_semi")
      .join(srcN.withColumnRenamed("dst", "d2"), col("dst") === col("d2"), "left_semi")
      .groupBy(col("src").as("cand")).agg(count(lit(1)).as("inter"))
    val candDeg = adj.join(cands.withColumnRenamed("cand", "src"), Seq("src"), "left_semi")
      .groupBy(col("src").as("cand")).agg(count(lit(1)).as("deg"))
    val srcDeg = srcN.count().toDouble
    inter.join(candDeg, Seq("cand"))
      .withColumn("similarity",
        col("inter").cast("double") /
          (col("deg").cast("double") + lit(srcDeg) - col("inter")))
      .filter(col("similarity") > 0)
      .select(col("cand").as("id"), round(col("similarity"), 9).as("similarity"))
  }

  /** NeighborRank over a layered step walk (reference
    * `NeighborRankTraverser.neighborRank:50`). Implemented for walks whose
    * steps move strictly forward between disjoint layers (the TPC-H star
    * projection shape) — there the reference's same-layer / prev-layer
    * transfer rules and per-path loop checks reduce exactly to:
    *   rank_i(t) = Σ_{edges v→t in step i} rank_{i-1}(v) · α / outEdges_i(v)
    * (path multiplicities cancel; see NeighborRankTraverser.java:104-140).
    * Returns (layer, id, rank) for every layer including the source layer. */
  def neighborRankLayered(g: PropertyGraph, source: String, alpha: Double,
                          steps: Seq[EdgeStep]): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    var layerRanks = Seq((0, source, 1.0)).toDF("layer", "id", "rank")
    var acc = layerRanks
    steps.zipWithIndex.foreach { case (st, i) =>
      val e = st.edgesFor(g).select(col("src"), col("dst"))
      val outCnt = e.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("oc"))
      val next = layerRanks.join(outCnt, Seq("id"))
        .select(col("id").as("src"), (col("rank") * alpha / col("oc")).as("c"))
        .join(e, Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("rank"))
        .withColumn("layer", lit(i + 1))
        .select(col("layer"), col("id"), col("rank"))
        .localCheckpoint(true)
      layerRanks = next
      acc = acc.unionByName(next)
    }
    acc.select(col("layer"), col("id"), round(col("rank"), 9).as("rank"))
  }
}
