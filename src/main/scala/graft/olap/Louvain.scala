package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Louvain-style modularity community detection (reference
  * `comm/LouvainAlgorithm.java:52` + `LouvainTraverser.java` — SURVEY's
  * hardest OLAP item).
  *
  * Deterministic synchronous variant: every local-move round evaluates ALL
  * vertices at once (one join+groupBy dataflow), each vertex picks the
  * neighbor community with the best modularity gain
  * ΔQ ∝ w(v→C) − k_v·Σtot(C\v)/(2m), ties broken by smallest community id.
  * After `localRounds` rounds the graph is coarsened (communities become
  * vertices, parallel edges sum their weights) and the process repeats.
  * The reference iterates vertices sequentially with arbitrary order —
  * results there depend on iteration order; the synchronous variant is
  * reproducible, which the correctness gate requires.
  */
object Louvain {

  /** Modularity Q of an assignment over the ORIGINAL canonical edge set:
    * Q = W_int/m − Σ_C (tot_C / 2m)², unit edge weights (reference
    * `LouvainTraverser.modularity`; the `show_modularity` reporting knob of
    * `comm/LouvainAlgorithm.java:52`). */
  def modularity(assignment: DataFrame, undirectedEdges: DataFrame): Double = {
    val e = undirectedEdges.select(col("src"), col("dst"), lit(1.0).as("w"))
    val mRow = e.agg(sum(col("w"))).head()
    if (mRow.isNullAt(0) || mRow.getDouble(0) == 0.0) return 0.0
    val m = mRow.getDouble(0)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val k = sym.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
    val totSq = assignment.join(k, Seq("id"))
      .groupBy(col("community")).agg(sum(col("k")).as("tot"))
      .agg(sum(col("tot") * col("tot"))).head().getDouble(0)
    val internal = e
      .join(assignment.select(col("id").as("src"), col("community").as("cs")), Seq("src"))
      .join(assignment.select(col("id").as("dst"), col("community").as("cd")), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .agg(coalesce(sum(col("w")), lit(0.0))).head().getDouble(0)
    internal / m - totSq / (4.0 * m * m)
  }

  /** @param undirectedEdges (src, dst) — canonical, no self loops
    * @return (id, community) */
  def louvain(verts: DataFrame, undirectedEdges: DataFrame,
              localRounds: Int = 4, passes: Int = 2): DataFrame =
    louvainWithModularity(verts, undirectedEdges, localRounds, passes,
      showModularity = false)._1

  /** [[louvain]] plus the per-pass modularity trace of the reference's
    * `show_modularity` option — one Q evaluation of the composed mapping
    * against the ORIGINAL graph after each pass (only when requested: the
    * trace costs three extra aggregations per pass). */
  def louvainWithModularity(verts: DataFrame, undirectedEdges: DataFrame,
                            localRounds: Int = 4, passes: Int = 2,
                            showModularity: Boolean = true): (DataFrame, Seq[Double]) = {
    val trace = scala.collection.mutable.ArrayBuffer[Double]()
    var mapping = verts.select(col("id"), col("id").as("community"))
    var curVerts = verts.select(col("id"))
    var curEdges = graft.core.Pin.pin(
      undirectedEdges.select(col("src"), col("dst"), lit(1.0).as("w")))

    for (_ <- 0 until passes) {
      val comm = localMoves(curVerts, curEdges, localRounds)
      // compose the global mapping through this pass's assignment
      mapping = mapping.withColumnRenamed("community", "mid")
        .join(comm.withColumnRenamed("id", "mid"), Seq("mid"))
        .select(col("id"), col("community"))
        .localCheckpoint(true)
      // coarsen: communities → vertices, aggregate edge weights. Self-loops
      // are KEPT — they carry the community's internal weight; dropping them
      // would zero supernode degrees and make any cross-community merge look
      // like a modularity gain.
      curEdges = curEdges
        .join(comm.withColumnRenamed("id", "src").withColumnRenamed("community", "cs"), Seq("src"))
        .join(comm.withColumnRenamed("id", "dst").withColumnRenamed("community", "cd"), Seq("dst"))
        .select(least(col("cs"), col("cd")).as("src"),
          greatest(col("cs"), col("cd")).as("dst"), col("w"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
        .localCheckpoint(true)
      curVerts = comm.select(col("community").as("id")).distinct().localCheckpoint(true)
      if (showModularity) trace += modularity(mapping, undirectedEdges)
    }
    (mapping, trace.toSeq)
  }

  private def localMoves(verts: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    // Zero-weight self-loops guarantee every vertex sees its OWN community as
    // a candidate even with no intra-community edge — replacing a separate
    // "stay" union branch (which doubled the per-round join work). Adding
    // w=0.0 to any double sum is bit-exact, so w_vc/k/tot are unchanged.
    val adj = edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .union(verts.select(col("id").as("src"), col("id").as("dst"), lit(0.0).as("w")))
      .repartition(col("dst")).localCheckpoint(true)
    val m2 = {
      val t = edges.agg(sum(col("w"))).head()
      2.0 * (if (t.isNullAt(0)) 0.0 else t.getDouble(0))
    }
    if (m2 == 0.0) return verts.select(col("id"), col("id").as("community"))
    val k = adj.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .localCheckpoint(true)

    var comm = verts.select(col("id"), col("id").as("community"))
    for (r <- 0 until rounds) {
      // one (id, community, k) table per round feeds BOTH the community
      // totals and the per-id gain inputs — folding the former separate
      // `own` and `k` joins into a single join per round
      val idInfo = comm.join(k, Seq("id")).localCheckpoint(false)
      val commTot = idInfo.groupBy(col("community")).agg(sum(col("k")).as("tot"))
      // weight from v to each neighbouring community (self-loop ⇒ the own
      // community is always present, possibly with w_vc = 0)
      val vToComm = adj
        .join(comm.withColumnRenamed("id", "dst").withColumnRenamed("community", "nc"), Seq("dst"))
        .groupBy(col("src").as("id"), col("nc")).agg(sum(col("w")).as("w_vc"))
      // join tot while still partitioned by nc, THEN align to id — the final
      // groupBy(id) then needs no extra exchange
      val gains = vToComm
        .join(commTot.withColumnRenamed("community", "nc"), Seq("nc"))
        .join(idInfo.withColumnRenamed("community", "oc"), Seq("id"))
        .withColumn("tot_excl",
          when(col("nc") === col("oc"), col("tot") - col("k")).otherwise(col("tot")))
        .withColumn("gain", col("w_vc") - col("k") * col("tot_excl") / m2)
      // Directional gating breaks synchronous-swap oscillation: even rounds
      // only allow moves to a SMALLER community id, odd rounds to a larger
      // one. The relation is antisymmetric, so two vertices can never trade
      // communities in the same round. Staying is always allowed.
      val gated = gains.select(col("id"), col("nc"), col("gain"), col("oc"))
        .filter(col("nc") === col("oc") ||
          (if (r % 2 == 0) col("nc") < col("oc") else col("nc") > col("oc")))
      comm = gated
        .groupBy(col("id"))
        .agg(min(struct((col("gain") * -1).as("ng"), col("nc"))).as("best"))
        .select(col("id"), col("best.nc").as("community"))
        .localCheckpoint(true)
    }
    comm
  }
}
