package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TopK, VectorFunctions}
import graft.core.Num

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Brute force is the exactness baseline: broadcast the (small) query set,
  * score every candidate with the codegen'd [[VectorFunctions.CosineSimExpr]]
  * kernel, per-query top-k via the bounded-heap [[TopK]] aggregate. Cost is
  * |Q|·|C| — fine for small Q at any C because candidates stream through
  * executors with no shuffle except the final per-query top-k (k·|Q| heap
  * pairs, never a sort). As of round 10 NO dataflow in this family — scoring,
  * coarse-cell assignment, or PQ coding — uses a rank window.
  *
  * The scale path is SRP/LSH bucketing: candidates shuffle once on a
  * sign-random-projection bucket key; queries probe only their own bucket.
  * Recall < 1 by construction (the IVF/LSH trade) — same shape as a
  * multi-probe IVF index at 100 TB.
  */
object Ann {

  def registerKernels(df: DataFrame): Unit = {
    VectorFunctions.register(df.sparkSession)
    TopK.registerKernels(df)
  }

  /** Per-group top-k of a scored scan via the bounded-heap `top_k_by`
    * aggregate ([[graft.functions.TopK]]): ranks (`ordCol` DESC, `idCol`
    * ASC) — identical order and ties to the `row_number() OVER (PARTITION
    * BY group ORDER BY ord DESC, id ASC) <= k` window it replaces, but the
    * window SORTS every scored row of every group, while the aggregate
    * folds each task's rows into a ≤k-element heap and ships k·|groups|
    * (ord, id) pairs through the shuffle — the 100 TB shape. Output:
    * (groupCol, idCol, outOrd = zround6(ord), rank 1..k). */
  private def topKPerGroup(scored: DataFrame, groupCol: String, idCol: String,
                           ordCol: String, k: Int,
                           outOrd: String): DataFrame =
    scored.groupBy(col(groupCol))
      .agg(TopK.topKBy(col(ordCol), col(idCol), k).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")).as(Seq("__pos", "__t")))
      .select(col(groupCol), col("__t.payload").as(idCol),
        Num.zround6(col("__t.ord")).as(outOrd),
        (col("__pos") + 1).cast("long").as("rank"))

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = candidates.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** IVF (inverted-file) variant: candidates are partitioned into cells by
    * nearest centroid; a query probes only its `nProbe` closest cells. The
    * coarse quantizer here picks the `nCentroids` lowest-id candidate
    * vectors as centroids — deterministic, so the DuckDB oracle reproduces
    * cell assignment exactly; a production build swaps in k-means centroids
    * without touching the dataflow (assign = argmax-cosine either way).
    * At 100 TB the cell assignment is the partitioning key of the stored
    * index: a probe reads nProbe/nCentroids of the data. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    registerKernels(queries)
    val cands = candidates.select(col("vec_id"), col("embedding"))
    val centroids = cands.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .localCheckpoint(true)
    ivfProbe(queries, cands, centroids, k, nProbe)
  }

  /** Nearest `n` cells per vector under the given (small, broadcast)
    * centroid table; ties break on smallest cid. Argmax via the
    * bounded-heap [[TopK]] aggregate, ranked (csim DESC, cid ASC) — the
    * exact order of the `row_number` window it replaces, but the
    * vector×centroid stream (the WIDEST dataflow of the index build: it
    * touches every stored vector once per build/probe) folds into
    * ≤n-element heaps per vector instead of per-key sorting; the groupBy
    * rides the pinned vec_id partitioning, so no exchange either. Non-key
    * columns carry through as `first()` — exactly one row per id exists
    * before the centroid crossJoin, so `first` is deterministic.
    *
    * NULL-ord caveat (the [[TopK.registerKernels]] contract, restated at
    * this call site): a null/empty embedding cannot be ranked against the
    * centroids, so the row drops from the index instead of being assigned
    * cells (the row_number window this replaced ranked NULLS LAST, i.e.
    * assigned it arbitrary cells). An unindexable vector is the more
    * honest outcome — and the drop is OBSERVABLE: [[nullVectorDrops]]
    * counts these rows, [[buildIndex]]/[[saveIndex]] warn on stderr and
    * record the count in the artifact's info metadata. Callers ingesting
    * untrusted embeddings should null-filter upstream if they need every
    * id accounted for. */
  private def nearestCells(centroids: DataFrame)(df: DataFrame, idCol: String,
                                                 vecCol: String, n: Int): DataFrame = {
    // UNRANKABLE vectors drop here, observably (nullVectorDrops counts
    // them; buildIndex/saveIndex warn and record the count in artifact
    // info): a NULL vector has a NULL cosine against every centroid (empty
    // heap), and an EMPTY vector cosines 0.0 against every centroid — the
    // heap would hand it the smallest-cid cell, an ARBITRARY assignment
    // masquerading as a ranking. Both are unindexable; both drop.
    val rankable = df.filter(
      !(col(vecCol).isNull || size(col(vecCol)) === 0))
    val scored = rankable.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorFunctions.cosineSim(col(vecCol), col("ce")))
    val carry = df.columns.filter(_ != idCol).toSeq
    scored.groupBy(col(idCol))
      .agg(TopK.topKBy(col("csim"), col("cid"), n).as("__tk"),
        carry.map(c => first(col(c)).as(c)): _*)
      .select((col(idCol) +: carry.map(col)) :+
        explode(col("__tk").getField("payload")).as("cid"): _*)
  }

  /** The shared IVF probe dataflow: assign candidates to their cell, probe
    * each query's `nProbe` closest cells, exact-score only within probed
    * cells. `centroids` is any small (cid, ce) table — lowest-id seeds or
    * trained k-means means. */
  private def ivfProbe(queries: DataFrame, cands: DataFrame, centroids: DataFrame,
                       k: Int, nProbe: Int): DataFrame = {
    val cells = nearestCells(centroids) _
    val assigned = cells(cands, "vec_id", "embedding", 1) // cell per candidate
    val probes = cells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", nProbe)
    // The probe side is |Q|·nProbe rows; broadcast it so the candidate set —
    // the FULL index, pinned co-partitioned on vec_id — never shuffles on cid.
    // Without the hint Catalyst picks a SortMergeJoin whose Exchange moves
    // every candidate row per query batch: the wrong plan at 100 TB.
    val scored = assigned.join(broadcast(probes), Seq("cid")) // probe only matching cells
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** Spherical-k-means coarse quantizer: Lloyd's iterations with cosine
    * assignment and per-dimension mean update, seeded from the `nCentroids`
    * lowest-id candidates. Returns (cid, ce: array<double>).
    *
    * Determinism (the oracle contract): assignment ties break on smallest
    * cid; every updated centroid component is rounded to 6 decimals — the
    * cross-engine fp-stabilization that makes the UNORDERED per-cell mean
    * reproducible in DuckDB (a double sum over ~|cell| members differs by
    * ~1e-13 between engines' fold orders; rounding at 1e-6 absorbs it; the
    * per-pair cosine folds themselves are sequential and exact). Cells that
    * lose all members keep their previous centroid.
    *
    * Scale shape: assign = broadcast(k centroids) against the candidate
    * stream + per-vector top-1 window partitioned by vec_id — the big side
    * never shuffles; update = one aggregation keyed by (cid, dim), k·dims
    * groups. O(iters) passes over the data, O(iters) shuffles of k·dims
    * rows. */
  /** Candidate working set for iterative ANN consumers, pinned
    * co-partitioned on vec_id ONCE per session: the per-iteration/assignment
    * windows on vec_id then find their clustering already satisfied —
    * without this the full candidate set re-scans parquet AND re-shuffles
    * on every pass (PlanAudit loop-reshuffle). Pin dedups by plan, so the
    * trainer and the probe share one materialization. */
  private def pinnedCands(candidates: DataFrame): DataFrame =
    graft.core.Pin.pinDerived(
      candidates.select(col("vec_id"), col("embedding")).repartition(col("vec_id")))

  // Trained index artifacts — coarse quantizers and PQ codebooks — are
  // DERIVED working sets a deployment builds once and stores beside the
  // corpus (the pinDerived contract): memoized per (pinned candidate set,
  // hyperparams). pinnedCands dedups by plan and returns the SAME DataFrame
  // object for equal inputs, so reference keys are shared across queries —
  // q_ann_ivf_kmeans / q_ann_pq_topk / q_ann_ivfpq_topk train each artifact
  // once per session instead of once per query. Keys hold the DataFrame by
  // reference (GC-safe, the walksMemo note); cleared via Pin.clear.
  private val trainMemo = new java.util.concurrent.ConcurrentHashMap[
    (DataFrame, String, Seq[Int]), DataFrame]()

  graft.core.Pin.onClear(() => { trainMemo.clear(); nullDropMemo.clear() })

  // Observable null-vector drops (the nearestCells NULL-ord caveat above):
  // an index build over a corpus with null/empty embedding rows silently
  // loses them from the index (an UNindexable vector is the honest
  // outcome, but silent loss isn't) — count them once per pinned candidate
  // set, warn, and record the count in the saved artifact's info metadata.
  private val nullDropMemo =
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Long]()

  /** Rows of `candidates` that cannot be indexed (null or empty
    * `embedding`) and therefore DROP from every cell assignment; memoized
    * per pinned candidate set (one narrow count per corpus per session). */
  def nullVectorDrops(candidates: DataFrame): Long =
    nullDropMemo.computeIfAbsent(pinnedCands(candidates), cands =>
      cands.filter(col("embedding").isNull || size(col("embedding")) === 0)
        .count())

  private def warnNullDrops(candidates: DataFrame): Long = {
    val n = nullVectorDrops(candidates)
    if (n > 0) System.err.println(
      s"[ann] index build: $n candidate row(s) have null/empty embeddings " +
        "— they are NOT indexed (unrankable in every cell); null-filter " +
        "upstream if every id must be accounted for")
    n
  }

  /** Pre-build the trained ANN index artifacts for a candidate set — the
    * index-BUILD half of a deployment's load phase (`Bench.warmup`): trains
    * the coarse quantizer and the PQ reconstructions into [[trainMemo]] so
    * the first probing query pays a probe, not a training run. */
  def buildIndex(candidates: DataFrame, nCentroids: Int, iters: Int,
                 m: Int, ks: Int, dims: Int): Unit = {
    registerKernels(candidates)
    warnNullDrops(candidates)
    kmeansCentroids(candidates, nCentroids, iters)
    pqReconstruct(pinnedCands(candidates), m, ks, dims, iters)
    ()
  }

  /** Persist the trained ANN index — coarse k-means centroids + PQ
    * reconstructions — through [[graft.sources.GraphStore.saveArtifact]]
    * (trains first if this session hasn't; both builders are memoized, so
    * saving after a warmup re-trains nothing). A deployment runs this once
    * after its load phase; every later session calls [[loadIndex]] and
    * probes the stored index instead of retraining — at 100 TB the index
    * build is the dominant offline cost and must not recur per session. */
  def saveIndex(dir: String, candidates: DataFrame, nCentroids: Int,
                iters: Int, m: Int, ks: Int, dims: Int): Unit = {
    val store = graft.sources.GraphStore
    // training diagnostics ride the artifact as UNVERIFIED info metadata,
    // so a later session can audit what the stored index dropped
    val info = Map("null_vector_drops" -> warnNullDrops(candidates).toString)
    store.saveArtifact(kmeansCentroids(candidates, nCentroids, iters), dir,
      "ann_kmeans_centroids",
      kmeansParams(nCentroids, iters) + store.inputIdentity(candidates), info)
    store.saveArtifact(pqReconstruct(pinnedCands(candidates), m, ks, dims, iters),
      dir, "ann_pq_reconstructions",
      pqParams(m, ks, dims, iters) + store.inputIdentity(candidates), info)
  }

  /** Seed this session's trained-index memos from artifacts persisted by
    * [[saveIndex]]: after a successful load, `ivfKmeansTopK` / `pqTopK` /
    * `ivfPqTopK` / `cellAssignments` over the same candidate set PROBE the
    * stored index — no training jobs run. Returns false (and seeds
    * nothing) when either artifact is missing, so callers can fall back to
    * build-and-save. Bit-equal to the trained path: the stored rows ARE
    * the trained rows (rounded-6 doubles round-trip parquet exactly), and
    * the loaded frames are re-pinned in the same partitioning the builders
    * produce (centroids checkpointed tiny; reconstructions co-partitioned
    * on vec_id, the join key of every consumer). */
  def loadIndex(dir: String, candidates: DataFrame, nCentroids: Int,
                iters: Int, m: Int, ks: Int, dims: Int): Boolean = {
    registerKernels(candidates)
    val store = graft.sources.GraphStore
    val spark = candidates.sparkSession
    val cents = store.loadArtifact(spark, dir, "ann_kmeans_centroids",
      kmeansParams(nCentroids, iters) + store.inputIdentity(candidates))
    val recon = store.loadArtifact(spark, dir, "ann_pq_reconstructions",
      pqParams(m, ks, dims, iters) + store.inputIdentity(candidates))
    (cents, recon) match {
      case (Some(c), Some(r)) =>
        val cands = pinnedCands(candidates)
        trainMemo.computeIfAbsent((cands, "kmeans", Seq(nCentroids, iters)),
          _ => c.select(col("cid"), col("ce")).localCheckpoint(true))
        trainMemo.computeIfAbsent((cands, "pq", Seq(m, ks, dims, iters)),
          _ => graft.core.Pin.pinDerived(
            r.select(col("vec_id"), col("xhat")).repartition(col("vec_id"))))
        true
      case _ => false
    }
  }

  private def kmeansParams(nCentroids: Int, iters: Int) =
    Map("nCentroids" -> nCentroids.toString, "iters" -> iters.toString)
  private def pqParams(m: Int, ks: Int, dims: Int, iters: Int) =
    Map("m" -> m.toString, "ks" -> ks.toString, "dims" -> dims.toString,
      "iters" -> iters.toString)

  /** trained-artifact memo entry count (test hook) */
  private[graft] def trainMemoSize: Int = trainMemo.size

  def kmeansCentroids(candidates: DataFrame, nCentroids: Int, iters: Int): DataFrame = {
    registerKernels(candidates)
    val cands = pinnedCands(candidates)
    trainMemo.computeIfAbsent((cands, "kmeans", Seq(nCentroids, iters)),
      _ => kmeansTrain(cands, nCentroids, iters))
  }

  private def kmeansTrain(cands: DataFrame, nCentroids: Int, iters: Int): DataFrame = {
    var cents = cands.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("ce"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val members = nearestCells(cents)(cands, "vec_id", "embedding", 1)
      val means = members.select(col("cid"), posexplode(col("embedding")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("ce_new"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ce_new"), col("ce")).as("ce"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Trained-quantizer cell assignment `(vec_id, embedding, cid)` over the
    * pinned candidate set — the clustering half of semantic dedup
    * ([[Dedup.semanticNearDups]]) and any cluster-then-local-work pipeline.
    * Shares the memoized k-means artifacts and the pinned vec_id
    * partitioning with the IVF family: centroids broadcast, the data side
    * never shuffles. */
  def cellAssignments(candidates: DataFrame, nCentroids: Int, iters: Int): DataFrame = {
    registerKernels(candidates)
    nearestCells(kmeansCentroids(candidates, nCentroids, iters))(
      pinnedCands(candidates), "vec_id", "embedding", 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** IVF with a trained spherical-k-means quantizer — [[ivfTopK]]'s probe
    * dataflow over [[kmeansCentroids]] instead of lowest-id seeds. */
  def ivfKmeansTopK(queries: DataFrame, candidates: DataFrame,
                    k: Int, nCentroids: Int, nProbe: Int, iters: Int): DataFrame = {
    registerKernels(queries)
    // probe over the SAME pinned co-partitioned set the trainer iterated on
    ivfProbe(queries, pinnedCands(candidates),
      kmeansCentroids(candidates, nCentroids, iters), k, nProbe)
  }

  /** Product-quantization ANN (IVF-PQ's memory half): each vector is stored
    * as `m` byte-codes — per subspace of `dims/m` components, the id of its
    * nearest codebook centroid, the codebooks trained by the same
    * fp-stabilized Lloyd's as [[kmeansCentroids]] on the subvector slices.
    * Scoring is ADC via reconstruction: x̂ = the concatenation of the m
    * coded centroids, sim = cosine(q, x̂) in ONE sequential fold — the same
    * exact kernel as brute force, so the oracle reproduces ranks bit-for-bit
    * (an unordered per-subspace partial-sum would not).
    *
    * Scale shape: codebooks are m·ks tiny rows (broadcast); code assignment
    * and reconstruction join on the pinned vec_id-partitioned candidate set
    * (zero extra shuffles); the scan streams reconstructions through the
    * broadcast query set exactly like brute force — but the stored index is
    * m bytes per vector instead of 4·dims, the PQ memory trade that makes
    * 100 TB of embeddings fit an index tier. Compose with IVF cells to also
    * prune the scan (this operator isolates the PQ half). */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             m: Int, ks: Int, dims: Int, iters: Int): DataFrame = {
    registerKernels(queries)
    val recon = pqReconstruct(pinnedCands(candidates), m, ks, dims, iters)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = recon.crossJoin(broadcast(q))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("xhat")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** PQ reconstruction x̂ per candidate: per subspace of `dims/m`
    * components, train a ks-code codebook (fp-stabilized Lloyd's over the
    * subvector slices), code = nearest centroid, x̂ = concatenation of the
    * m coded centroids in subspace order. Input must already be pinned
    * co-partitioned on vec_id; every join below is vec_id-to-vec_id on that
    * partitioning (zero extra shuffles) or broadcast (tiny codebooks). */
  private def pqReconstruct(cands: DataFrame, m: Int, ks: Int,
                            dims: Int, iters: Int): DataFrame =
    trainMemo.computeIfAbsent((cands, "pq", Seq(m, ks, dims, iters)),
      _ => pqReconstructBuild(cands, m, ks, dims, iters))

  private def pqReconstructBuild(cands: DataFrame, m: Int, ks: Int,
                                 dims: Int, iters: Int): DataFrame = {
    require(dims % m == 0, s"dims must split into m subspaces ($dims % $m != 0)")
    val sub = dims / m
    // UNINDEXABLE rows — null/empty/wrong-dims embeddings, whose subvector
    // slices would be empty — DROP from the PQ build (the nearestCells
    // null-ord contract; buildIndex/saveIndex count and report them via
    // nullVectorDrops) instead of crashing the codebook argmax: an empty
    // slice yields a NULL cosine against every centroid, an empty top-k
    // heap, and getItem(0) of an empty array throws mid-build. PQ requires
    // exactly `dims` components, so the indexable set is size == dims.
    val indexable = cands.filter(size(col("embedding")) === dims)
    // All m codebooks train in ONE joint Lloyd's loop keyed by (s, cid) —
    // one pass over the candidate set per iteration instead of m separate
    // per-subspace trainers (identical numerics: same lowest-id seeds, same
    // smallest-cid tie-break, same 6-decimal mean stabilization). Every
    // window/groupBy below keys on vec_id first, so the whole build rides
    // the pinned vec_id partitioning without re-shuffling the data side.
    val subRows = indexable.select(col("vec_id"),
      posexplode(array((0 until m).map(s =>
        slice(col("embedding"), s * sub + 1, sub)): _*)))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("sv"))
    val seedIds = indexable.orderBy(col("vec_id").asc).limit(ks).select(col("vec_id"))
    var cents = subRows.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("s"), col("vec_id").as("cid"),
        transform(col("sv"), _.cast("double")).as("ce"))
      .localCheckpoint(true)
    // argmax per (vec_id, s) via the bounded-heap aggregate (k = 1) — the
    // same (csim DESC, cid ASC) order as the row_number window it replaces,
    // with no per-key sort of the subvector×codebook stream; the groupBy
    // clusters on a superset of the pinned vec_id partitioning, so no
    // exchange. ce re-attaches from the tiny broadcast codebook.
    def assign(books: DataFrame): DataFrame =
      subRows.join(broadcast(books), Seq("s"))
        .withColumn("csim", VectorFunctions.cosineSim(col("sv"), col("ce")))
        .groupBy(col("vec_id"), col("s"))
        .agg(TopK.topKBy(col("csim"), col("cid"), 1).as("__tk"),
          first(col("sv")).as("sv"))
        .select(col("vec_id"), col("s"), col("sv"),
          col("__tk").getItem(0).getField("payload").as("cid"))
        .join(broadcast(books), Seq("s", "cid"))
    for (_ <- 0 until iters) {
      val means = assign(cents)
        .select(col("s"), col("cid"), posexplode(col("sv")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("mn"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          x => x.getField("mn")).as("ce_new"))
      cents = cents.join(means, Seq("s", "cid"), "left")
        .select(col("s"), col("cid"), coalesce(col("ce_new"), col("ce")).as("ce"))
        .localCheckpoint(true)
    }
    assign(cents)
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("s"), col("ce")))),
        x => x.getField("ce"))).as("xhat"))
      // reconstructions are re-read by every consumer join — materialize the
      // built table once (index-build output, not a per-query intermediate)
      .localCheckpoint(true)
  }

  /** IVF × PQ — the composed 100 TB ANN index shape: the trained coarse
    * quantizer prunes the scan to nProbe/nCentroids of the cells, PQ codes
    * shrink the stored index to m bytes per vector. Candidates are assigned
    * to their coarse cell AND reconstructed through per-subspace codebooks;
    * a query exact-scores (ADC via reconstruction — same sequential cosine
    * fold as brute force, so the oracle reproduces ranks bit-for-bit) only
    * the reconstructions inside its probed cells.
    *
    * Scale shape: coarse centroids and codebooks broadcast; assignment,
    * coding, and the assignment⋈reconstruction join all ride the one pinned
    * vec_id partitioning; probes broadcast so the indexed side never
    * shuffles. Cf. Jégou et al., "Product Quantization for Nearest
    * Neighbor Search" (TPAMI 2011) — public literature; the reference
    * engine has no ANN surface. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                nCentroids: Int, nProbe: Int,
                m: Int, ks: Int, dims: Int, iters: Int): DataFrame = {
    registerKernels(queries)
    val cands = pinnedCands(candidates)
    val coarse = kmeansCentroids(candidates, nCentroids, iters)
    val assigned = nearestCells(coarse)(cands, "vec_id", "embedding", 1)
      .select(col("vec_id"), col("cid"))
    val recon = pqReconstruct(cands, m, ks, dims, iters)
    val probes = nearestCells(coarse)(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", nProbe)
    val scored = recon.join(assigned, Seq("vec_id"))
      .join(broadcast(probes), Seq("cid"))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("xhat")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** LSH-bucketed variant: neighbors are only searched within the query's
    * SRP bucket. Returns the same shape; recall trades against the crossJoin. */
  def srpBucketTopK(queries: DataFrame, candidates: DataFrame,
                    k: Int, bits: Int, dims: Int): DataFrame = {
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("bucket"))
    val c = candidates.select(col("vec_id"), col("embedding"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("bucket"))
    val scored = c.join(q, Seq("bucket")) // shuffle (or broadcast) on bucket key
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** Multi-probe SRP: each query also probes every bucket at Hamming
    * distance 1 from its own (`bits`+1 probes) — the standard multi-probe
    * LSH recall/cost dial: a near neighbor on the wrong side of ONE
    * hyperplane is recovered without adding tables. The query side (small)
    * explodes to its probe keys; candidates still sit in exactly one bucket,
    * so the only shuffle stays the bucket-key join and no (query, candidate)
    * pair can match twice. */
  def srpMultiProbeTopK(queries: DataFrame, candidates: DataFrame,
                        k: Int, bits: Int, dims: Int): DataFrame = {
    registerKernels(queries)
    val q0 = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("b0"))
    // own bucket + each single-bit flip
    val probes = array(
      col("b0") +: (1 to bits).map { i =>
        concat(substring(col("b0"), 1, i - 1),
          when(substring(col("b0"), i, 1) === "1", lit("0")).otherwise(lit("1")),
          substring(col("b0"), i + 1, bits))
      }: _*)
    val q = q0.select(col("query_id"), col("qe"), explode(probes).as("bucket"))
    val c = candidates.select(col("vec_id"), col("embedding"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    topKPerGroup(scored, "query_id", "vec_id", "sim", k, "sim")
  }

  /** Matryoshka-style two-stage retrieval (Kusupati et al., "Matryoshka
    * Representation Learning", 2022): stage 1 ranks ALL candidates by
    * cosine over only the first `coarseDims` dimensions — at 100 TB this
    * is the cheap pass, reading a `coarseDims/dims` prefix of the vector
    * column (a separate narrow column in a real store); stage 2 reranks
    * only the per-query top `rerankFrom` survivors with the full vector.
    * Exactly the modern embedding-store shape: prefix index in fast
    * storage, full vectors touched for a bounded candidate set.
    *
    * Returns the standard `(query_id, vec_id, sim, rank)` frame with sim =
    * FULL-dimension cosine; recall < 1 iff a true neighbor falls outside
    * the coarse top-`rerankFrom` (tune with [[recallAtK]]). */
  def matryoshkaTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     coarseDims: Int, rerankFrom: Int): DataFrame = {
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = candidates.select(col("vec_id"), col("embedding"))
    val coarse = c.crossJoin(broadcast(q))
      .withColumn("csim", VectorFunctions.cosineSim(
        slice(col("qe"), 1, coarseDims), slice(col("embedding"), 1, coarseDims)))
    // stage-1 cut keeps only (query_id, vec_id) — |Q|·rerankFrom ids; the
    // full vectors are refetched for just that bounded set (broadcast ⋈, the
    // candidate column store is touched once more but never shuffled)
    val survivors = topKPerGroup(coarse, "query_id", "vec_id", "csim",
        rerankFrom, "csim")
      .select(col("query_id"), col("vec_id"))
    val rerank = c.join(broadcast(survivors), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    topKPerGroup(rerank, "query_id", "vec_id", "sim", k, "sim")
  }

  /** Recall@k of an approximate top-k result against the exact baseline —
    * the standard ANN index-quality gauge (a 100 TB deployment tunes
    * nProbe/bits against exactly this curve on a sampled query set). Both
    * inputs are `(query_id, vec_id, sim, rank)` frames as produced by the
    * `*TopK` operators. Per query: `hits` = |approx ∩ exact| over the
    * first `k` ranks, `recall` = hits/k. The ground-truth side defines the
    * query universe, so a query whose approximate probe found nothing
    * still reports recall 0 rather than vanishing. Cost shape: both sides
    * are |Q|·k rows (the query SAMPLE is small by construction) — one
    * keyed semi-join + one groupBy, independent of corpus size. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
    val a = approx.filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
    val hits = e.join(a, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / k, 6).as("recall"))
  }

  /** Deterministic ±1 sign for the sparse random-projection matrix: parity
    * of the first md5 hex digit of "rp:i:j" — the seed-derived constant
    * both engines share (the Scala value is baked verbatim into the
    * oracle's SQL literals). */
  private[graft] def projSign(i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$i:$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `dOut` dimensions with a dense ±1 sign matrix (Achlioptas 2003,
    * "Database-friendly random projections"): yᵢ = Σⱼ sᵢⱼ·xⱼ / √dOut.
    * Pairwise distances/cosines are preserved within 1±ε for
    * dOut = O(log n / ε²) — the cheap dimensionality-reduction stage in
    * front of near-dup clustering or a coarse ANN pass.
    *
    * Scale shape: the sign matrix is a PLANNING-TIME constant (dOut·dims
    * literals folded into the projection expressions — nothing to
    * broadcast, nothing to train); the operator is a pure narrow map over
    * the embedding table, zero shuffles, fully codegen'd `aggregate` folds
    * in index order (fp-identical to the oracle's ordered sums). Output is
    * long-form `(id, dim, v)` so the driver's comparator never sees an
    * array column. */
  def randomProjection(embeddings: DataFrame, idCol: String, vecCol: String,
                       dOut: Int, dims: Int): DataFrame = {
    val outs = (0 until dOut).map { i =>
      val signs = Array.tabulate(dims)(j => projSign(i, j))
      aggregate(
        zip_with(col(vecCol), typedLit(signs), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v) / math.sqrt(dOut.toDouble)
    }
    embeddings
      .select(col(idCol), posexplode(array(outs: _*)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        round(col("v"), 6).as("v"))
  }

  /** Per-dimension z-score standardization of an embedding column — the
    * feature-scaling pass before distance-based training work (k-means,
    * PQ codebooks, linear probes all assume comparable dimension scales).
    * Long-form output `(id, dim, z)` with dim 1-based — the
    * [[randomProjection]] output contract. Values are quantized to 6
    * decimals up front so the dimension sums are EXACT decimal arithmetic
    * (the q_event_zscore contract) — mean/stddev and every z are
    * bit-identical across engines instead of depending on the engine's
    * fp accumulation order.
    *
    * Scale shape: one dim-keyed aggregation (`dims` groups — map-side
    * combined, bounded by the embedding width, never by N) whose tiny
    * result BROADCASTS back against the exploded vector stream; everything
    * else is narrow. */
  def standardize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = embeddings.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col(idCol), (col("i") + 1).cast("long").as("dim"),
        round(col("v").cast("double"), 6).cast("decimal(18,6)").as("v"))
    val stats = e.groupBy(col("dim")).agg(
      count(lit(1)).as("n"),
      sum(col("v")).cast("double").as("sv"),
      sum(col("v") * col("v")).cast("double").as("ssv"))
    val z = (col("v") - col("sv") / col("n")) /
      sqrt((col("ssv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
    e.join(broadcast(stats), Seq("dim"))
      .select(col(idCol), col("dim"), Num.zround6(z).as("z"))
  }

  /** k-nearest-neighbor graph over the trained coarse-quantizer cells:
    * exact cosine top-k per vector AMONG ITS CELL — the
    * cluster-then-local-work recipe (same cell structure as SemDeDup /
    * IVF) that turns the quadratic kNN-graph build into per-cell work.
    * Edges to neighbors in other cells are sacrificed — the standard
    * recall trade every clustered kNN-graph constructor makes.
    *
    * Scale shape: the quadratic term is confined to single cells (|cell| ≈
    * N/k); centroids ride the memoized session artifacts
    * ([[kmeansCentroids]] — trained once in the load phase); the pair
    * stream shuffles once on cid and once on src_id for the per-source
    * top-k window (partitioned — no global sort). */
  def knnGraph(candidates: DataFrame, nClusters: Int, iters: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerKernels(candidates)
    val assigned = cellAssignments(candidates, nClusters, iters)
    val a = assigned.select(col("cid"), col("vec_id").as("src_id"), col("embedding").as("ea"))
    val b = assigned.select(col("cid"), col("vec_id").as("dst_id"), col("embedding").as("eb"))
    val scored = a.join(b, Seq("cid"))
      .filter(col("src_id") =!= col("dst_id"))
      .withColumn("sim", graft.functions.VectorFunctions.cosineSim(col("ea"), col("eb")))
    topKPerGroup(scored, "src_id", "dst_id", "sim", k, "sim")
      .select(col("src_id"), col("dst_id"), col("sim"), col("rank"))
  }

  /** kNN-distance outlier / prototypicality score: mean cosine distance to
    * a vector's k nearest neighbors (within its trained cell — the
    * [[knnGraph]] recall trade). Low = dense prototypical region, high =
    * isolated outlier — the standard density signal for pruning mislabeled
    * or off-distribution samples before training (kNN variant of the
    * SemDeDup centroid-distance family).
    *
    * Determinism: neighbor sims are rounded-6 by [[knnGraph]]; the mean
    * accumulates them as DECIMAL(18,6) (order-independent, exact) and the
    * single double division is the only fp site — bit-equal cross-engine.
    *
    * Scale shape: [[knnGraph]]'s per-cell work + one (vec_id) aggregation
    * over the k·N edge stream. */
  def knnOutlierScores(candidates: DataFrame, nClusters: Int, iters: Int,
                       k: Int): DataFrame =
    knnGraph(candidates, nClusters, iters, k)
      .groupBy(col("src_id").as("vec_id"))
      .agg(count(lit(1)).cast("long").as("n_nbrs"),
        Num.zround6(lit(1.0) - sum(col("sim").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("outlier"))

  /** Hard-negative mining for contrastive retriever training (the
    * DPR / Contriever recipe, Karpukhin et al. 2020): for each query, the
    * `k` most similar candidates that are NOT among its labeled positives —
    * semantically confusable yet wrong, the negatives that sharpen an
    * embedding model far more than random ones. `positives` is a
    * (query_id, vec_id) pair table; a query's own id is excluded
    * implicitly when present there.
    *
    * Determinism: sims rounded-6 BEFORE ranking, ties on vec_id asc — the
    * [[bruteForceTopK]] discipline.
    *
    * Scale shape: queries (the mining batch) and the positive-pair table
    * both broadcast — training batches are tiny against a 100 TB corpus;
    * the candidate side is one narrow scan scored in codegen, the
    * anti-join never shuffles it, and the per-query cut is a partitioned
    * rank window. For corpus-scale mining swap the scored scan for the
    * trained-cell probe ([[ivfTopK]] / [[ivfKmeansTopK]]) — same
    * downstream anti-join + window. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
                    positives: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = candidates.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        Num.zround6(VectorFunctions.cosineSim(col("qe"), col("embedding"))).as("sim"))
    val negs = scored.join(
      broadcast(positives.select(col("query_id"), col("vec_id"))),
      Seq("query_id", "vec_id"), "left_anti")
    // ranks by the already-rounded sim (the oracle contract); zround6 of a
    // rounded value is the identity, so the pair survives the heap exactly
    topKPerGroup(negs, "query_id", "vec_id", "sim", k, "sim")
  }

  /** MMR diversified top-k (Carbonell & Goldstein, SIGIR 1998): greedily
    * select `k` of each query's `poolSize` most relevant candidates,
    * scoring each next pick by λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — the
    * classic redundancy penalty that keeps a retrieved set (or a
    * training-mix exemplar set) from collapsing onto near-duplicates.
    * Requires k ≤ poolSize. Returns (query_id, vec_id, rel, rank) with
    * rank = selection order.
    *
    * Determinism: rel and pair sims are rounded-6 BEFORE every cut (pool,
    * argmax), mmr is rounded-6, ties break on vec_id asc — both engines
    * rank identical values.
    *
    * Scale shape: ONE scored candidate scan builds the pool (broadcast
    * query batch, partitioned rank window — swap in the trained-cell probe
    * for corpus-scale pools); every greedy round then touches only the
    * checkpointed |Q|·poolSize pool — a bounded anti-join + pair-sim
    * aggregation + partitioned argmax window per round, k−1 tiny-table
    * rounds total, nothing corpus-sized inside the loop. */
  def mmrTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              lambda: Double, poolSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k <= poolSize, s"k=$k must be <= poolSize=$poolSize")
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wq = Window.partitionBy(col("query_id"))
    val scored = candidates.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        Num.zround6(VectorFunctions.cosineSim(col("qe"), col("embedding"))).as("rel"),
        col("embedding").as("ce"))
    // pool cut via the bounded-heap aggregate on the ROUNDED rel (the
    // oracle contract): k·|Q| pairs cross the wire instead of a per-query
    // sort of the full scored scan; ce is refetched for the tiny pool only
    val poolIds = topKPerGroup(scored, "query_id", "vec_id", "rel",
        poolSize, "rel")
      .drop("rank")
    val pool = candidates.select(col("vec_id"), col("embedding").as("ce"))
      .join(broadcast(poolIds), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("rel"), col("ce"))
      .localCheckpoint(true)
    var selected = pool
      .withColumn("rn", row_number().over(
        wq.orderBy(col("rel").desc, col("vec_id").asc)))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("rank", lit(1L))
      .localCheckpoint(true)
    for (r <- 2 to k) {
      val rest = pool.join(selected.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
      val msim = rest.select(col("query_id"), col("vec_id"), col("ce"))
        .join(selected.select(col("query_id"), col("ce").as("se")), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(VectorFunctions.cosineSim(col("ce"), col("se")), 6).as("sim"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(max(col("sim")).as("maxsim"))
      val pick = rest.join(msim, Seq("query_id", "vec_id"))
        .withColumn("mmr", round(
          lit(lambda) * col("rel") - lit(1 - lambda) * col("maxsim"), 6))
        .withColumn("rn", row_number().over(
          wq.orderBy(col("mmr").desc, col("vec_id").asc)))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("vec_id"), col("rel"), col("ce"),
          lit(r.toLong).as("rank"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected.select(col("query_id"), col("vec_id"), col("rel"), col("rank"))
  }
}
