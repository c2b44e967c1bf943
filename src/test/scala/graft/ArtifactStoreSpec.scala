package graft

import graft.core.Pin
import graft.sources.GraphStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Persisted trained artifacts: a cold session (Pin.clear simulates the
  * restart — every memo and materialization is gone) LOADS the stored
  * index and probes it, bit-equal to the session that trained it. */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-artifacts").toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("generic saveArtifact/loadArtifact: self-describing, params separate, missing is None") {
    val dir = tmp()
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    GraphStore.saveArtifact(df, dir, "demo", Map("p" -> "1"))
    val back = GraphStore.loadArtifact(spark, dir, "demo", Map("p" -> "1"))
    assert(back.isDefined)
    assert(sortedRows(back.get) === sortedRows(df))
    // different params never collide; unknown kinds are None
    assert(GraphStore.loadArtifact(spark, dir, "demo", Map("p" -> "2")).isEmpty)
    assert(GraphStore.loadArtifact(spark, dir, "nope", Map("p" -> "1")).isEmpty)
  }

  /** replicate artifactPath's 6-byte params hash (a stable public layout
    * behavior worth pinning) */
  private def slotHash(params: Map[String, String]): String = {
    val canon = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(" ")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths, Path}
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { (p: Path) =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  test("crash-safety: half-written/collided slots decline; foreign kind is loud") {
    val dir = tmp()
    val df = Seq((1L, 2.0)).toDF("k", "v")
    GraphStore.saveArtifact(df, dir, "demo", Map("p" -> "1"))
    val h1 = slotHash(Map("p" -> "1"))

    // half-written: meta dir exists but holds no committed JSON → None
    // (pre-fix this was a require crash that permanently aborted loadOrTrain)
    val half = s"$dir/artifacts/demo/$h1/meta"
    import java.nio.file.{Files, Paths}
    Files.walk(Paths.get(half)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    Files.createDirectories(Paths.get(half))
    assert(GraphStore.loadArtifact(spark, dir, "demo", Map("p" -> "1")).isEmpty)
    // ...and the build-and-save path repairs the slot
    GraphStore.saveArtifact(df, dir, "demo", Map("p" -> "1"))
    assert(GraphStore.loadArtifact(spark, dir, "demo", Map("p" -> "1")).isDefined)

    // truncated-hash collision: the slot for q=9 holds p=1's artifact
    // (simulated by copying the slot) → decline + retrain, never wrong data
    val h2 = slotHash(Map("q" -> "9"))
    copyDir(s"$dir/artifacts/demo/$h1", s"$dir/artifacts/demo/$h2")
    assert(GraphStore.loadArtifact(spark, dir, "demo", Map("q" -> "9")).isEmpty)

    // kind mismatch at the path = a foreign/hand-moved directory → loud
    copyDir(s"$dir/artifacts/demo/$h1", s"$dir/artifacts/other/$h1")
    intercept[Exception](
      GraphStore.loadArtifact(spark, dir, "other", Map("p" -> "1")))
  }

  test("info metadata, listing and GC") {
    val dir = tmp()
    val df = Seq((1L, 2.0)).toDF("k", "v")
    GraphStore.saveArtifact(df, dir, "demo", Map("p" -> "1"),
      info = Map("null_vector_drops" -> "3", "note" -> "a \"quoted\" one"))
    GraphStore.saveArtifact(df, dir, "demo2", Map("x" -> "a,b"))
    // info round-trips (incl. escaping) and is NOT part of the identity check
    assert(GraphStore.artifactInfo(spark, dir, "demo", Map("p" -> "1")) ===
      Map("null_vector_drops" -> "3", "note" -> "a \"quoted\" one"))
    assert(GraphStore.loadArtifact(spark, dir, "demo", Map("p" -> "1")).isDefined)
    assert(GraphStore.artifactInfo(spark, dir, "demo2", Map("x" -> "a,b")).isEmpty)

    // a half-written slot (data, no meta) lists as incomplete
    val orphan = s"$dir/artifacts/demo/deadbeef0000"
    df.write.parquet(s"$orphan/data")
    val listed = GraphStore.listArtifacts(spark, dir)
    assert(listed.length === 3)
    val byPath = listed.map(a => a.path.stripPrefix("file:") -> a).toMap
    assert(byPath.values.count(_.complete) === 2)
    assert(listed.filter(_.complete).forall(_.dataBytes > 0))
    assert(listed.find(_.kind == "demo2").get.params === Map("x" -> "a,b"))

    // GC: young + complete survive; the orphan is reaped immediately
    val now = System.currentTimeMillis()
    val reaped = GraphStore.gcArtifacts(spark, dir, olderThanMillis = 3600000L,
      nowMillis = now)
    assert(reaped.length === 1 && reaped.head.contains("deadbeef0000"))
    assert(GraphStore.listArtifacts(spark, dir).length === 2)
    // age-based: everything is older than -1ms → all reaped
    assert(GraphStore.gcArtifacts(spark, dir, -1L, now).length === 2)
    assert(GraphStore.listArtifacts(spark, dir).isEmpty)
  }

  test("keyOfList is collision-free for separator-bearing elements") {
    assert(GraphStore.keyOfList(Seq("a,b")) !== GraphStore.keyOfList(Seq("a", "b")))
    assert(GraphStore.keyOfList(Seq("a;b", "c")) !==
      GraphStore.keyOfList(Seq("a", "b;c")))
    assert(GraphStore.keyOfList(Seq("1:a", "b")) !==
      GraphStore.keyOfList(Seq("1:a;1:b")))
    assert(GraphStore.keyOfList(Nil) === "")
  }

  test("ANN index: cold session loads IVF centroids + PQ reconstructions, probe is bit-equal to trained") {
    val dir = tmp()
    // deterministic embeddings, dims=8 split into m=2 subspaces
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 31 + j * 17) % 97) / 97.0f) + 0.01f)
    val cands = (1L to 20L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val queries = (101L to 104L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    def probe() = graft.ops.Ann.ivfPqTopK(queries, cands, k = 3,
      nCentroids = 4, nProbe = 2, m = 2, ks = 4, dims = 8, iters = 2)

    val trained = sortedRows(probe())
    assert(trained.nonEmpty)
    graft.ops.Ann.saveIndex(dir, cands, nCentroids = 4, iters = 2,
      m = 2, ks = 4, dims = 8)

    Pin.clear() // the cold session: every memo and pinned view is gone
    assert(graft.ops.Ann.trainMemoSize === 0)
    assert(graft.ops.Ann.loadIndex(dir, cands, nCentroids = 4, iters = 2,
      m = 2, ks = 4, dims = 8))
    assert(graft.ops.Ann.trainMemoSize === 2) // both artifacts seeded
    val loaded = sortedRows(probe())
    assert(loaded === trained) // bit-equal: stored rows ARE the trained rows
    // the probe hit the seeded memos — nothing retrained
    assert(graft.ops.Ann.trainMemoSize === 2)
    // a dir that was never saved to loads nothing
    Pin.clear()
    assert(!graft.ops.Ann.loadIndex(tmp(), cands, 4, 2, 2, 4, 8))
    assert(graft.ops.Ann.trainMemoSize === 0)
    Pin.clear()
  }

  test("landmark indexes: cold session loads the stored waves, distance probes bit-equal") {
    val dir = tmp()
    val edges = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.5),
        ("a", "d", 9.0), ("d", "e", 0.5))
      .toDF("src", "dst", "w")
    val wadj = edges.union(
      edges.select(col("dst"), col("src"), col("w"))) // symmetric view
    val adj = wadj.select(col("src"), col("dst"))
    val pairs = Seq(("a", "e"), ("b", "d")).toDF("a", "b")

    def probeW() = graft.olap.Algorithms.weightedLandmarkDistances(
      pairs, Seq("c"), wadj, rounds = 4)
    def probeU() = graft.olap.Algorithms.landmarkDistances(
      pairs, Seq("c"), adj, maxDepth = 4)

    val (trainedW, trainedU) = (sortedRows(probeW()), sortedRows(probeU()))
    assert(trainedW.nonEmpty && trainedU.nonEmpty)
    graft.olap.Algorithms.saveWeightedLandmarkIndex(dir, Seq("c"), wadj, 4)
    graft.olap.Algorithms.saveLandmarkIndex(dir, Seq("c"), adj, 4)

    Pin.clear()
    assert(graft.olap.Algorithms.landmarkMemoSizes === ((0, 0)))
    assert(graft.olap.Algorithms.loadWeightedLandmarkIndex(dir, Seq("c"), wadj, 4))
    assert(graft.olap.Algorithms.loadLandmarkIndex(dir, Seq("c"), adj, 4))
    assert(graft.olap.Algorithms.landmarkMemoSizes === ((1, 1)))
    assert(sortedRows(probeW()) === trainedW)
    assert(sortedRows(probeU()) === trainedU)
    assert(graft.olap.Algorithms.landmarkMemoSizes === ((1, 1))) // probes, no rebuilds
    Pin.clear()
  }

  test("the registered queries themselves: q_ann_ivfpq_topk / q_landmark_weighted loaded-vs-trained bit-equal at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val dir = tmp()
    Pin.clear()
    def runQ(name: String): Seq[Row] =
      sortedRows(SparkEntry.queries(name)(spark, sf))

    val trainedAnn = runQ("q_ann_ivfpq_topk")
    val trainedLw = runQ("q_landmark_weighted")
    assert(trainedAnn.nonEmpty && trainedLw.nonEmpty)
    // persist with the exact hyper-params the registered queries use
    val cands = graft.core.Tables.embeddings(spark, sf).filter(col("vec_id") >= 5)
    graft.ops.Ann.saveIndex(dir, cands, nCentroids = 8, iters = 2,
      m = 4, ks = 8, dims = 64)
    val wadj = graft.traverse.PathTraversals.weightedEdgeView(
      graft.core.TpchGraph.cached(spark, sf), graft.core.Direction.BOTH,
      Nil, "quantity")
    graft.olap.Algorithms.saveWeightedLandmarkIndex(dir,
      Seq("nation:1", "nation:7", "nation:13"), wadj, 4)

    Pin.clear() // cold session
    assert(graft.ops.Ann.loadIndex(dir,
      graft.core.Tables.embeddings(spark, sf).filter(col("vec_id") >= 5),
      nCentroids = 8, iters = 2, m = 4, ks = 8, dims = 64))
    assert(graft.olap.Algorithms.loadWeightedLandmarkIndex(dir,
      Seq("nation:1", "nation:7", "nation:13"),
      graft.traverse.PathTraversals.weightedEdgeView(
        graft.core.TpchGraph.cached(spark, sf), graft.core.Direction.BOTH,
        Nil, "quantity"), 4))
    assert(runQ("q_ann_ivfpq_topk") === trainedAnn)
    assert(runQ("q_landmark_weighted") === trainedLw)
    // the probes hit the seeded memos — no index rebuilt
    assert(graft.ops.Ann.trainMemoSize === 2)
    assert(graft.olap.Algorithms.landmarkMemoSizes._2 === 1)
    Pin.clear()
  }

  test("walk corpus: cold session loads the stored walks, consumers (incl. q_guided_walks) bit-equal") {
    val sf = "/root/testdata/sf0.001"
    val dir = tmp()
    Pin.clear()
    def runQ() = sortedRows(SparkEntry.queries("q_guided_walks")(spark, sf))
    val built = runQ()
    assert(built.nonEmpty)
    val g = graft.core.TpchGraph.cached(spark, sf)
    val sources = (1 to 50).map(i => s"customer:$i")
    graft.traverse.PathTraversals.saveWalks(dir, g, sources, 4,
      graft.core.Direction.OUT)
    Pin.clear()
    assert(graft.traverse.PathTraversals.loadWalks(dir,
      graft.core.TpchGraph.cached(spark, sf), sources, 4,
      graft.core.Direction.OUT))
    assert(runQ() === built)
    // different params (steps) = a different artifact
    Pin.clear()
    assert(!graft.traverse.PathTraversals.loadWalks(dir,
      graft.core.TpchGraph.cached(spark, sf), sources, 5,
      graft.core.Direction.OUT))
    Pin.clear()
  }

  test("minhash signatures: cold session loads the stored table, every LSH consumer bit-equal") {
    val dir = tmp()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a completely different document about spark engines"),
      (4L, "a completely different document about spark engines here"))
      .toDF("doc_id", "text")
    def pairs() = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text",
      ngram = 2, k = 12, bands = 6, rows = 2, threshold = 0.5)
    val built = sortedRows(pairs())
    assert(built.nonEmpty)
    graft.ops.Dedup.saveSignatures(dir, docs, "doc_id", "text", 2, 12, 6, 2)
    Pin.clear()
    assert(graft.ops.Dedup.sigMemoSize === 0)
    assert(graft.ops.Dedup.loadSignatures(dir, docs, "doc_id", "text", 2, 12, 6, 2))
    assert(graft.ops.Dedup.sigMemoSize === 1)
    assert(sortedRows(pairs()) === built)
    assert(graft.ops.Dedup.sigMemoSize === 1) // consumer read the load, no rebuild
    // different params = a different artifact; absent → declined
    Pin.clear()
    assert(!graft.ops.Dedup.loadSignatures(dir, docs, "doc_id", "text", 3, 12, 6, 2))
    // DATASET identity: an artifact trained on one corpus never loads for
    // another (same hyper-params, different input plan → different key)
    val other = Seq((9L, "some other corpus entirely")).toDF("doc_id", "text")
    assert(!graft.ops.Dedup.loadSignatures(dir, other, "doc_id", "text", 2, 12, 6, 2))
    Pin.clear()
  }

  test("classifier: cold session loads weights + scored table, both bit-equal to trained") {
    val dir = tmp()
    val docs = (1L to 30L).map(i =>
        (i, s"token$i common words here ${"quality " * (i % 3).toInt}"))
      .toDF("doc_id", "text")
    val label = (col("doc_id") % 2 === 0).cast("int")
    def weights() = graft.ops.Corpus.trainedWeights(
      docs, "doc_id", "text", label, dims = 16, rounds = 2)
    def scored() = graft.ops.Corpus.trainQualityClassifier(
      docs, "doc_id", "text", label, dims = 16, rounds = 2)

    val trainedScores = sortedRows(scored())
    val trainedW = weights().toSeq
    assert(trainedW.length === 16)
    graft.ops.Corpus.saveClassifier(dir, docs, "doc_id", "text", label, 16, 2)

    Pin.clear()
    assert(graft.ops.Corpus.loadClassifier(dir, docs, "doc_id", "text", label, 16, 2))
    assert(weights().toSeq === trainedW)
    assert(sortedRows(scored()) === trainedScores)
    // missing artifacts: load declines, nothing seeded
    Pin.clear()
    assert(!graft.ops.Corpus.loadClassifier(tmp(), docs, "doc_id", "text", label, 16, 2))
    Pin.clear()
  }
}
