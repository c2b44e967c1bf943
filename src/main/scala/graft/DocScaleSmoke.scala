package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-cliff smoke for the TRAINING-DATA pipeline (dev-only; the graph
  * twin is [[ScaleSmoke]]): replicate sf0.1 `documents`/`embeddings` into N
  * disjoint copies and time the heaviest doc operators on 1× vs N×.
  *
  * Replication SUFFIXES a per-copy marker onto every token (`a b` →
  * `ac7 bc7`), which makes the copies DISJOINT in word-n-gram space while
  * preserving token counts and the within-copy shingle structure exactly: a
  * verbatim clone would be a near-duplicate of its 9 siblings and the
  * pair/cluster OUTPUT would grow quadratically in copies — a different
  * (output-bound) experiment than the scale question "does per-doc cost
  * stay flat as the corpus grows". (An earlier draft INTERLEAVED a marker
  * token instead — `a c7 b` — which manufactures `c7 X c7` shingles that
  * behave like unigrams shared across all docs containing X; pairwise
  * jaccard exploded and LSH produced 1.3M candidates from 5k docs. The
  * smoke itself caught it.) The 1× corpus is the same transform applied to
  * copy 0, so both sides pay identical per-doc costs. Expected: every
  * operator ≲ linear in copies (narrow maps + band/bucket-keyed joins +
  * broadcast semi-joins); super-linear growth or an OOM is the cliff.
  * Results are copied into EXPLAINS.md.
  *
  * Usage: runMain graft.DocScaleSmoke [copies=10] */
object DocScaleSmoke {

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = core.Tables.documents(spark, sfDir)
    val emb0 = core.Tables.embeddings(spark, sfDir)
    val nDocs = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    val nVecs = emb0.agg(max(col("vec_id"))).head().getLong(0) + 1

    def docCopy(i: Int): DataFrame = docs0.select(
      (col("doc_id") + lit(i * nDocs)).as("doc_id"),
      regexp_replace(lower(col("text")), "([a-z0-9]+)", s"$$1c$i").as("text"),
      col("lang"), col("source"), col("n_chars"))
    def embCopy(i: Int): DataFrame = emb0.select(
      (col("vec_id") + lit(i * nVecs)).as("vec_id"), col("embedding"))

    // materialize to parquet so scans cost what the bench's scans cost;
    // repartition to the core count FIRST — a narrow map of a small read
    // writes ONE file, and a 1x corpus scanned as one partition runs
    // single-task (the first run of this smoke measured exactly that:
    // 1x and 10x "scaled" 1.0x because parallelism grew with the data)
    val dir = s"/tmp/graft_docscale$copies"
    docCopy(0).repartition(cpus.toInt).write.mode("overwrite").parquet(s"$dir/docs1")
    (0 until copies).map(docCopy).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite").parquet(s"$dir/docsN")
    embCopy(0).repartition(cpus.toInt).write.mode("overwrite").parquet(s"$dir/emb1")
    (0 until copies).map(embCopy).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite").parquet(s"$dir/embN")
    val (d1, dN) = (spark.read.parquet(s"$dir/docs1"), spark.read.parquet(s"$dir/docsN"))
    val (e1, eN) = (spark.read.parquet(s"$dir/emb1"), spark.read.parquet(s"$dir/embN"))

    def time(label: String)(thunk: => Long): Double = {
      val t0 = System.nanoTime()
      val n = thunk
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[docscale] $label%-30s ${sec}%7.2fs  rows=$n")
      sec
    }

    // load phase, timed separately — the shared tokenized-corpus pin
    // Bench.warmup builds (the deployment's stored artifact)
    def warm(d: DataFrame, tag: String): Unit = {
      val _ = time(s"load/pin tokens $tag") {
        ops.Corpus.tokens(d, "doc_id", "text"); 0L
      }
    }

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    // dev iteration: SPARK_GRAFT_SMOKE_ONLY=covariance,knn runs a subset
    // (SUBSTRING match on operator name — looser than ScaleSmoke's exact
    // set membership, because names here carry annotations)
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY").map(_.split(",").toSet)
    def run(name: String, f: (DataFrame, DataFrame) => DataFrame): Unit = {
      if (!only.forall(_.exists(name.contains))) return
      val t1 = time(s"$name 1x")(f(d1, e1).count())
      val tN = time(s"$name ${copies}x")(f(dN, eN).count())
      results(name) = (t1, tN)
    }

    warm(d1, "1x"); warm(dN, s"${copies}x")
    // order matters and is identical at both scales: minhash pays the
    // signature-chain build, clusters reuses it, pipeline builds its own
    // post-dedup chain
    run("minhash_lsh", (d, _) => ops.Dedup.minhashNearDups(d, "doc_id", "text"))
    run("dedup_clusters", (d, _) => ops.Dedup.nearDupClusters(d, "doc_id", "text"))
    run("corpus_pipeline", (d, _) => ops.CorpusPipeline.langDistribution(d))
    run("decontaminate", (d, _) => ops.Decontaminate.contaminated(
      d.filter(col("doc_id") >= 25), d.filter(col("doc_id") < 25),
      "doc_id", "text", "text", ngram = 5))
    run("pack_blocks", (d, _) => ops.Packing.packBlocks(d, "doc_id", "text",
      budget = 512, buckets = 32))
    // same 5 query vectors at both scales (copy 0 keeps ids 0..4); the
    // base side is what grows 10x
    run("ann_brute_topk", (_, e) => ops.Ann.bruteForceTopK(
      e.filter(col("vec_id") < 5), e, k = 10))
    run("pmi_pairs", (d, _) => ops.Corpus.pmiPairs(d, "doc_id", "text"))
    run("rp_reduce", (_, e) => ops.Ann.randomProjection(
      e, "vec_id", "embedding", dOut = 16, dims = 64))
    run("kmv_distinct", (d, _) => {
      ops.Sketch.registerKernels(d)
      d.select(col("source"),
          explode(functions.TextFunctions.tokenize(col("text"))).as("tok"))
        .select(col("source"), ops.Sketch.hash60(col("tok")).as("h"))
        .groupBy(col("source"))
        .agg(ops.Sketch.kmvEstimate(col("h"), 64).as("s"))
    })
    // round-7 operators: the CMS counter table stays 4×256 at every scale;
    // bloom's broadcast stays ≤ mBits rows; BPE trains on the vocabulary
    // (which the suffixed copies grow ∝ N — the worst case for it); TF-IDF
    // and the bigram LM are keyed-shuffle streams
    run("cms_topk", (d, _) => ops.Sketch.countMinTopK(
      ops.Corpus.tokens(d, "doc_id", "text")
        .select(explode(col("toks")).as("tok")), "tok"))
    run("bloom_decontaminate", (d, _) => ops.Decontaminate.bloomContaminated(
      d.filter(col("doc_id") >= 25), d.filter(col("doc_id") < 25),
      "doc_id", "text", "text", ngram = 5, mBits = 65536, kHashes = 3))
    run("tfidf_topterms", (d, _) => ops.Corpus.tfidfTopTerms(d, "doc_id", "text"))
    run("bigram_logprob", (d, _) => ops.Corpus.bigramLogProb(d, "doc_id", "text"))
    run("bpe_merges", (d, _) => ops.Bpe.merges(d, "doc_id", "text", nMerges = 8))

    // round-8 operators: covariance shuffles d(d+1)/2 groups at ANY corpus
    // size (the whole point); temperature mixing is a stratum aggregation +
    // zero-shuffle filter; incremental dedup broadcasts the batch's bands
    // against the stored signature artifact
    run("embed_covariance", (_, e) => ops.Pca.covariance(e, "vec_id", "embedding", 64))
    run("temperature_mix", (d, _) => ops.Packing.temperatureMix(
      d, "doc_id", col("source"), col("n_chars"), alpha = 0.6, targetFraction = 0.3))
    run("incremental_dedup", (d, _) => ops.Dedup.incrementalNearDups(
      d, "doc_id", "text", isNew = col("doc_id") % 10 >= 8))

    // round-8b operators: token-budget's histogram stays ≤100·max_score
    // rows at any size; the classifier is rounds+1 streams over the pinned
    // sparse features with a 32-row broadcast weight table; zipf reduces to
    // 200 rows/source before its moments
    run("token_budget", (d, _) => ops.Packing.tokenBudgetSelect(
      d, "doc_id", "text", frac = 0.5))
    run("quality_classifier", (d, _) => ops.Corpus.trainQualityClassifier(
      d, "doc_id", "text", col("lang") === "en", dims = 32, rounds = 3))
    run("zipf_fit", (d, _) => ops.Corpus.zipfFit(
      d, "doc_id", "source", "text", topK = 200))
    run("intradoc_dedup", (d, _) => ops.Corpus.intraDocDedup(
      d, "doc_id", "text", chunk = 3))
    run("hll_distinct", (d, _) => {
      ops.Sketch.registerKernels(d)
      d.select(col("source"),
          explode(functions.TextFunctions.tokenize(col("text"))).as("tok"))
        .select(col("source"), ops.Sketch.hash60(col("tok")).as("h"))
        .groupBy(col("source"))
        .agg(ops.Sketch.hllEstimate(col("h")).as("s"))
    })

    // the kNN-graph scale knob: cells ∝ N keeps |cell| — and so the
    // within-cell quadratic term PER VECTOR — constant (the SemDeDup
    // recipe); fixing nClusters while N grows would measure the cliff the
    // operator's contract tells deployments to avoid
    if (only.forall(_.exists("knn_graph".contains))) {
      val t1 = time("knn_graph 1x")(
        ops.Ann.knnGraph(e1, nClusters = 8, iters = 2, k = 5).count())
      val tN = time(s"knn_graph ${copies}x")(
        ops.Ann.knnGraph(eN, nClusters = 8 * copies, iters = 2, k = 5).count())
      results("knn_graph (cells ∝ N)") = (t1, tN)
    }

    // round-9 additions. MMR: the pool cut is the bounded-heap top_k_by
    // aggregate over the scored scan (k·|Q| pairs through the shuffle),
    // then k−1 tiny-table greedy rounds — the corpus side only ever feeds
    // one aggregation. item_cf on a DEGENERATE mega-basket input (basket =
    // lang, so one basket holds thousands of items and grows ∝N): basketCap
    // bounds the self-join's quadratic term — uncapped, the 10× pair count
    // per basket would grow 100×.
    run("mmr_diversify", (_, e) => ops.Ann.mmrTopK(
      e.filter(col("vec_id") < 3), e.filter(col("vec_id") >= 3),
      k = 4, lambda = 0.7, poolSize = 8))
    run("item_cf_megabasket", (d, _) => ops.Search.itemItemCf(
      d.select(col("lang"), col("doc_id")), "lang", "doc_id",
      k = 10, basketCap = 100))

    println(f"%n[docscale] | operator | 1x | ${copies}x | ratio |")
    println(s"[docscale] |---|---|---|---|")
    results.foreach { case (k, (a, b)) =>
      println(f"[docscale] | $k | $a%.2f s | $b%.2f s | ${b / a}%.1fx |")
    }
    spark.stop()
  }
}
