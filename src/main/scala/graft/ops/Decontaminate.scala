package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination — the training-data hygiene pass that removes
  * corpus documents overlapping an evaluation set (the GPT-3/Pile-style
  * word-n-gram overlap rule: a document is contaminated if it shares any
  * n-gram of `ngram` consecutive tokens with any benchmark item).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus, so its
  * distinct n-gram hash set BROADCASTS; the corpus side is a narrow
  * tokenize→shingle map followed by the broadcast hash join — the 100 TB
  * side never shuffles. The only exchange is the final groupBy over the
  * contaminated ids, which is bounded by the match count, not the corpus.
  * Grams travel as md5 hashes, not strings, so the broadcast stays small
  * at real benchmark sizes.
  */
object Decontaminate {

  // tokens come STAGED (the session-shared pinned corpus view): an unstaged
  // tokenize(text) re-runs inside every shingle-lambda invocation —
  // quadratic per doc (see TextFunctions.shinglesFromTokens)
  private def grams(df: DataFrame, idCol: String, textCol: String,
                    ngram: Int): DataFrame =
    Corpus.tokens(df, idCol, textCol)
      .select(col(idCol),
        TextFunctions.shinglesFromTokens(col("toks"), ngram).as("g"))
      .select(col(idCol), explode(col("g")).as("gram"))

  /** Contaminated corpus documents: (idCol, n_hits) where n_hits counts the
    * DISTINCT benchmark n-grams the document contains. Documents shorter
    * than `ngram` tokens fall back to their whole token sequence (matching
    * [[TextFunctions.shinglesFromTokens]] on both sides, so a short
    * benchmark item still catches verbatim copies of itself). */
  def contaminated(corpus: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String,
                   benchTextCol: String, ngram: Int = 13): DataFrame = {
    // the benchmark is small — stage its token arrays with a plain eager
    // checkpoint (not the session pin: eval sets rotate, the corpus doesn't)
    val benchToks = bench
      .select(TextFunctions.tokenize(col(benchTextCol)).as("toks"))
      .localCheckpoint(true)
    val benchGrams = broadcast(
      benchToks.select(TextFunctions.shinglesFromTokens(col("toks"), ngram).as("g"))
        .select(explode(col("g")).as("gram"))
        .select(md5(col("gram")).as("h")).distinct())
    // semi-join FIRST (broadcast — the corpus never shuffles), THEN count
    // distinct hits: only the surviving (id, hash) pairs — bounded by the
    // benchmark's reach — enter the aggregation exchange
    grams(corpus, idCol, textCol, ngram)
      .select(col(idCol), md5(col("gram")).as("h"))
      .join(benchGrams, Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(countDistinct(col("h")).as("n_hits"))
  }

  /** The corpus with contaminated documents removed. The contaminated-id
    * set is bounded by how many CORPUS documents the benchmark reaches —
    * usually tiny, but a benchmark n-gram sitting in boilerplate can pull
    * in O(corpus) ids, so no broadcast hint: AQE broadcasts when the set is
    * actually small and the plain left_anti degrades gracefully when not. */
  def clean(corpus: DataFrame, bench: DataFrame,
            idCol: String, textCol: String,
            benchTextCol: String, ngram: Int = 13): DataFrame =
    corpus.join(
      contaminated(corpus, bench, idCol, textCol, benchTextCol, ngram)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Bloom-filter decontamination — the FIXED-MEMORY variant of
    * [[contaminated]] for the regime where even the hashed benchmark
    * n-gram set strains the broadcast budget: the benchmark grams set
    * `kHashes` bits each in an `mBits`-bit filter, and a corpus gram is
    * flagged when ALL its bits are set. One-sided error by construction —
    * false positives (over-removal) only, never missed contamination; the
    * spec asserts the flagged set is a superset of [[contaminated]]'s.
    *
    * Scale shape: the filter itself is an `mBits`-bit PLAN LITERAL built
    * on the driver (bounded regardless of benchmark size — vs one row per
    * distinct benchmark gram in [[contaminated]]); the corpus side is a
    * narrow shingle→hash map with a codegen'd all-bits-set FILTER — no
    * join, no explode — so only fully flagged (id, gram) survivors ever
    * reach an exchange. Returns (idCol, n_flagged) over DISTINCT flagged
    * grams. */
  def bloomContaminated(corpus: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String, benchTextCol: String,
                        ngram: Int = 5, mBits: Int = 4096,
                        kHashes: Int = 3): DataFrame = {
    def bits(gramHash: org.apache.spark.sql.Column) = array(
      (0 until kHashes).map(j =>
        pmod(Sketch.hash60(concat_ws(":", lit(j), gramHash)), lit(mBits))): _*)
    require(mBits <= (1 << 22),
      s"mBits=$mBits: the filter must stay a bounded driver/plan literal")
    val benchToks = bench
      .select(TextFunctions.tokenize(col(benchTextCol)).as("toks"))
      .localCheckpoint(true)
    // The filter is FIXED-MEMORY by construction (mBits bits), so build it
    // ON THE DRIVER (guide §3.2's manual Bloom filter — the collect is
    // bounded by mBits rows, never by benchmark or corpus size) and plant
    // it as a '0'/'1' string literal in the plan. The corpus-side
    // membership test then compiles to a pure codegen'd FILTER — kHashes
    // hash+substr probes per gram occurrence, no kHashes-way explode (the
    // old plan tripled the corpus row count), no broadcast join stage —
    // and the first exchange carries only FULLY flagged survivors, where
    // the old shape aggregated every occurrence with ≥1 matching bit.
    val setPos = benchToks
      .select(TextFunctions.shinglesFromTokens(col("toks"), ngram).as("g"))
      .select(explode(col("g")).as("gram"))
      .select(explode(bits(md5(col("gram")))).as("p")).distinct()
      .collect().map(_.getLong(0).toInt)
    val mask = Array.fill(mBits)(false)
    setPos.foreach(p => mask(p) = true)
    // array<boolean> literal: element_at on an array literal is O(1) per
    // probe (a string literal + substr scans O(mBits) BYTES per probe —
    // measured 45 s at sf0.1)
    val maskLit = typedlit(mask.toSeq)
    def isSet(p: org.apache.spark.sql.Column) =
      element_at(maskLit, (p + 1).cast("int"))
    val allSet = (0 until kHashes).map(j =>
      isSet(pmod(Sketch.hash60(concat_ws(":", lit(j), col("gh"))), lit(mBits))))
      .reduce(_ && _)
    grams(corpus, idCol, textCol, ngram)
      .select(col(idCol), md5(col("gram")).as("gh"))
      .filter(allSet)
      .groupBy(col(idCol), col("gh")).agg(count(lit(1)).as("__m"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_flagged"))
  }

  /** FUZZY decontamination — the MinHash-LSH variant of [[contaminated]]
    * (the FineWeb/Dolma-style near-duplicate rule: a corpus document is
    * contaminated if its shingle-set jaccard against ANY benchmark item
    * reaches `threshold`, not only on verbatim n-gram overlap). Both sides
    * are filters of ONE pinned corpus signature table (`benchPred` selects
    * the benchmark split), so the signature build is shared with every
    * other LSH consumer and never recomputed.
    *
    * Scale shape: band-bucket join between the corpus band keys and the
    * (small, broadcast) benchmark band keys — the corpus side never
    * shuffles on anything wider than its exploded band keys; exact jaccard
    * verification then touches only colliding pairs, with the benchmark
    * shingle sets broadcast. Returns (doc_id, bench_id, jaccard ≥ τ). */
  def contaminatedFuzzy(docs: DataFrame, idCol: String, textCol: String,
                        benchPred: org.apache.spark.sql.Column,
                        ngram: Int = 3, k: Int = 12, bands: Int = 6,
                        rows: Int = 2, threshold: Double = 0.5): DataFrame = {
    val sigs = Dedup.signatureTable(docs, idCol, textCol, ngram, k, bands, rows)
    val bench = sigs.filter(benchPred)
    val corpus = sigs.filter(!benchPred)
    val benchBk = bench.select(col("doc_id").as("bench_id"),
      explode(col("band_keys")).as("bucket"))
    val corpusBk = corpus.select(col("doc_id"), explode(col("band_keys")).as("bucket"))
    val cand = corpusBk.join(broadcast(benchBk), Seq("bucket"))
      .select(col("doc_id"), col("bench_id")).distinct()
    val benchSh = bench.select(col("doc_id").as("bench_id"), col("sh").as("sh_b"))
    cand.join(corpus.select(col("doc_id"), col("sh")), Seq("doc_id"))
      .join(broadcast(benchSh), Seq("bench_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
          size(array_distinct(concat(col("sh"), col("sh_b")))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"), round(col("jaccard"), 9).as("jaccard"))
  }

  /** EMBEDDING-SPACE decontamination — the semantic variant of
    * [[contaminated]] (the GPT-4/Llama-style eval-leakage rule: a corpus
    * item is contaminated if its embedding's cosine similarity to ANY
    * benchmark embedding reaches `tau` — catches paraphrases and
    * translations that n-gram and MinHash rules miss). Similarities are
    * rounded-6 BEFORE the max/threshold so both engines cut on identical
    * values. Returns (idCol, max_sim, n_hits, contaminated 0/1).
    *
    * Scale shape: the benchmark side is tiny relative to the corpus and
    * BROADCASTS; the corpus side never shuffles data wider than one
    * (id, sim) row per benchmark item, and the per-id max/count aggregation
    * partial-combines map-side down to |corpus| rows before the only
    * exchange. The cosine kernel is the codegen'd
    * [[graft.functions.VectorFunctions.cosineSim]] expression. At real
    * benchmark scale the broadcast holds B vectors (B ≪ corpus); if B
    * itself grows, pre-bucket both sides with [[Ann.cellAssignments]] and
    * run this per cell. */
  def embeddingOverlap(corpus: DataFrame, bench: DataFrame,
                       idCol: String, vecCol: String,
                       tau: Double): DataFrame = {
    Ann.registerKernels(corpus)
    val b = broadcast(bench.select(col(vecCol).as("__be")))
    corpus.select(col(idCol), col(vecCol).as("__ce"))
      .crossJoin(b)
      .select(col(idCol),
        round(graft.functions.VectorFunctions.cosineSim(
          col("__ce"), col("__be")), 6).as("sim"))
      .groupBy(col(idCol))
      .agg((max(col("sim")) + lit(0.0)).as("max_sim"),
        sum(when(col("sim") >= tau, 1L).otherwise(0L)).as("n_hits"))
      .select(col(idCol), col("max_sim"), col("n_hits"),
        (col("max_sim") >= tau).cast("long").as("contaminated"))
  }
}
