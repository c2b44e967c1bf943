package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Num
import graft.functions.TextFunctions

/** Session-shared corpus working set.
  *
  * [[tokens]] is the text-side analog of the pinned adjacency views the
  * traversals plan against: a `(id, text, toks)` view materialized once per
  * (session, input plan) via [[graft.core.Pin]], so every operator that
  * needs the token array of the same document set — MinHash signatures,
  * quality gates, language id — reads one materialization instead of
  * re-running the tokenizer. At cluster scale this is the
  * `persist(MEMORY_AND_DISK)` of the tokenized corpus that a multi-stage
  * curation job would hold for its lifetime.
  */
object Corpus {

  /** Pinned `(idCol, textCol, toks)` view of a document table. Callers that
    * tokenize the same input plan share the materialization. Derived-pinned:
    * stays materialized even in store-resident mode (the deployment writes
    * the tokenized corpus once, beside the source table). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Pin.pinDerived(docs.select(col(idCol), col(textCol),
      TextFunctions.tokenize(col(textCol)).as("toks")))

  /** Corpus-trained unigram LM score per document — the CCNet/KenLM-style
    * perplexity-proxy quality signal (Wenzek et al., "CCNet", 2020) reduced
    * to a unigram model so the score is exactly reproducible by the SQL
    * oracle: score(d) = mean over tokens t of ln(p(t)), p(t) = corpus
    * count(t) / total tokens. Rare-token-heavy (noisy/garbled) documents
    * score low; common-token documents score high — filter both tails.
    *
    * Scale shape: the vocabulary stays DISTRIBUTED end to end — no driver
    * collect, no broadcast of an unbounded vocab table. Three keyed
    * shuffles of the token stream (count by token, token-keyed join of the
    * stream against its frequency table, re-group by document), each
    * AQE-coalesced; the 1-row corpus total is the only broadcast. Rounded
    * to 6 decimals: the per-doc mean is an unordered double fold, the same
    * cross-engine fp-stabilization contract as `Ann.kmeansCentroids`. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val f = e.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = f.agg(sum(col("cnt")).cast("double").as("n"))
    e.join(f, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), avg(log(col("cnt"))).as("__alp"))
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("n_toks"),
        Num.zround6(col("__alp") - log(col("n"))).as("logprob"))
  }

  /** Corpus-trained BIGRAM LM score per document — [[unigramLogProb]]'s
    * order-2 upgrade (the closer perplexity proxy: fluency is mostly local
    * word order): score(d) = mean over adjacent pairs (t₁,t₂) of
    * ln p̂(t₂|t₁), with add-one smoothing p̂ = (c(t₁,t₂)+1)/(c(t₁)+V) and
    * V the corpus vocabulary size — every count exact, the log per-row
    * fixed-order, so the oracle reproduces it. Documents with <2 tokens
    * have no bigrams and drop out (same convention both sides).
    *
    * Scale shape: adjacency pairs come from a doc-partitioned lead window
    * (bounded by doc length, never unpartitioned); both count tables stay
    * DISTRIBUTED on their keys (no vocab broadcast — the 1-row V/total is
    * the only broadcast); the pair stream joins its frequency tables on
    * (t₁,t₂) and t₁, then re-groups by document. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bg = e.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val c1 = e.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val c12 = bg.groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c12"))
    val v = c1.agg(count(lit(1)).cast("double").as("v"))
    bg.join(c12, Seq("tok", "nxt"))
      .join(c1, Seq("tok"))
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        Num.zround6(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v")))))
          .as("logprob"))
  }

  /** Gopher-style rule-based quality filter (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * §A1.1 — the word-level subset; the line-level rules need line
    * structure the corpus lacks). Per document: word count, mean word
    * length (over occurrences), type-token ratio, most-frequent-word mass
    * fraction, and a stopword-presence count — then one boolean verdict
    * against fixed thresholds. These are THE standard web-scale curation
    * gates (C4/Gopher/FineWeb all ship a variant).
    *
    * Scale shape: one shuffle keyed (doc, word) — skew-free by key
    * construction — then one keyed by doc; no driver state, no vocab
    * broadcast. Thresholds are parameters so a deployment tunes them
    * per-corpus. */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
                    minWords: Long = 30, maxWords: Long = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    minTtr: Double = 0.4, maxTopFrac: Double = 0.12,
                    minStopHits: Long = 1): DataFrame = {
    val stopSet = Seq("the", "a", "and", "of", "to", "in", "is")
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("w"))
    val wc = e.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    wc.groupBy(col(idCol)).agg(
        sum(col("c")).as("n_words"),
        round(sum(length(col("w")) * col("c")).cast("double") / sum(col("c")), 6)
          .as("mean_word_len"),
        round(count(lit(1)).cast("double") / sum(col("c")), 6).as("ttr"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_word_frac"),
        sum(when(col("w").isInCollection(stopSet), 1L).otherwise(0L)).as("stop_hits"))
      .withColumn("pass",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
          col("ttr") >= minTtr && col("top_word_frac") <= maxTopFrac &&
          col("stop_hits") >= minStopHits).cast("int"))
  }

  /** Out-of-vocabulary rate per document against the corpus' own top-N
    * vocabulary — the tokenizer-coverage signal a curation pipeline uses to
    * flag garbled/foreign/boilerplate documents before training (high OOV
    * against the pipeline's fixed vocab ⇒ the tokenizer will shred the
    * text into rare pieces). Vocabulary = the `vocabSize` most frequent
    * corpus words (ties on the word) — the stand-in for a fixed tokenizer
    * vocab, and exactly reproducible by the oracle.
    *
    * Scale shape: one token-keyed count, a distributed top-k
    * (TakeOrderedAndProject — k rows per partition, never a global sort),
    * then the tiny vocab BROADCASTS against the token stream; one final
    * doc-keyed aggregation. The corpus-size side never shuffles on
    * anything but (doc, token) aggregates. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int = 100): DataFrame = {
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val vocab = e.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("__v"))
    e.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_toks"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_toks"), 6).as("oov_rate"))
  }

  /** C4-style rule-based cleaning verdict (Raffel et al., "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    * 2020, §2.2 — the document-level subset; the line-level rules need line
    * structure, which [[graft.ops.Dedup.duplicatedWindows]]' span hashing
    * stands in for on this corpus). Per document: word count, presence of
    * "lorem ipsum" (placeholder boilerplate), a curly brace (code marker),
    * and policy-page phrases — then one verdict. Complements
    * [[gopherQuality]]: C4 is the drop-list half of web curation, Gopher
    * the statistics half; pipelines run both.
    *
    * Scale shape: a pure narrow map over the corpus — zero shuffles, all
    * predicates codegen'd string built-ins (no UDF). */
  def c4Rules(docs: DataFrame, idCol: String, textCol: String,
              minWords: Int = 5): DataFrame = {
    val t = lower(col(textCol))
    docs.select(col(idCol),
        size(TextFunctions.tokenize(col(textCol))).cast("long").as("n_words"),
        t.contains("lorem ipsum").as("has_lorem"),
        t.contains("{").as("has_brace"),
        (t.contains("privacy policy") || t.contains("cookie policy") ||
          t.contains("terms of use")).as("has_policy"))
      .withColumn("pass",
        (col("n_words") >= minWords && !col("has_lorem") && !col("has_brace") &&
          !col("has_policy")).cast("int"))
  }

  /** Windowed co-occurrence PMI (pointwise mutual information — the
    * word-association score of Church & Hanks 1990, the scoring inside
    * word2vec-era collocation extraction): for token pair (x ≤ y) occurring
    * within `window` positions, PMI = ln(c_xy/P) − ln(c_x/T) − ln(c_y/T),
    * with T total tokens, P total windowed pairs. High-PMI pairs are
    * collocations; the `minCount` floor drops noise pairs. Returns the
    * global top-`k` by PMI.
    *
    * Scale shape: the position self-join is (doc, pos)-keyed — `window`·T
    * rows, linear in the corpus; pair counts shuffle on the (x, y) key,
    * unigram counts join on their token keys (both distributed — no vocab
    * broadcast; the 1-row totals are the only broadcast); top-k is
    * TakeOrderedAndProject. Every count is an exact integer, and the three
    * log terms evaluate in a fixed order, so the doubles are oracle-exact. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               window: Int = 2, minCount: Long = 5, k: Int = 20): DataFrame = {
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
    val pairsRaw = e.as("l")
      .join(e.as("r"), col(s"l.$idCol") === col(s"r.$idCol") &&
        col("r.pos") > col("l.pos") && col("r.pos") <= col("l.pos") + window)
      .select(least(col("l.tok"), col("r.tok")).as("x"),
        greatest(col("l.tok"), col("r.tok")).as("y"))
    val cxy = pairsRaw.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val cx = e.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = cx.agg(sum(col("c")).cast("double").as("t"))
      .crossJoin(cxy.agg(sum(col("cxy")).cast("double").as("p")))
    cxy.filter(col("cxy") >= minCount)
      .join(cx.select(col("tok").as("x"), col("c").as("cx")), Seq("x"))
      .join(cx.select(col("tok").as("y"), col("c").as("cy")), Seq("y"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi",
        log(col("cxy") / col("p")) - log(col("cx") / col("t")) -
          log(col("cy") / col("t")))
      .orderBy(col("pmi").desc, col("x").asc, col("y").asc).limit(k)
      .select(col("x"), col("y"), col("cxy"), Num.zround6(col("pmi")).as("pmi"))
  }

  /** TF-IDF top-`k` terms per document — the classic term-weighting signal
    * (Salton & Buckley 1988) a curation pipeline uses for keyword/topic
    * extraction and near-topic grouping: score(d,t) = tf(d,t) · ln(N/df(t)).
    * Ties break on the term so the top-k is deterministic; the log evaluates
    * per-row in a fixed order over exact integer inputs, so the doubles are
    * oracle-exact before the defensive round.
    *
    * Scale shape: tf shuffles on (doc, term), df on the term key — both
    * distributed, no vocab broadcast (the 1-row corpus count is the only
    * broadcast); the top-k window partitions by document (width = the doc's
    * distinct-term count, never unpartitioned). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val tf = e.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy((col("tf") * log(col("n") / col("df"))).desc, col("tok").asc)
    tf.join(dfT, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("df"),
        round(col("tf") * log(col("n") / col("df")), 6).as("tfidf"),
        col("rank").cast("long").as("rank"))
  }

  /** Character-level Shannon entropy per document over the sanitized
    * `[a-z0-9 ]` alphabet — the gibberish/encoding-noise gauge (low entropy
    * = repeated filler, high = random bytes; both tails are curation
    * drop signals). H = log2(n) − Σ c·log2(c) / n over exact integer
    * character counts c.
    *
    * Scale shape: one shuffle keyed (doc, char) — bounded fan-out (≤37 keys
    * per doc) — then one doc-keyed aggregation; zero broadcasts, zero UDFs
    * (split + explode + built-in math, all codegen'd). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sanitized = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
    val ch = docs.select(col(idCol), explode(split(sanitized, "")).as("ch"))
      .filter(length(col("ch")) > 0)
    ch.groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * log2(col("c").cast("double"))).as("__s"))
      .select(col(idCol), col("n_chars"), col("n_distinct"),
        Num.zround6(log2(col("n_chars").cast("double")) -
          col("__s") / col("n_chars")).as("entropy"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: split the
    * corpus into head/middle/tail by LM perplexity; train preferentially on
    * the head). Buckets cut on the corpus z-score of [[unigramLogProb]]
    * (z ≥ `zHead` → head = most-fluent, z ≤ `zTail` → tail) so the
    * thresholds adapt to any corpus without a quantile pass. Mean/stddev
    * come from EXACT decimal sums over the rounded-6 logprobs (the
    * q_event_zscore contract) so the bucket decision is bit-identical
    * across engines.
    *
    * Scale shape: [[unigramLogProb]]'s three keyed shuffles, then a 1-row
    * stats broadcast against the per-doc scores — a narrow map; no global
    * sort, no quantile shuffle. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        zHead: Double = 0.5, zTail: Double = -0.5): DataFrame = {
    val lp = unigramLogProb(docs, idCol, textCol)
    val dlp = col("logprob").cast("decimal(18,6)")
    val stats = lp.agg(count(lit(1)).as("cnt"),
      sum(dlp).cast("double").as("sv"),
      sum(dlp * dlp).cast("double").as("ssv"))
    val z = (col("logprob") - col("sv") / col("cnt")) /
      sqrt((col("ssv") - col("sv") * col("sv") / col("cnt")) / (col("cnt") - 1))
    lp.crossJoin(broadcast(stats))
      .select(col(idCol), col("n_toks"), col("logprob"),
        Num.zround6(z).as("z"),
        when(z >= zHead, "head").when(z <= zTail, "tail")
          .otherwise("middle").as("bucket"))
  }

  /** Exact interpolated percentiles of a numeric column per group — the
    * distribution half of a source card (length/quality percentiles per
    * source). Spark's `percentile` and DuckDB's `quantile_cont` share the
    * linear-interpolation definition (index p·(n−1) on the sorted values),
    * so the oracle matches to rounding. Exact percentile sorts per group —
    * reporting-grade over bounded groups; at 100 TB corpus scale swap in
    * `approx_percentile` (t-digest, mergeable map-side) for the same shape
    * with bounded state. */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: Column,
                       ps: Seq[Double]): DataFrame = {
    val cols = ps.map(p =>
      round(expr(s"percentile(__v, $p)"), 6).as(s"p${math.round(p * 100)}"))
    df.select(col(groupCol), valueCol.cast("double").as("__v"))
      .groupBy(col(groupCol)).agg(cols.head, cols.tail: _*)
  }

  /** Per-domain URL statistics — the blocklist/allowlist substrate of web
    * curation (C4 §2.2 drops blocklisted domains; FineWeb publishes per-
    * domain counts): extract `http(s)://host` occurrences, aggregate
    * document and occurrence counts per host. Returns
    * `(domain, n_docs, n_hits)`.
    *
    * Scale shape: a narrow regexp scan (codegen'd, no UDF) then one
    * domain-keyed aggregation; web-scale domain skew (a few giant hosts)
    * stays safe because the per-key payload is a pair of counters. */
  def urlDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hits = docs.select(col(idCol),
        explode(expr(s"regexp_extract_all(lower($textCol), 'https?://([a-z0-9.-]+)', 1)"))
          .as("domain"))
      .filter(length(col("domain")) > 0)
    hits.groupBy(col("domain"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_hits"))
  }

  /** Pairwise source vocabulary overlap — the corpus-drift / source-
    * redundancy gauge a mixture designer reads before weighting sources
    * (two sources with near-identical vocabularies add little diversity):
    * jaccard of the distinct-token sets for every source pair, via the
    * inverted (token → source) index — never a vocabulary-array cross
    * join.
    *
    * Scale shape: one (source, token) dedup shuffle, a token-keyed
    * self-join whose fan-out is bounded by sources-per-token (≤ the
    * source count, a constant), one pair-keyed count; per-source vocab
    * sizes broadcast onto the pair table. */
  def sourceOverlap(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val st = tokens(docs, groupCol, textCol)
      .select(col(groupCol).as("g"), explode(col("toks")).as("tok"))
      .distinct()
    val vsz = st.groupBy(col("g")).agg(count(lit(1)).as("v"))
    val inter = st.as("l").join(st.as("r"),
        col("l.tok") === col("r.tok") && col("l.g") < col("r.g"))
      .groupBy(col("l.g").as("ga"), col("r.g").as("gb"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(vsz.select(col("g").as("ga"), col("v").as("va"))), Seq("ga"))
      .join(broadcast(vsz.select(col("g").as("gb"), col("v").as("vb"))), Seq("gb"))
      .select(col("ga"), col("gb"), col("n_common"), col("va"), col("vb"),
        round(col("n_common").cast("double") /
          (col("va") + col("vb") - col("n_common")), 6).as("jaccard"))
  }

  /** Per-source dataset-card row — the summary bundle a corpus release
    * ships per subset (counts, token volume, vocabulary, language mix):
    * n_docs, n_tokens, vocabulary size, mean document length, and the
    * Shannon entropy of the language distribution (0 = monolingual,
    * log2(k) = uniform over k languages). All inputs exact integers; the
    * entropy's log terms are the only doubles (rounded 6).
    *
    * Scale shape: one (source, token) aggregation for volume/vocab, one
    * (source, lang) count for the mix — both map-side combined; no
    * broadcasts bigger than the source list. */
  def sourceCard(docs: DataFrame, groupCol: String, textCol: String,
                 langCol: String): DataFrame = {
    val e = tokens(docs, groupCol, textCol)
    val vol = e.select(col(groupCol), explode(col("toks")).as("tok"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_vocab"))
    val lm = docs.groupBy(col(groupCol), col(langCol)).agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("c") * log2(col("c").cast("double"))).as("__s"))
      .select(col(groupCol), col("n_docs"),
        Num.zround6(log2(col("n_docs").cast("double")) -
          col("__s") / col("n_docs")).as("lang_entropy"))
    lm.join(vol, Seq(groupCol))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("n_vocab"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6).as("mean_doc_toks"),
        col("lang_entropy"))
  }

  /** DSIR-style importance weight per document (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", 2023 — reduced to
    * add-one-smoothed unigram LMs so the score is exactly reproducible by
    * the SQL oracle): logweight(d) = Σ over token occurrences t of
    * ln p̂_target(t) − ln p̂_raw(t), with p̂(t) = (count(t)+1)/(total+V) and
    * V = the raw corpus vocabulary size. Documents that look like the
    * `target` subset (in-domain) score high; resample downstream with
    * [[graft.ops.Packing.mixSample]]-style deterministic selection.
    * Docs with no tokens get weight 0. `target` is an id table — a filtered
    * view of the same corpus (quality gate, language, a trusted source).
    *
    * Scale shape mirrors [[unigramLogProb]]: both LMs stay DISTRIBUTED
    * (token-keyed count tables; no driver collect, no vocab broadcast);
    * the per-token log-ratio table joins the token stream on its key; the
    * only broadcast is the 1-row totals. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        target: DataFrame): DataFrame = {
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val eT = e.join(target.select(col(idCol)), Seq(idCol), "left_semi")
    val cntR = e.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
    val cntT = eT.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val stats = cntR.agg(sum(col("cr")).cast("double").as("totr"),
        count(lit(1)).cast("double").as("v"))
      .crossJoin(cntT.agg(sum(col("ct")).cast("double").as("tott")))
    val delta = cntR.join(cntT, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col("tok"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
             (col("tott") + col("v"))) -
         log((col("cr") + 1).cast("double") /
             (col("totr") + col("v")))).as("d"))
    val perDoc = e.join(delta, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), Num.zround6(sum(col("d"))).as("logweight"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("logweight"), lit(0.0)).as("logweight"))
  }

  /** Boilerplate REMOVAL (the CCNet/RefinedWeb line-dedup transform —
    * Wenzek et al. 2020 dedup paragraphs shared across documents; Penedo
    * et al. 2023 drop repeated lines): a document's structural units here
    * are its non-overlapping `chunk`-token windows; any unit occurring in
    * more than `maxDocs` DISTINCT documents is boilerplate and is cut
    * from every document, the survivors rejoined in order.
    *
    * Scale shape: the only shuffle is the unit-frequency aggregation. The
    * boilerplate dictionary (units above the threshold — by construction
    * few) is collapsed to ONE broadcast row, and the cut itself is an
    * array-domain `filter` — a zero-shuffle narrow map over the corpus,
    * exactly how a deployment ships a boilerplate list to every executor.
    * Returns (idCol, text_clean, n_chunks, n_removed). */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        chunk: Int, maxDocs: Int): DataFrame = {
    val ch = tokens(docs, idCol, textCol)
      .select(col(idCol),
        TextFunctions.chunkTokens(col("toks"), chunk, chunk).as("chunks"))
    val bp = ch
      .select(explode(array_distinct(col("chunks"))).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > maxDocs)
      .agg(sort_array(collect_list(col("c"))).as("bp"))
    ch.crossJoin(broadcast(bp))
      .select(col(idCol),
        filter(col("chunks"), c => !array_contains(col("bp"), c)).as("kept"),
        size(col("chunks")).as("n_chunks"))
      .select(col(idCol), concat_ws(" ", col("kept")).as("text_clean"),
        col("n_chunks").cast("long").as("n_chunks"),
        (col("n_chunks") - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** Distributed quality-classifier training + scoring: full-batch
    * logistic regression over `dims` hashed bag-of-words frequencies — the
    * fastText-style quality/language filter (CCNet §4.4, phi-1 "educational
    * value" recipe) trained INSIDE the engine. Each round is one
    * feature⋈weights join + two aggregations; weights live in a dims-row
    * frame that broadcasts back — no driver-side math, no collect.
    *
    * Determinism: features and σ(z) are rounded-9 DECIMAL, so every moment
    * (z = Σwⱼxⱼ, gradient Σ residual·xⱼ) accumulates exactly in any
    * partial-combine order; the only fp sites are the fixed-form σ and the
    * per-round weight update — single expressions both engines evaluate on
    * identical inputs.
    *
    * Scale shape: the sparse (doc, j, x) table is pinned once
    * ([[graft.core.Pin.pinDerived]]) and re-joined per round against a
    * broadcast dims-row weight table; gradients reduce map-side. Rounds are
    * O(1) tiny-table barriers — at 100 TB the corpus streams `rounds + 1`
    * times and nothing else grows. */
  def trainQualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                             label: Column, dims: Int,
                             rounds: Int): DataFrame =
    // trained artifact: weights+scores memoized per (doc set, feature/label
    // config) — the Ann.kmeansCentroids discipline; q_pr_curve and any
    // downstream eval re-read the scored table instead of retraining.
    // Keyed on the PINNED token view (plan-deduped instance), not the raw
    // docs frame — fresh loader DataFrames of the same table must hit
    lrMemo.computeIfAbsent(
      (tokens(docs, idCol, textCol), label.toString, dims, rounds),
      key => graft.core.Pin.pinDerived(
        trainQualityClassifierImpl(docs, idCol, textCol, label, dims, rounds,
          key)))

  private val lrMemo = new java.util.concurrent.ConcurrentHashMap[
    (DataFrame, String, Int, Int), DataFrame]()

  private val wMemo = new java.util.concurrent.ConcurrentHashMap[
    (DataFrame, String, Int, Int), Array[Double]]()

  graft.core.Pin.onClear(() => { lrMemo.clear(); wMemo.clear() })

  /** The trained weight vector as a j-ordered array — the artifact a
    * serving/streaming job ships (see
    * [[graft.streaming.Streams.scoredDocStream]]). A dims-row collect of a
    * trained artifact: load-phase work, the Bpe argmax discipline. */
  def trainedWeights(docs: DataFrame, idCol: String, textCol: String,
                     label: Column, dims: Int, rounds: Int): Array[Double] = {
    trainQualityClassifier(docs, idCol, textCol, label, dims, rounds)
    wMemo.get((tokens(docs, idCol, textCol), label.toString, dims, rounds))
  }

  /** Persist the trained quality classifier — the j-ordered weight vector
    * AND the scored corpus table — through
    * [[graft.sources.GraphStore.saveArtifact]] (trains first if needed;
    * memoized, so a warmed session re-trains nothing). The weights are the
    * servable artifact a streaming scorer ships; the scored table is what
    * downstream eval (PR curve, AUC, calibration) re-reads. */
  def saveClassifier(dir: String, docs: DataFrame, idCol: String,
                     textCol: String, label: Column, dims: Int,
                     rounds: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = trainQualityClassifier(docs, idCol, textCol, label, dims, rounds)
    val w = trainedWeights(docs, idCol, textCol, label, dims, rounds)
    val p = classifierParams(label, dims, rounds) +
      graft.sources.GraphStore.inputIdentity(docs)
    graft.sources.GraphStore.saveArtifact(scored, dir, "classifier_scores", p)
    graft.sources.GraphStore.saveArtifact(
      w.toSeq.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toDF("j", "w"),
      dir, "classifier_weights", p)
  }

  /** Seed the classifier memos from persisted artifacts: after a
    * successful load, [[trainQualityClassifier]] / [[trainedWeights]] over
    * the same corpus return the stored results — zero training rounds run.
    * Returns false and seeds nothing when either artifact is missing. */
  def loadClassifier(dir: String, docs: DataFrame, idCol: String,
                     textCol: String, label: Column, dims: Int,
                     rounds: Int): Boolean = {
    val spark = docs.sparkSession
    val p = classifierParams(label, dims, rounds) +
      graft.sources.GraphStore.inputIdentity(docs)
    val scored = graft.sources.GraphStore.loadArtifact(
      spark, dir, "classifier_scores", p)
    val weights = graft.sources.GraphStore.loadArtifact(
      spark, dir, "classifier_weights", p)
    (scored, weights) match {
      case (Some(s), Some(w)) =>
        val key = (tokens(docs, idCol, textCol), label.toString, dims, rounds)
        lrMemo.computeIfAbsent(key, _ => graft.core.Pin.pinDerived(
          s.select(col(idCol), col("y"), col("score"), col("pred"))))
        wMemo.computeIfAbsent(key,
          _ => w.orderBy(col("j")).collect().map(_.getDouble(1)))
        true
      case _ => false
    }
  }

  private def classifierParams(label: Column, dims: Int, rounds: Int) =
    Map("label" -> label.toString, "dims" -> dims.toString,
      "rounds" -> rounds.toString)

  private def trainQualityClassifierImpl(
      docs: DataFrame, idCol: String, textCol: String,
      label: Column, dims: Int, rounds: Int,
      memoKey: (DataFrame, String, Int, Int)): DataFrame = {
    val spark = docs.sparkSession
    val e = tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val cnt = e.groupBy(col(idCol), (Sketch.hash60(col("tok")) % dims).as("j"))
      .agg(count(lit(1)).as("cnt"))
    val nt = e.groupBy(col(idCol)).agg(count(lit(1)).as("n_toks"))
    val x = graft.core.Pin.pinDerived(cnt.join(nt, Seq(idCol))
      .select(col(idCol), col("j"),
        round(col("cnt").cast("double") / col("n_toks"), 9)
          .cast("decimal(16,9)").as("x")))
    val yd = graft.core.Pin.pinDerived(docs.select(col(idCol),
      label.cast("int").cast("decimal(16,9)").as("y")))
    // materialized once — referenced inside every round's weight update;
    // left lazy it re-scans the corpus per iteration (PlanAudit catches it)
    val nDf = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint(true)
    def zOf(w: DataFrame): DataFrame =
      x.join(broadcast(w), Seq("j")).groupBy(col(idCol))
        .agg(sum(col("w") * col("x")).as("z"))
    val sigma9 = (z: Column) =>
      round(lit(1.0) / (lit(1.0) + exp(-z.cast("double"))), 9)
        .cast("decimal(16,9)")
    var w: DataFrame = spark.range(0, dims)
      .select(col("id").as("j"), lit(0).cast("decimal(16,9)").as("w"))
    for (_ <- 0 until rounds) {
      val resid = zOf(w).join(yd, Seq(idCol))
        .select(col(idCol), (col("y") - sigma9(col("z"))).as("r"))
      val grad = x.join(resid, Seq(idCol))
        .groupBy(col("j")).agg(sum(col("r") * col("x")).as("g"))
      w = w.join(grad, Seq("j"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("j"),
          round(col("w").cast("double")
            + coalesce(col("g"), lit(0)).cast("double") / col("n_docs"), 9)
            .cast("decimal(16,9)").as("w"))
        .localCheckpoint(false)
    }
    // stash the j-ordered weight vector — the servable artifact
    wMemo.put(memoKey, w.orderBy(col("j")).collect()
      .map(_.getDecimal(1).doubleValue))
    zOf(w).join(yd, Seq(idCol))
      .select(col(idCol), col("y").cast("long").as("y"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 6)
          .as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
  }

  /** Precision/recall sweep over every distinct classifier score — the
    * threshold-calibration table (pick the operating point, read off
    * best-F1) for [[trainQualityClassifier]]'s output. At threshold t:
    * predicted-positive = score ≥ t, so TP/PP are suffix sums of the
    * per-score (positives, total) histogram in score-descending order; all
    * counts exact longs, P/R/F1 single divisions (F1 = 2TP/(PP+pos_total)).
    *
    * Scale shape: the same interval-bucket decomposition as
    * [[Packing.tokenBudgetSelect]] — the corpus reduces to ≤10⁶ distinct
    * rounded-6 scores, suffix sums come from a ≤101-row broadcast bucket
    * histogram plus PARTITIONED per-bucket windows; no global sort. */
  def prCurve(scored: DataFrame, scoreCol: String,
              labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = scored.groupBy(col(scoreCol).as("t"))
      .agg(sum(col(labelCol)).as("np"), count(lit(1)).as("nt"))
      .withColumn("bucket", floor(col("t") * 100).cast("long"))
    val btot = per.groupBy(col("bucket"))
      .agg(sum(col("np")).as("bp"), sum(col("nt")).as("bt"))
    val bcum = btot
      .join(broadcast(btot.select(col("bucket").as("hb"), col("bp").as("hbp"),
        col("bt").as("hbt"))), col("hb") > col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("hbp")), lit(0L)).as("cum_p"),
        coalesce(sum(col("hbt")), lit(0L)).as("cum_t"))
    val tot = scored.agg(sum(col(labelCol)).as("pos_total"))
    val wi = Window.partitionBy(col("bucket")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("ip", sum(col("np")).over(wi))
      .withColumn("it", sum(col("nt")).over(wi))
      .join(broadcast(bcum), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("cum_p") + col("ip")).as("tp"),
        (col("cum_t") + col("it")).as("pp"), col("pos_total"))
      .select(col("t"), col("tp"), (col("pp") - col("tp")).as("fp"),
        (col("pos_total") - col("tp")).as("fn"),
        round(col("tp").cast("double") / col("pp"), 6).as("prec"),
        round(col("tp").cast("double") / col("pos_total"), 6).as("rec"),
        round(lit(2.0) * col("tp") / (col("pp") + col("pos_total")), 6)
          .as("f1"))
  }

  /** Exact ROC AUC by the Mann–Whitney identity: AUC = P(score⁺ > score⁻)
    * + ½P(tie) = Σₛ np(s)·(2·negBelow(s) + nn(s)) / (2·P·N) — every term an
    * exact integer off the per-score histogram, one double division at the
    * end. The ranking-quality companion of [[prCurve]] (same memoized
    * classifier input).
    *
    * Scale shape: same interval-bucket decomposition as [[prCurve]] —
    * prefix sums from a broadcast bucket histogram + PARTITIONED per-bucket
    * windows; no global sort, 1 row out. */
  def aucFromScores(scored: DataFrame, scoreCol: String,
                    labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = scored.groupBy(col(scoreCol).as("t"))
      .agg(sum(col(labelCol)).as("np"),
        (count(lit(1)) - sum(col(labelCol))).as("nn"))
      .withColumn("bucket", floor(col("t") * 100).cast("long"))
    val btot = per.groupBy(col("bucket")).agg(sum(col("nn")).as("bn"))
    val bcum = btot
      .join(broadcast(btot.select(col("bucket").as("lb"), col("bn").as("lbn"))),
        col("lb") < col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("lbn")), lit(0L)).as("neg_lower"))
    val wi = Window.partitionBy(col("bucket")).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("in_neg", coalesce(sum(col("nn")).over(wi), lit(0L)))
      .join(broadcast(bcum), Seq("bucket"))
      .select(col("np"), col("nn"),
        (col("np") * (lit(2L) * (col("neg_lower") + col("in_neg")) + col("nn")))
          .as("u2"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("u2")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u2").cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Zipf-law fit per group: least-squares slope/intercept of ln(freq) on
    * ln(rank) over the top-`topK` terms — the classic corpus-health
    * diagnostic (natural text sits near slope −1; templated/spammy sources
    * flatten, boilerplate steepens). Lankes et al.-style curation signal
    * computed exactly: x = ln(rank), y = ln(freq) are rounded-9 then
    * DECIMAL, every moment (Σx, Σy, Σx², Σxy) accumulates exactly
    * (order-independent), and slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is one
    * double division — bit-equal cross-engine.
    *
    * Scale shape: one (group, token) count aggregation; the rank window is
    * PARTITIONED by group and cut at topK; the moments reduce to one row
    * per group. Nothing global. */
  def zipfFit(docs: DataFrame, idCol: String, groupCol: String,
              textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = tokens(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .select(col(groupCol), explode(col("toks")).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("tok").asc)
    val xy = f.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(groupCol),
        round(log(col("rank").cast("double")), 9).cast("decimal(12,9)").as("x"),
        round(log(col("cnt").cast("double")), 9).cast("decimal(12,9)").as("y"))
    val a = xy.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).cast("decimal(14,9)").as("sx"),
        sum(col("y")).cast("decimal(14,9)").as("sy"),
        sum((col("x") * col("y")).cast("decimal(25,18)")).cast("decimal(24,18)").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(25,18)")).cast("decimal(24,18)").as("sxx"))
    val nDec = col("n_terms").cast("decimal(6,0)")
    val slope = (nDec * col("sxy") - col("sx") * col("sy")).cast("double") /
      (nDec * col("sxx") - col("sx") * col("sx")).cast("double")
    a.select(col(groupCol), col("n_terms"), slope.as("__slope"),
        col("sx"), col("sy"))
      .select(col(groupCol), col("n_terms"), Num.zround6(col("__slope")).as("slope"),
        Num.zround6(col("sy").cast("double") / col("n_terms")
          - col("__slope") * (col("sx").cast("double") / col("n_terms")))
          .as("intercept"))
  }

  /** Intra-document repetition removal: drop repeated token chunks WITHIN a
    * document, keeping each chunk's FIRST occurrence in original order —
    * the within-doc half of repetition cleaning (Gopher §A.1.1's duplicate
    * paragraph/line rules; [[removeBoilerplate]] is the cross-doc half).
    * Returns (id, text_clean, n_chunks, n_removed).
    *
    * Scale shape: per-doc work only — one explode + two (id[, chunk])
    * aggregations, all partitioned on doc id; no window, no global state.
    * The reassembly sorts each doc's surviving chunk positions inside
    * `array_sort` (per-row, not a plan sort). */
  def intraDocDedup(docs: DataFrame, idCol: String, textCol: String,
                    chunk: Int): DataFrame = {
    val ch = tokens(docs, idCol, textCol)
      .select(col(idCol),
        TextFunctions.chunkTokens(col("toks"), chunk, chunk).as("chunks"))
    ch.select(col(idCol), posexplode(col("chunks")).as(Seq("pos", "c")))
      .groupBy(col(idCol), col("c"))
      .agg(min(col("pos")).as("pos"), count(lit(1)).as("occ"))
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c"))).as("text_clean"),
        sum(col("occ")).cast("long").as("n_chunks"),
        (sum(col("occ")) - count(lit(1))).cast("long").as("n_removed"))
  }
}
