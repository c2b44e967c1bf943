package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** End-to-end corpus cleaning — the composed training-data pipeline:
  * exact-dedup → near-dedup (MinHash+LSH) → quality gate → language
  * distribution. Each stage is the already-verified operator; this module is
  * the composition a 100 TB data-curation job would run.
  *
  * Dedup policy: within an exact or near-duplicate pair, the SMALLER doc_id
  * survives (deterministic canonical pick; near-dup removal drops `b` of
  * every surviving (a<b) pair transitively via one pass — pairs are already
  * exact-verified ≥ threshold).
  */
object CorpusPipeline {

  final case class Params(
      ngram: Int = 3, k: Int = 12, bands: Int = 6, rows: Int = 2,
      nearDupThreshold: Double = 0.5,
      minTokens: Int = 10, maxStopwordRatio: Double = 0.9)

  /** Surviving documents with quality features attached. */
  def cleaned(docs: DataFrame, p: Params = Params()): DataFrame = {
    // 1. exact dedup: keep min doc_id per content hash
    // derived-pinned: referenced by BOTH the minhash stage and the left_anti
    // survivor join, and it is the input plan the downstream token/signature
    // pins key on — recomputing it would fork the whole derived chain
    val canonical = graft.core.Pin.pinDerived(docs
      .withColumn("__h", md5(col("text")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
          .orderBy(col("doc_id").asc)))
      .filter(col("__rk") === 1).drop("__h", "__rk"))
    // 2. near-dedup among the exact-dedup survivors: signatures come from
    // the BASE corpus's session-shared token/shingle/signature pins
    // (identical per-row values — see minhashNearDups' `among` contract),
    // filtered to canonical ids; without the sharing, the pipeline forked
    // its own canonical-keyed pins and re-tokenized+re-hashed the whole
    // corpus in-query.
    val nearDupLosers = Dedup.minhashNearDups(docs, "doc_id", "text",
        p.ngram, p.k, p.bands, p.rows, p.nearDupThreshold,
        among = Some(canonical.select(col("doc_id"))))
      .select(col("b").as("doc_id")).distinct()
    val deduped = canonical.join(nearDupLosers, Seq("doc_id"), "left_anti")
    // 3. quality gate — tokens joined in from the BASE corpus's pinned
    // view (the inner join restricts to survivors; per-row equal to
    // tokenizing the survivor set directly)
    val withToks = deduped
      .join(Corpus.tokens(docs, "doc_id", "text").select(col("doc_id"), col("toks")),
        Seq("doc_id"))
    withToks
      .withColumn("q", TextFunctions.qualityStructFromToks(col("text"), col("toks")))
      .filter(col("q.n_tokens") >= p.minTokens &&
        col("q.stopword_ratio") <= p.maxStopwordRatio)
  }

  /** The pipeline's summary: surviving docs per predicted language. */
  def langDistribution(docs: DataFrame, p: Params = Params()): DataFrame =
    cleaned(docs, p)
      .withColumn("lang_pred", TextFunctions.langIdFromToks(col("toks")))
      .groupBy(col("lang_pred")).agg(count(lit(1)).as("n_docs"))
}
