package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sequence packing and dataset mixing — the last-mile operators between a
  * cleaned corpus and a training run.
  *
  * Packing models the standard concat-then-split pretraining layout: docs
  * are concatenated in a deterministic order and the stream is cut into
  * fixed token-budget blocks; a doc's block is where its first token lands.
  * A single global concatenation order would need one unpartitioned window
  * (the classic scale cliff), so the corpus is first split into `buckets`
  * disjoint md5 streams and each bucket packs independently — training
  * consumes blocks in any order, so cross-bucket order carries no meaning.
  * Shape at 100 TB: one narrow map for the hash/token count, one window
  * partitioned by bucket (each bucket a parallel running sum), no other
  * shuffle.
  *
  * Mixing is deterministic hash sampling: keep a row iff a uniform hash of
  * its id falls under the rate for its stratum (language, source, ...) —
  * reproducible across runs/engines, no shuffle at all, exact in
  * expectation. The md5-derived uniform is the same arithmetic the MinHash
  * oracle family uses, so DuckDB replays it bit-for-bit.
  */
object Packing {

  /** Uniform integer in [0, 2^16) from the first 4 md5 hex digits of a
    * column's string form — portable to the DuckDB oracle. */
  def hash16(c: Column): Column = conv(substring(md5(c.cast("string")), 1, 4), 16, 10)
    .cast("long")

  /** Assign each doc to (bucket, block): md5-bucketed streams, each packed
    * greedily in ascending id order; `block` = floor(tokens-before / budget)
    * — the training block containing the doc's FIRST token (docs may
    * straddle into the next block, exactly like concat-then-split). Returns
    * (idCol, n_tokens, bucket, block). */
  def packBlocks(docs: DataFrame, idCol: String, textCol: String,
                 budget: Int, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val counted = docs.select(col(idCol),
      size(TextFunctions.tokenize(col(textCol))).cast("long").as("n_tokens"),
      (hash16(col(idCol)) % buckets).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("block",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("block"))
  }

  /** Deterministic stratified sampling for dataset mixing: keep a row iff
    * hash16(id)/65536 < rate(stratum). `rates` maps stratum values to keep
    * rates in [0,1]; strata without an entry keep `defaultRate`. */
  def mixSample(df: DataFrame, idCol: String, stratumCol: Column,
                rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((k, r), els) =>
      when(stratumCol === k, lit(r)).otherwise(els)
    }
    df.filter(hash16(col(idCol)) < rate * 65536.0)
  }

  /** Temperature-based source mixing (the multilingual-pretraining recipe —
    * Lample & Conneau 2019 §3.1; also the Pile/ROOTS source-weighting
    * shape): stratum s of size n_s (here Σ`sizeCol`) is sampled with
    * probability p_s ∝ n_s^alpha, flattening the natural distribution
    * toward uniform as alpha → 0. With a target corpus fraction f, the
    * per-stratum keep rate is r_s = min(1, f·p_s·N / n_s) — oversampled
    * small sources saturate at 1 (this op never duplicates rows; epoch
    * repetition is the trainer's job). Rates are rounded to 6 decimals
    * BEFORE the hash threshold so both engines cut on identical values.
    *
    * Scale shape: one stratum-count aggregation (|strata| rows), rates
    * derived inside the plan and broadcast back — the corpus side is a
    * zero-shuffle narrow filter, the [[mixSample]] contract with
    * data-derived rates. Returns kept rows as (idCol, stratum, rate). */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: Column,
                     sizeCol: Column, alpha: Double,
                     targetFraction: Double): DataFrame = {
    val sizes = df.groupBy(stratumCol.as("stratum"))
      .agg(sum(sizeCol.cast("long")).as("sz"))
      // n_s^α rounded-6 → DECIMAL so the Σ over strata is EXACT and
      // order-independent — a double Σ would expose engine summation order
      .withColumn("pz",
        round(pow(col("sz").cast("double"), alpha), 6).cast("decimal(28,6)"))
    val tot = sizes.agg(sum(col("sz")).as("n_total"), sum(col("pz")).as("z"))
    val rates = sizes.crossJoin(broadcast(tot)).select(col("stratum"),
      round(least(lit(1.0), lit(targetFraction)
        * col("pz").cast("double") / col("z").cast("double")
        * col("n_total").cast("double") / col("sz").cast("double")), 6)
        .as("rate"))
    df.select(col(idCol), stratumCol.as("stratum"))
      .join(broadcast(rates), Seq("stratum"))
      .filter(hash16(col(idCol)) < col("rate") * 65536.0)
      .select(col(idCol), col("stratum"), col("rate"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * A-Res): each row draws key = −ln(u)/w from a deterministic md5-uniform
    * u ∈ (0, 1] and the k SMALLEST keys win — inclusion probability
    * proportional to weight, reproducible across engines and runs (same u,
    * same key). The principled upgrade of [[mixSample]] for continuous
    * weights (quality scores, importance weights).
    *
    * Scale shape: one narrow map + a global top-k that compiles to
    * TakeOrderedAndProject (per-partition partial top-k) — no shuffle of
    * the full table, no single-partition sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    val u = (hash16(col(idCol)) + 1).cast("double") / 65536.0
    // Round BEFORE the top-k cut: the oracle's ORDER BY binds to its
    // rounded-9 SELECT alias (DuckDB alias resolution), so ranking on the
    // full-precision key could cut a different top-k when two keys differ
    // by <5e-10 at the boundary. Rounding first makes both engines rank,
    // tie-break (id asc), and cut on identical values.
    val key = round(-log(u) / weightCol, 9)
    df.withColumn("key", key)
      .orderBy(col("key").asc, col(idCol).asc).limit(k)
  }

  /** Token-budget curriculum selection: rank docs by a quality score and
    * keep the best until the cumulative token count reaches
    * `frac · total_tokens` — the "fill the training budget with the best
    * data" cut (e.g. the phi-style curated-subset recipe). The kept set is
    * exactly the docs whose tokens-BEFORE (exclusive running sum in
    * (score desc, id asc) order) is under budget, so the boundary doc that
    * straddles the budget is still included — concat-then-split semantics,
    * same as [[packBlocks]].
    *
    * Scale shape: the naive form is one GLOBAL window (sort the corpus by
    * score — the classic single-partition cliff). Instead the score line is
    * cut into `floor(score·100)` interval buckets: a ≤~100·max_score-row
    * histogram carries each bucket's token mass, the strictly-better-bucket
    * cumulative comes from a broadcast inequality self-join of that tiny
    * table (no unpartitioned window anywhere), and the per-doc running sum
    * is a window PARTITIONED by bucket — parallel per-bucket sorts over
    * disjoint score intervals that concatenate into the exact global order
    * (equal scores can never span two buckets). One aggregation + one
    * partitioned window + broadcast joins; the corpus never globally sorts. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
                        frac: Double): DataFrame = {
    // score off the session-pinned token view, then cut the 3-column score
    // table's lineage: it feeds three plan branches (histogram, total,
    // window) and left lazy each would re-run the quality lambdas
    val q = TextFunctions.qualityStructFromToks(col(textCol), col("toks"))
    val s0 = Corpus.tokens(docs, idCol, textCol).select(col(idCol),
      q.getField("n_tokens").cast("long").as("n_tokens"),
      q.getField("mean_token_len").as("score"))
      .localCheckpoint(false)
    val bucketed = s0.withColumn("bucket", floor(col("score") * 100).cast("long"))
    val btot = bucketed.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("bt"))
    val bcum = btot
      .join(broadcast(btot.select(col("bucket").as("hb"), col("bt").as("hbt"))),
        col("hb") > col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("hbt")), lit(0L)).as("cum_before"))
    val tot = s0.agg((sum(col("n_tokens")) * frac).as("budget"))
    val wi = Window.partitionBy(col("bucket"))
      .orderBy(col("score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("intra", sum(col("n_tokens")).over(wi) - col("n_tokens"))
      .join(broadcast(bcum), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .filter((col("cum_before") + col("intra")) < col("budget"))
      .select(col(idCol), col("n_tokens"), col("score"),
        (col("cum_before") + col("intra")).as("tokens_before"))
  }
}
