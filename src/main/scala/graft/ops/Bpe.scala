package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed operator (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — the word-frequency variant every BPE/WordPiece trainer uses):
  * start from the corpus word-frequency table with each word split into
  * characters, then `merges` rounds of (count adjacent symbol pairs
  * weighted by word frequency → merge the most frequent pair, ties broken
  * lexicographically, in every word left-to-right non-overlapping).
  *
  * Determinism contract: the argmax tie-break is (count desc, a asc,
  * b asc) and the in-word merge is a left-to-right fold — both exactly
  * reproducible by the oracle's unrolled-CTE twin (`list_reduce` over the
  * same space-joined symbol encoding; symbols never contain spaces, so the
  * encoding is lossless).
  *
  * Scale shape: training runs on the DISTINCT-WORD table (Zipf: vocabulary
  * ≪ corpus — the 100 TB corpus collapses to a vocab-sized working set in
  * one map-side-combined count), pinned once; each BARRIER is one bounded
  * pair aggregation + a TakeOrdered(batch+1) argmax + a narrow fold over
  * the vocab rows, and applies up to `batch` merges (exactness-gated — see
  * [[train]]), cutting driver round-trips ~batch×. The winning pairs are a
  * ≤batch-row driver literal per barrier — the same trained-artifact
  * discipline as `Ann.kmeansCentroids`. The corpus itself is touched
  * exactly once (the word count); [[encodeStats]] touches it a second time
  * through the pinned token view, with the trained per-word symbol counts
  * joined back on the word key.
  */
object Bpe {

  /** One learned merge: round (1-based), the pair, and its weighted count. */
  final case class Merge(round: Int, symA: String, symB: String, pairCount: Long)

  /** batches closed by the symbol-aliasing guard (test/observability hook) */
  private[graft] val aliasClosures = new java.util.concurrent.atomic.AtomicLong

  /** The exactness-gated batch acceptance over one collected pair window —
    * pure driver-side logic (unit-testable): `top` is the (count desc,
    * a asc, b asc)-ordered window, `want` the max batch, `knownConcats`
    * the concatenations of every previously learned merge (= every
    * multi-char symbol string that can exist), `floorOutside` the bound on
    * uncollected counts. Returns the accepted prefix per the [[train]]
    * proof sketch, CLOSING the batch right after any accepted merge whose
    * concatenation aliases a known symbol (its application could boost
    * pairs the disjoint/sharedMax bounds cannot see). */
  private[graft] def acceptBatch(top: Seq[(String, String, Long)], want: Int,
                                 knownConcats: Set[String],
                                 floorOutside: Long): Seq[(String, String, Long)] = {
    val accepted = scala.collection.mutable.ListBuffer(top.head)
    val acceptedSyms = scala.collection.mutable.Set(top.head._1, top.head._2)
    val batchConcats = scala.collection.mutable.Set(top.head._1 + top.head._2)
    var open = !knownConcats.contains(top.head._1 + top.head._2)
    if (!open) aliasClosures.incrementAndGet()
    for (i <- 1 until math.min(top.length, want) if open) {
      val p @ (a, b, c) = top(i)
      val disjoint = !acceptedSyms(a) && !acceptedSyms(b)
      val sharedMax = top.iterator
        .filterNot(accepted.contains).filterNot(_ == p)
        .filter(q => acceptedSyms(q._1) || acceptedSyms(q._2))
        .map(_._3).maxOption.getOrElse(0L)
      if (disjoint && c > math.max(sharedMax, floorOutside)) {
        // accepted on pre-batch counts (sound); but if its concatenation
        // aliases an existing symbol — from history or from an earlier
        // acceptance in THIS batch — nothing after it may use these counts
        if (knownConcats.contains(a + b) || batchConcats.contains(a + b)) {
          aliasClosures.incrementAndGet(); open = false
        }
        accepted += p; acceptedSyms += a; acceptedSyms += b
        batchConcats += a + b
      } else open = false
    }
    accepted.toSeq
  }

  /** The pinned (word, cnt, syms) vocabulary table: corpus word frequencies
    * with character-split symbol arrays. */
  def vocab(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Pin.pinDerived(
      Corpus.tokens(docs, idCol, textCol)
        .select(explode(col("toks")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("syms", filter(split(col("word"), ""), s => length(s) > 0)))

  /** Left-to-right non-overlapping merge of pair (a, b) in a symbol array,
    * as a codegen-able fold over the space-joined encoding (symbols are
    * space-free by construction). */
  private def mergeFold(syms: Column, a: String, b: String): Column = {
    val folded = aggregate(syms, lit(""), (acc, x) =>
      when(acc === "", x)
        .when(element_at(split(acc, " "), -1) === a && x === b,
          concat(acc.substr(lit(1), length(acc) - lit(a.length)), lit(a + b)))
        .otherwise(concat(acc, lit(" "), x)))
    filter(split(folded, " "), s => length(s) > 0)
  }

  /** Adjacent-pair counts of the current symbol table, weighted by word
    * frequency. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // single-symbol words carry no pairs (and Spark's sequence(1, 0)
      // DESCENDS rather than being empty — the guard is load-bearing)
      .filter(size(col("syms")) > 1)
      .select(col("cnt"), col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
      .select(element_at(col("syms"), col("i")).as("a"),
        element_at(col("syms"), col("i") + 1).as("b"), col("cnt"))
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("c"))

  /** Train `merges` BPE merges over the corpus vocabulary. Returns the
    * learned merge list (driver-side — it IS the model artifact) and the
    * final per-word symbol table.
    *
    * Rounds are BATCHED `batch` at a time (one driver barrier per batch
    * instead of per merge — the standard batched-BPE trick), EXACTLY: the
    * batch replays the sequential argmax bit-for-bit. Proof sketch —
    * applying merge (a, b) can only change the counts of pairs SHARING a
    * symbol with it (decreased) or of NEW pairs involving the merged
    * symbol ab, whose count is bounded by some old pair's count that
    * shares a or b. So a collected candidate is accepted iff (1) it is
    * symbol-disjoint from every previously accepted pair in the batch
    * (its own count is then invariant) and (2) its count STRICTLY exceeds
    * every pair that shares a symbol with the accepted set — both the
    * collected ones and the uncollected tail, bounded by the (batch+1)-th
    * collected count (0 when the pair table fit the collect). First
    * rejection ends the batch: later picks would need fresh counts. Ties
    * inside the accepted prefix keep the (count desc, a asc, b asc) order
    * — the same order the sequential loop uses. All accepted merges apply
    * in ONE projection (disjoint ⇒ order-free), one lineage cut.
    *
    * SYMBOL-ALIASING closure: the sketch above assumes the merged symbol
    * a+b is NEW. When its concatenation string-equals a symbol that
    * already exists (accepting (a, bc) while 'abc' exists from an earlier
    * (ab, c) merge), applying the merge INCREASES counts of existing
    * pairs involving that symbol — pairs that share no symbol with the
    * accepted set, so neither the disjointness check nor the
    * sharedMax/floorOutside bounds see them. Every multi-character symbol
    * is the concatenation of some learned merge, so the alias test is a
    * driver-side set lookup: a batch CLOSES right after accepting a merge
    * whose concatenation is a previously learned (or earlier-in-batch)
    * concatenation — the accepted merge itself is still the true argmax
    * (its count was read pre-merge), but everything after it would need
    * fresh counts. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            merges: Int, batch: Int = 4): (Seq[Merge], DataFrame) = {
    require(batch >= 1, "batch must be >= 1")
    // session-memoized per (pinned vocab plan, merges, batch) — the merge
    // table is a TRAINED ARTIFACT (a deployment trains its tokenizer once
    // and serves encodes from it), the same discipline as
    // Ann.kmeansCentroids / Corpus.trainQualityClassifier: without the
    // memo every consumer (q_bpe_merges AND q_bpe_encode) re-ran the full
    // batched-argmax training loop
    // PLAN-keyed (semanticHash bucket + sameResult probe, the Pin.PlanMemo
    // discipline): a reference key only worked because vocab() routes
    // through pinDerived — an equivalent vocab frame built without it
    // would have silently re-trained (r15 ADVICE).
    val vkey = vocab(docs, idCol, textCol)
    val plan = vkey.queryExecution.analyzed
    val bucket = trainMemo.computeIfAbsent(
      (plan.semanticHash(), merges, batch),
      _ => new java.util.concurrent.CopyOnWriteArrayList[
        (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          (Seq[Merge], DataFrame))]())
    bucket.synchronized {
      var hit: (Seq[Merge], DataFrame) = null
      bucket.forEach { case (p, r) => if (hit == null && p.sameResult(plan)) hit = r }
      if (hit == null) {
        hit = trainUncached(vkey, merges, batch)
        bucket.add((plan, hit))
      }
      hit
    }
  }

  private val trainMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), java.util.concurrent.CopyOnWriteArrayList[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        (Seq[Merge], DataFrame))]]()

  graft.core.Pin.onClear(() => trainMemo.clear())

  private def trainUncached(vocabWords: DataFrame, merges: Int,
                            batch: Int): (Seq[Merge], DataFrame) = {
    var words = vocabWords
    val learned = Seq.newBuilder[Merge]
    // every multi-char symbol ever created = the concatenation of some
    // learned merge — the alias-closure test set (see the scaladoc)
    val knownConcats = scala.collection.mutable.Set.empty[String]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val want = math.min(batch, merges - r + 1)
      val k = want + 1 // the extra row bounds the uncollected tail
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("a").asc, col("b").asc).limit(k)
        .collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val floorOutside = if (top.length == k) top.last._3 else 0L
        val accepted = acceptBatch(top.toSeq, want, knownConcats.toSet, floorOutside)
        knownConcats ++= accepted.map(p => p._1 + p._2)
        accepted.zipWithIndex.foreach { case ((a, b, c), j) =>
          learned += Merge(r + j, a, b, c)
        }
        words = words
          .withColumn("syms", accepted.foldLeft(col("syms")) {
            case (s, (a, b, _)) => mergeFold(s, a, b)
          })
          .localCheckpoint(false)
        r += accepted.size
      }
    }
    (learned.result(), words)
  }

  /** The learned merge table as a DataFrame — the verifiable training
    * artifact `(round, sym_a, sym_b, pair_count)`. */
  def merges(docs: DataFrame, idCol: String, textCol: String,
             nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, idCol, textCol, nMerges)._1
      .toDF("round", "sym_a", "sym_b", "pair_count")
      .select(col("round").cast("long").as("round"), col("sym_a"),
        col("sym_b"), col("pair_count"))
  }

  /** Per-document encoding statistics under the trained merges: characters
    * in, BPE tokens out — the compression-ratio gauge a tokenizer bake-off
    * reads. The trained per-word symbol counts join the token stream on the
    * word key (vocab-sized build side — broadcastable at Zipf scale). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  nMerges: Int): DataFrame = {
    val (_, words) = train(docs, idCol, textCol, nMerges)
    val wl = words.select(col("word"),
      length(col("word")).cast("long").as("n_chars_w"),
      size(col("syms")).cast("long").as("n_syms_w"))
    Corpus.tokens(docs, idCol, textCol)
      .select(col(idCol), explode(col("toks")).as("word"))
      .join(broadcast(wl), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars_w")).as("n_chars"),
        sum(col("n_syms_w")).as("n_bpe_tokens"))
      .select(col(idCol), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
          .as("chars_per_token"))
  }
}
