package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the tokenized corpus.
  *
  * The reference's SEARCH predicate (TEXT_CONTAINS via an external
  * full-text index) is boolean; ranked retrieval is the natural extension
  * a training-data pipeline needs (find the best exemplars for a topic,
  * seed retrieval-augmented mixes). Scoring is Okapi BM25 (Robertson &
  * Walker, public literature) over the session's pinned tokenized-corpus
  * view.
  */
object Search {

  /** BM25 top-k documents for a bag-of-terms query. Returns
    * `(doc_id, score)` — score rounded to 6 decimals BEFORE the top-k cut
    * and tie-broken on doc_id, so the result set is deterministic and
    * engine-independent.
    *
    * Scale shape: the exploded token stream filters to the (tiny, literal)
    * query term list before anything shuffles, so the per-term tf table
    * holds only matching docs; document lengths ride the pinned corpus
    * view; idf (|terms| rows) and the 1-row corpus stats broadcast; the
    * global top-k compiles to TakeOrderedAndProject (per-partition partial
    * top-k, never a single-partition sort). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = Corpus.tokens(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), col("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("tok"),
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)).as("idf"),
        col("avgdl"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(idf), Seq("tok"))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Item-item collaborative filtering (Sarwar et al. 2001; the
    * Amazon-style co-occurrence recommender): items are similar when they
    * co-occur in the same baskets — cosine over the binary basket-item
    * matrix, cos(a,b) = n_ab / √(n_a·n_b) with n_ab the co-basket count
    * and n_x the item's basket frequency. `baskets` = (basketCol, itemCol)
    * rows; returns the top-`k` neighbors per item (score desc, item asc).
    *
    * Scale shape: the basket self-join's fan-out is per-basket-size²,
    * bounded by the in-operator `basketCap` window (degenerate baskets are
    * truncated, never quadratic); pair counts shuffle on the (a, b) key,
    * item frequencies join on their item keys, and the per-item top-k is
    * the row-carrying bounded heap ([[graft.functions.TopK.topKRows]]) —
    * popular items co-occur with ~everything, and a rank window would sort
    * each item's full candidate list; the heap folds map-side and ships
    * exactly k rows per item. Every count is exact; the cosine is a
    * per-row fixed-order double. */
  /** Pinned DERIVED basket-item view: the distinct (basket, item) table
    * feeds three plan branches of [[itemItemCf]] (both self-join sides +
    * the frequency table) — a deployment materializes it once beside the
    * source. Shared with the bench load phase. */
  def basketView(baskets: DataFrame, basketCol: String, itemCol: String): DataFrame =
    graft.core.Pin.pinDerived(
      baskets.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct())

  /** `basketCap` bounds the self-join's quadratic term (the
    * `Dedup.minhashCandidates` bucketCap / `semanticNearDups` cellCap
    * pattern): a degenerate mega-basket (one customer buying every item)
    * would otherwise fan out size² pairs on ONE join key — an unbounded
    * hot partition at 100×. Only the lowest-`i` basketCap items per basket
    * enter pair generation (deterministic, so engine and oracle agree);
    * co-occurrence counts involving a capped basket's dropped items are
    * undercounted — the documented recall trade. Item frequencies (`na`,
    * `nb`) stay exact: `freq` reads the UNCAPPED view. */
  def itemItemCf(baskets: DataFrame, basketCol: String, itemCol: String,
                 k: Int, basketCap: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bi = basketView(baskets, basketCol, itemCol)
    // per-item stats: catalog-sized (distinct items), far smaller than the
    // pair stream that joins it twice — broadcast it when a capped count
    // proves it fits (guide §3.1: broadcast the side that fits; the probe
    // also materializes the lazy checkpoint both broadcast builds reuse).
    // Oversized catalogs fall back to the former shuffle joins.
    val freq = bi.groupBy(col("i")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val freqFits = freq.limit(
      (graft.traverse.Traversals.bfsBroadcastMaxRows + 1).toInt).count() <=
      graft.traverse.Traversals.bfsBroadcastMaxRows
    def stats(df: DataFrame) = if (freqFits) broadcast(df) else df
    val capW = Window.partitionBy(col("b")).orderBy(col("i").asc)
    val capped = bi.withColumn("__rn", row_number().over(capW))
      .filter(col("__rn") <= basketCap).drop("__rn")
    // lazy-checkpointed: both union branches below read ONE materialization
    // of the self-join aggregation (the former plan reused its exchange but
    // ran the final-aggregate stage twice, once per branch)
    val pairs = capped.as("l").join(capped.as("r"),
        col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("ia"), col("r.i").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(false)
    // both directions: a recommender serves neighbors FOR every item
    val sym = pairs.unionByName(pairs.select(col("ib").as("ia"),
      col("ia").as("ib"), col("n_ab")))
    val scored = sym
      .join(stats(freq.select(col("i").as("ia"), col("n").as("na"))), Seq("ia"))
      .join(stats(freq.select(col("i").as("ib"), col("n").as("nb"))), Seq("ib"))
      .withColumn("cos",
        col("n_ab") / sqrt(col("na").cast("double") * col("nb")))
    // per-item top-k via the row-carrying bounded heap, ranked (cos DESC,
    // ib ASC) — identical rows to the row_number window this replaces, but
    // popular items (which co-occur with ~everything) never sort their full
    // candidate list: partials fold map-side and exactly k rows per item
    // cross the shuffle
    graft.functions.TopK.registerKernels(scored)
    scored.groupBy(col("ia"))
      .agg(graft.functions.TopK.topKRows(col("cos"), col("ib"),
        struct(col("ib"), col("n_ab"), col("na"), col("nb"), col("cos")),
        k).as("__tk"))
      .select(col("ia"), posexplode(col("__tk")).as(Seq("__pos", "__t")))
      .select(col("ia"), col("__t.ib").as("ib"), col("__t.n_ab").as("n_ab"),
        col("__t.na").as("na"), col("__t.nb").as("nb"),
        round(col("__t.cos"), 6).as("cos"),
        (col("__pos") + 1).cast("long").as("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): fuse
    * N ranked candidate lists into one ranking by
    * score(d) = Σᵢ 1/(kRrf + rankᵢ(d)) — the standard hybrid-retrieval
    * combiner (sparse BM25 + dense ANN) that needs no score calibration
    * because only RANKS cross lists. Each input is a named (id, score)
    * list; ranks are re-derived per list as (score desc, id asc) so ties
    * break identically in both engines. Per-list contributions are
    * rounded-9 then DECIMAL, so the fused sum is exact and
    * order-independent; `n_lists` counts how many lists surfaced the doc.
    *
    * Scale shape: the inputs are already top-k retriever outputs (bounded:
    * the scalable work — BM25's term-filtered scan, ANN's cell probes —
    * happened upstream), so the rank window partitions by list over O(Σk)
    * rows and the fused groupBy carries at most Σk rows. The final cut
    * compiles to TakeOrderedAndProject. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              scoreCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = lists.map { case (nm, df) =>
      df.select(lit(nm).as("list"), col(idCol).as("__id"),
        col(scoreCol).cast("double").as("__s"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("list"))
      .orderBy(col("__s").desc, col("__id").asc)
    tagged.withColumn("__r", row_number().over(w))
      .select(col("__id"),
        round(lit(1.0) / (lit(kRrf) + col("__r")), 9)
          .cast("decimal(20,9)").as("__c"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).cast("double").as("rrf"),
        count(lit(1)).as("n_lists"))
      .select(col("__id").as(idCol), col("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
