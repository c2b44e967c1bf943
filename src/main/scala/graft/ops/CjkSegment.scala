package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Max-probability CJK segmentation against a PRODUCTION-WIDTH frequency
  * lexicon held as broadcast DATA — the scale form of
  * [[graft.functions.TextFunctions.tokenizeCjkFreq]], whose expression-tree
  * dictionary is the right shape for demo lexicons but cannot carry the
  * 250k-entry table a deployment installs (reference
  * `analyzer/AnalyzerFactory.java:34-53` wires exactly such shipped
  * lexicons into its pluggable segmenters).
  *
  * Dataflow (the 100 TB shape): Han runs explode to candidate substrings
  * (run-length × `maxLen` rows), ONE broadcast hash join against the
  * (word, lp) lexicon scores them — the lexicon is a classic broadcast
  * dimension (a few MB) and the corpus side never shuffles for the lookup —
  * then one (doc, run)-keyed aggregation packs the matched edges and a pure
  * Column `aggregate` runs the same right-to-left integer Viterbi as
  * `freqRun`: exact LONG scores, ties to the longer word at the leftmost
  * divergence (struct max on (score, nxt)), unknown single characters at
  * `unknownScore`. No UDFs; the DP is codegen'd like every analyzer.
  *
  * Run extraction mirrors `TextFunctions.overHanRuns` (lowercase, runs =
  * `[a-z0-9]+ | Han+`; non-Han runs pass through as single tokens), so this
  * operator drops into the same queries the analyzer registry serves.
  * Per-run DP cost is O(len · maxLen²): edges are indexed BY POSITION once
  * per row, so each DP step scans ≤maxLen candidate entries, and the
  * inter-punctuation-span bound on `len` is ENFORCED, not assumed — Han
  * runs are chunked at [[runCap]] chars in the extraction regex, so an
  * adversarial unpunctuated Han-spam document costs the same per char as
  * real text (a word straddling a chunk boundary splits; real
  * inter-punctuation spans are far below the cap, so the cap is
  * semantics-neutral on real text). */
object CjkSegment {

  /** Enforced upper bound on a Han run entering the per-row DP. cjdict's
    * longest entries are single idioms (≤16 chars); 256 leaves real text
    * untouched while capping the degenerate-run DP at runCap·maxLen². */
  val runCap = 256

  /** Segment `textCol` of `docs`: returns (idCol, toks) with toks the
    * space-joined token stream. `lex` must be (word string, lp long) with
    * larger lp = more probable; entries longer than `maxLen` are ignored
    * (documented cap — cjdict has 24 entries past length 6). */
  def segment(docs: DataFrame, idCol: String, textCol: Column,
              lex: DataFrame, maxLen: Int, unknownScore: Long): DataFrame = {
    val runs = docs
      .select(col(idCol), posexplode(
        regexp_extract_all(lower(textCol),
          lit(s"([a-z0-9]+|\\p{IsHan}{1,$runCap})"), lit(1)))
        .as(Seq("ord", "r")))
    val han = runs.filter(col("r").rlike("^\\p{IsHan}+$"))

    // candidate edges: every (pos, len<=maxLen) substring that is a lexicon
    // word, scored by the broadcast join — the corpus side stays put
    val cand = han
      .select(col(idCol), col("ord"), col("r"),
        explode(sequence(lit(1), length(col("r")))).as("pos"))
      .select(col(idCol), col("ord"), col("r"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("r")) - col("pos") + 1))).as("n"))
      .withColumn("w", col("r").substr(col("pos"), col("n")))
      .join(broadcast(lex.filter(length(col("word")) <= maxLen)
        .select(col("word").as("w"), col("lp"))), Seq("w"))
    val edged = han.join(
      cand.groupBy(col(idCol), col("ord"), col("r"))
        .agg(collect_list(struct(col("pos"), col("n"), col("lp"))).as("edges")),
      Seq(idCol, "ord", "r"), "left")
      .withColumn("edges", coalesce(col("edges"),
        array().cast("array<struct<pos:int,n:int,lp:bigint>>")))
      // position index, built ONCE per row (len·|edges| total): without it
      // every (j, n) lookup re-scanned the full edge array, making the DP
      // O(len²·maxLen²) on a long Han run — a real Column so codegen
      // evaluates it once, not an inlined subtree per lookup
      .withColumn("byPos", transform(sequence(lit(1), length(col("r"))),
        j => filter(col("edges"), e => e.getField("pos") === j)))

    // --- the freqRun Viterbi, with scores read from the position index ---
    val r = col("r")
    val noRoutes = filter(array(struct(lit(0L).as("score"), lit(0).as("nxt"))),
      _ => lit(false))
    def lpOf(j: Column, n: Int): Column = {
      val hits = filter(element_at(col("byPos"), j),
        e => e.getField("n") === lit(n))
      when(size(hits) > 0, element_at(hits, 1).getField("lp"))
        .otherwise(lit(null).cast("long"))
    }
    val dp = aggregate(
      sequence(length(r), lit(1), lit(-1)),
      array(struct(lit(0L).as("score"), lit(0).as("nxt"))),
      (st, j) => {
        val cands = (1 to maxLen).map { n =>
          val s = lpOf(j, n)
          when(lit(n) <= size(st) && s.isNotNull,
            array(struct((s + element_at(st, n).getField("score")).as("score"),
              lit(n).as("nxt"))))
            .otherwise(noRoutes)
        } :+ array(struct(
          (lit(unknownScore) + element_at(st, 1).getField("score")).as("score"),
          lit(1).as("nxt"))) // unknown-single fallback, always available
        val best = array_max(concat(cands: _*))
        concat(array(struct(best.getField("score").as("score"),
          best.getField("nxt").as("nxt"))), st)
      },
      st => st)
    val empty = array_remove(array(lit("")), "")
    val toks = aggregate(
      sequence(lit(1), length(r)),
      struct(lit(1).as("next"), empty.as("toks")),
      (w, i) => {
        val n = element_at(dp, i).getField("nxt")
        when(i === w.getField("next"),
          struct((w.getField("next") + n).as("next"),
            concat(w.getField("toks"), array(r.substr(i, n))).as("toks")))
          .otherwise(w)
      },
      w => w.getField("toks"))

    val segged = edged.select(col(idCol), col("ord"), toks.as("toks"))
    val passthrough = runs.filter(!col("r").rlike("^\\p{IsHan}+$"))
      .select(col(idCol), col("ord"), array(col("r")).as("toks"))
    segged.unionByName(passthrough)
      .groupBy(col(idCol))
      .agg(concat_ws(" ", flatten(array_sort(
        collect_list(struct(col("ord"), col("toks")))).getField("toks")))
        .as("toks"))
  }
}
