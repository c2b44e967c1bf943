package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** Text/tokenizer functions — the SEARCH-index & analyzer semantic surface of
  * the reference (`.../analyzer/Analyzer.java:22-24`, 8 pluggable analyzers;
  * `GraphIndexTransaction.segmentWords:897`; `Condition.java:94-99`
  * TEXT_CONTAINS / TEXT_CONTAINS_ANY), plus the text-analysis operators a
  * training-data pipeline needs (language id, quality scoring, token counting,
  * fingerprinting).
  *
  * Everything here composes `org.apache.spark.sql.functions` built-ins, so the
  * whole surface stays inside whole-stage codegen — no UDFs.
  */
object TextFunctions {

  /** Default analyzer: lowercase, split on non-alphanumerics, drop empties.
    * (The reference's English analyzer path; CJK analyzers would plug in as
    * alternative tokenize implementations.) */
  def tokenize(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** CJK unigram analyzer: each Han character is its own token; Latin runs
    * tokenize as in [[tokenize]]. The reference plugs external segmenters
    * (`analyzer/AnalyzerFactory.java:34-53` — ansj/jieba/smartcn/…); absent
    * those dictionaries, unigram/bigram segmentation is the standard
    * dictionary-free CJK strategy (Lucene's CJKAnalyzer), expressed as
    * codegen-friendly Spark SQL functions — no UDFs. */
  def tokenizeCjkUnigram(c: Column): Column =
    filter(regexp_extract_all(lower(c), lit("([a-z0-9]+|\\p{IsHan})"), lit(1)),
      t => length(t) > 0)

  /** CJK bigram analyzer: overlapping 2-grams within each Han run (a lone
    * Han char stays a unigram); Latin runs tokenize as in [[tokenize]]. */
  def tokenizeCjkBigram(c: Column): Column = {
    val runs = regexp_extract_all(lower(c), lit("([a-z0-9]+|\\p{IsHan}+)"), lit(1))
    flatten(transform(runs, r =>
      when(r.rlike("^\\p{IsHan}{2,}$"),
        transform(sequence(lit(1), length(r) - 1), i => r.substr(i, lit(2))))
        .otherwise(array(r))))
  }

  /** Public demo wordlist for the dictionary CJK analyzer — deliberately
    * tiny; a production deployment swaps in a real lexicon (the reference
    * loads ansj/jieba dictionaries the same way). Longest-match wins. */
  val cjkDict: Seq[String] = Seq(
    "图数据库", "数据库", "数据", "分词", "引擎", "查询", "索引", "分析")

  /** Dictionary CJK analyzer: greedy forward-maximum-matching (FMM) inside
    * each Han run, longest dictionary word first, unigram fallback; Latin
    * runs tokenize whole (reference `analyzer/Analyzer.segment` with a
    * dictionary segmenter such as `JiebaAnalyzer`/`AnsjAnalyzer`,
    * `AnalyzerFactory.java:34-53`). The sequential scan is expressed with
    * the `aggregate` higher-order function over character positions —
    * per-row state (next position, emitted tokens), no UDF. */
  def tokenizeCjkDict(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, fmmRun(_, dict))

  /** Greedy forward scan of one Han run: at each reachable position take the
    * longest dictionary word (unigram fallback). */
  private def fmmRun(r: Column, dict: Seq[String]): Column = {
    val byLen = dict.groupBy(_.length).toSeq.sortBy(-_._1)
    def matchLen(i: Column): Column =
      byLen.foldRight(lit(1): Column) { case ((n, ws), els) =>
        when(r.substr(i, lit(n)).isin(ws: _*), lit(n)).otherwise(els)
      }
    val empty = array_remove(array(lit("")), "")
    aggregate(
      sequence(lit(1), length(r)),
      struct(lit(1).as("next"), empty.as("toks")),
      (st, i) => {
        val ml = matchLen(i)
        when(i === st.getField("next"),
          struct((st.getField("next") + ml).as("next"),
            concat(st.getField("toks"), array(r.substr(i, ml))).as("toks")))
          .otherwise(st)
      },
      st => st.getField("toks"))
  }

  /** Split into (latin-run | han-run) tokens and segment each Han run. */
  private def overHanRuns(c: Column, seg: Column => Column): Column = {
    val runs = regexp_extract_all(lower(c), lit("([a-z0-9]+|\\p{IsHan}+)"), lit(1))
    flatten(transform(runs, r =>
      when(r.rlike("^\\p{IsHan}+$"), seg(r)).otherwise(array(r))))
  }

  /** Reverse-maximum-matching (RMM) dictionary analyzer — the classic
    * complement to [[tokenizeCjkDict]]'s FMM (real segmenter suites ship
    * both; RMM resolves right-anchored compounds FMM splits wrong, e.g.
    * dict {AB, BC} on "ABC": FMM → [AB, C], RMM → [A, BC]). Same
    * `aggregate`-over-positions machinery, scanning right-to-left with the
    * longest dictionary word ENDING at the boundary; tokens are collected
    * reversed and flipped at the finish. */
  def tokenizeCjkDictRmm(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, rmmRun(_, dict))

  /** Greedy backward scan of one Han run: longest dictionary word ENDING at
    * each reachable boundary; tokens collected reversed, flipped at finish. */
  private def rmmRun(r: Column, dict: Seq[String]): Column = {
    val byLen = dict.groupBy(_.length).toSeq.sortBy(-_._1)
    // longest dict word ending at position j (1-based, inclusive)
    def matchLen(j: Column): Column =
      byLen.foldRight(lit(1): Column) { case ((n, ws), els) =>
        when(j >= n && r.substr(j - n + 1, lit(n)).isin(ws: _*), lit(n))
          .otherwise(els)
      }
    val empty = array_remove(array(lit("")), "")
    aggregate(
      sequence(length(r), lit(1), lit(-1)),
      struct(length(r).as("end"), empty.as("toks")),
      (st, j) => {
        val ml = matchLen(j)
        when(j === st.getField("end"),
          struct((st.getField("end") - ml).as("end"),
            concat(st.getField("toks"),
              array(r.substr(j - ml + 1, ml))).as("toks")))
          .otherwise(st)
      },
      st => reverse(st.getField("toks")))
  }

  /** Bidirectional maximum matching (BiMM) — the standard disambiguation
    * over FMM and RMM (what mmseg-style segmenters the reference plugs in
    * do, `AnalyzerFactory.java:34-53`): segment each Han run BOTH ways and
    * keep the better candidate — fewer tokens wins; on a tie, fewer
    * single-character tokens; on a full tie, RMM (empirically the stronger
    * default for Chinese). Pure Column composition — both scans and the
    * vote stay inside codegen. */
  def tokenizeCjkDictBi(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, { r =>
      val f = fmmRun(r, dict)
      val m = rmmRun(r, dict)
      def singles(a: Column): Column = size(filter(a, t => length(t) === 1))
      when(size(f) < size(m), f)
        .when(size(m) < size(f), m)
        .when(singles(f) < singles(m), f)
        .otherwise(m)
    })

  /** Mmseg-style "complex" dictionary analyzer (Tsai's MMSEG — the
    * algorithm family behind the mmseg4j segmenter the reference plugs in,
    * `AnalyzerFactory.java:34-53`): at each position enumerate every chunk
    * of up to THREE consecutive dictionary words and keep the first word of
    * the best chunk, ranked by (1) greatest total length, (2) greatest
    * average word length, (3) smallest variance of word lengths — the
    * classic fix for FMM's greedy mistakes (dict {研究, 研究生, 生命, 起源}
    * on "研究生命起源": FMM → [研究生, 命, 起源]; mmseg's even (2,2,2)
    * chunk beats the (3,1,2) one on variance → [研究, 生命, 起源]).
    * Scoring stays in INTEGERS so the DuckDB oracle reproduces it exactly:
    * with total tied, max-average = min word count; with both tied,
    * variance order = Σlen² order (var = (n·Σl² − t²)/n², n and t fixed).
    * Final tie-break: longest first word. Same `aggregate`-over-positions
    * machinery as [[tokenizeCjkDict]] — pure Column composition. */
  def tokenizeCjkMmseg(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, mmsegRun(_, dict))

  private def mmsegRun(r: Column, dict: Seq[String]): Column = {
    val byLen = dict.groupBy(_.length).toSeq.sortBy(-_._1)
    val noInts = array_remove(array(lit(0)), 0)
    // all candidate word lengths at 1-based position p: every dictionary
    // word matching there, plus the single-char fallback; [0] past the end
    // (a placeholder "no word" slot so 1- and 2-word chunks enumerate)
    def lensAt(p: Column): Column = {
      val words = byLen.map { case (n, ws) =>
        when(r.substr(p, lit(n)).isin(ws: _*), array(lit(n))).otherwise(noInts)
      }
      val single = when(p <= length(r), array(lit(1))).otherwise(array(lit(0)))
      concat((words :+ single): _*)
    }
    val empty = array_remove(array(lit("")), "")
    aggregate(
      sequence(lit(1), length(r)),
      struct(lit(1).as("next"), empty.as("toks")),
      (st, i) => {
        val combos = flatten(transform(lensAt(i), l1 =>
          flatten(transform(lensAt(i + l1), l2 =>
            transform(lensAt(i + l1 + l2), l3 => {
              val total = l1 + l2 + l3
              val nw = when(l2 > lit(0),
                when(l3 > lit(0), lit(3)).otherwise(lit(2))).otherwise(lit(1))
              struct((total * -1).as("nt"), nw.as("nw"),
                (l1 * l1 + l2 * l2 + l3 * l3).as("ss"), (l1 * -1).as("nl1"))
            })))))
        val ml = array_min(combos).getField("nl1") * -1
        when(i === st.getField("next"),
          struct((st.getField("next") + ml).as("next"),
            concat(st.getField("toks"), array(r.substr(i, ml))).as("toks")))
          .otherwise(st)
      },
      st => st.getField("toks"))
  }

  /** Index-mode dictionary analyzer — the jieba INDEX / `cut_for_search`
    * mode split the reference exposes (`analyzer/JiebaAnalyzer.java:35-38`:
    * SEARCH vs INDEX): segment with FMM, then for every segmented word
    * ALSO emit its in-dictionary sub-words — 2-char sub-grams when the
    * word is longer than 2, 3-char sub-grams when longer than 3, then the
    * word itself (jieba's documented search/index expansion order). Finer
    * index granularity at unchanged segmentation cost; pure Column
    * composition over [[fmmRun]]. */
  def tokenizeCjkDictIndex(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, { r =>
      val empty = array_remove(array(lit("")), "")
      def subs(t: Column, n: Int): Column = {
        val ws = dict.filter(_.length == n)
        if (ws.isEmpty) empty
        else when(length(t) > n,
          filter(transform(sequence(lit(1), length(t) - (n - 1)),
            i => t.substr(i, lit(n))), s => s.isin(ws: _*)))
          .otherwise(empty)
      }
      flatten(transform(fmmRun(r, dict),
        t => concat(subs(t, 2), subs(t, 3), array(t))))
    })

  /** Max-word dictionary analyzer — the IK `max_word` mode the reference
    * exposes (`analyzer/IKAnalyzer.java:37-40`: smart vs max_word): emit
    * EVERY dictionary word starting at every position of a Han run
    * (overlapping allowed, longest first per position), and a single-char
    * token for any position no emitted word covers. The recall-maximizing
    * indexing mode; `smart` corresponds to the disambiguating
    * [[tokenizeCjkDictBi]]/[[tokenizeCjkMmseg]] family. One
    * `aggregate`-over-positions scan tracking the furthest covered
    * position — pure Column, inside codegen. */
  def tokenizeCjkMaxword(c: Column, dict: Seq[String] = cjkDict): Column =
    overHanRuns(c, { r =>
      val byLen = dict.groupBy(_.length).toSeq.sortBy(-_._1)
      val empty = array_remove(array(lit("")), "")
      aggregate(
        sequence(lit(1), length(r)),
        struct(lit(0).as("cover"), empty.as("toks")),
        (st, i) => {
          val ms = byLen.map { case (n, ws) =>
            when(r.substr(i, lit(n)).isin(ws: _*), array(r.substr(i, lit(n))))
              .otherwise(empty)
          }
          val matches = if (ms.isEmpty) empty else concat(ms: _*)
          // longest match at i reaches furthest — byLen is length-desc, so
          // the first hit wins (the fmmRun matchLen pattern)
          val maxEnd = byLen.foldRight(lit(0): Column) { case ((n, ws), els) =>
            when(r.substr(i, lit(n)).isin(ws: _*), i + lit(n) - 1).otherwise(els)
          }
          val single = when(size(matches) === 0 && st.getField("cover") < i,
            array(r.substr(i, lit(1)))).otherwise(empty)
          struct(greatest(st.getField("cover"), maxEnd).as("cover"),
            concat(st.getField("toks"), matches, single).as("toks"))
        },
        st => st.getField("toks"))
    })

  /** Public demo FREQUENCY lexicon for the max-probability analyzer — word
    * → corpus count, the shape of jieba's `dict.txt` (MIT-licensed
    * upstream; counts here are representative magnitudes, the list
    * deliberately tiny — a deployment installs the real 349k-entry table
    * via [[registerFreqDict]]). Carries the classic 研究生命起源
    * ambiguity set (研究生 vs 研究+生命) so specs can certify
    * frequency-based disambiguation beating greedy longest-match. */
  val cjkFreqDict: Seq[(String, Long)] = Seq(
    "图数据库" -> 120L, "数据库" -> 25000L, "数据" -> 52000L,
    "分词" -> 3200L, "引擎" -> 8000L, "查询" -> 15000L, "索引" -> 6000L,
    "分析" -> 30000L, "研究" -> 40000L, "研究生" -> 4000L,
    "生命" -> 18000L, "起源" -> 3000L, "命" -> 2000L, "生" -> 9000L,
    "方法" -> 60000L, "法学" -> 800L, "学" -> 15000L, "的" -> 800000L)

  /** Integer micro-nat log-probabilities for a frequency lexicon:
    * lp(w) = round(ln(freq_w / (Σfreq + 1)) · 1e6) as a LONG, plus the
    * unknown-single-char smoothing score lp(1/(Σfreq+1)). Integer scores
    * make every DP sum EXACT, so the engine's Viterbi and the oracle's
    * exhaustive enumeration agree on argmax with no fp tie ambiguity. */
  def microLogProbs(dict: Seq[(String, Long)]): (Map[String, Long], Long) = {
    val total = dict.map(_._2).sum.toDouble + 1.0
    val lp = dict.map { case (w, f) =>
      w -> math.round(math.log(f / total) * 1e6) }.toMap
    (lp, math.round(math.log(1.0 / total) * 1e6))
  }

  /** Max-probability dictionary analyzer — jieba's EXACT mode (the
    * algorithm of `jieba.calc`/`jieba.cut` without HMM, public MIT
    * implementation; reference plugs the same segmenter via
    * `JiebaAnalyzer`, `AnalyzerFactory.java:34-53`): build the DAG of all
    * dictionary words over each Han run and take the segmentation
    * maximizing Σ log P(w) — frequency disambiguation where greedy
    * FMM/RMM/BiMM guess (研究生命起源 → 研究 生命 起源, not 研究生 命…).
    *
    * Right-to-left Viterbi over character positions as ONE `aggregate`
    * higher-order function: state = the per-position (route score, next
    * hop) table, prepended per step; a second positional `aggregate` walks
    * the table left-to-right to emit tokens. Scores are exact integer
    * micro-nats ([[microLogProbs]]); ties break to the LONGER word at the
    * leftmost divergence (struct max on (score, n)) — mirrored verbatim by
    * the oracle's (score DESC, length-sequence DESC) ranking. Pure Column
    * expressions, no UDF — inside codegen like every other analyzer. */
  def tokenizeCjkFreq(c: Column,
                      dict: Seq[(String, Long)] = cjkFreqDict): Column =
    overHanRuns(c, freqRun(_, dict))

  private def freqRun(r: Column, dict: Seq[(String, Long)]): Column = {
    val (lp, lp1) = microLogProbs(dict)
    val byLen = dict.map(_._1).groupBy(_.length).toSeq.sortBy(-_._1)
    val noRoutes = filter(array(struct(lit(0L).as("score"), lit(0).as("nxt"))),
      _ => lit(false))
    // dict-word score at position j for words of length n (null = no match)
    def wordScore(j: Column, n: Int, ws: Seq[String]): Column =
      ws.foldRight(lit(null).cast("long")) { (w, els) =>
        when(r.substr(j, lit(n)) === w, lit(lp(w))).otherwise(els)
      }
    // Viterbi right-to-left: after step j the state's element i is the
    // (score, nxt) route entry for position j + i - 1; seeded with the
    // virtual end boundary (score 0)
    val dp = aggregate(
      sequence(length(r), lit(1), lit(-1)),
      array(struct(lit(0L).as("score"), lit(0).as("nxt"))),
      (st, j) => {
        val cands = byLen.map { case (n, ws) =>
          val s = wordScore(j, n, ws)
          when(lit(n) <= size(st) && s.isNotNull,
            array(struct((s + element_at(st, n).getField("score")).as("score"),
              lit(n).as("nxt"))))
            .otherwise(noRoutes)
        } :+ array(struct(
          (lit(lp1) + element_at(st, 1).getField("score")).as("score"),
          lit(1).as("nxt"))) // unknown-single fallback, always available
        val best = array_max(concat(cands: _*))
        concat(array(struct(best.getField("score").as("score"),
          best.getField("nxt").as("nxt"))), st)
      },
      st => st)
    // walk the route table left-to-right emitting the chosen words
    val empty = array_remove(array(lit("")), "")
    aggregate(
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
  }

  /** Named FREQUENCY lexicons for [[tokenizeCjkFreq]] — the frequency
    * sibling of [[registerDict]]. */
  private val freqDictRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]()
  freqDictRegistry.put("default", cjkFreqDict)

  def registerFreqDict(name: String, wordFreqs: Seq[(String, Long)]): Unit =
    freqDictRegistry.put(name, wordFreqs)

  /** Stopword-aware analyzer (reference: the pluggable segmenters it loads
    * — smartcn, IKAnalyzer — ship stopword filtering, Lucene `StopFilter`
    * stage): base-analyzer tokens minus a language's stopword list. Stays
    * a pure Column filter — inside codegen like every other analyzer. */
  def tokenizeNoStop(c: Column, lang: String = "en"): Column = {
    val stops = langStopwords.toMap.getOrElse(lang,
      sys.error(s"not exists stopword list: $lang"))
    filter(tokenize(c), t => !t.isin(stops: _*))
  }

  /** Named wordlists for the dictionary analyzer — the reference's
    * per-analyzer dictionary slot (`AnalyzerFactory.java:34-53` constructs
    * each segmenter with its own lexicon; `Analyzer.segment:22-24`).
    * Deployments load real lexicons here; "default" is the demo list. */
  private val dictRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  dictRegistry.put("default", cjkDict)

  def registerDict(name: String, words: Seq[String]): Unit =
    dictRegistry.put(name, words)

  /** Analyzer registry (reference `AnalyzerFactory.analyzer(name, mode)`):
    * tokenizers are named, pluggable Column transforms. The dictionary
    * analyzer is parameterized by wordlist: `"cjk-dict"` uses the default
    * list, `"cjk-dict:<dictName>"` any list installed via [[registerDict]]. */
  val analyzers: Map[String, Column => Column] = Map(
    "english" -> tokenize,
    "cjk-unigram" -> tokenizeCjkUnigram,
    "cjk-bigram" -> tokenizeCjkBigram,
    "cjk-dict" -> (c => tokenizeCjkDict(c)),
    "cjk-dict-rmm" -> (c => tokenizeCjkDictRmm(c)),
    "cjk-dict-bi" -> (c => tokenizeCjkDictBi(c)),
    "cjk-dict-mmseg" -> (c => tokenizeCjkMmseg(c)),
    "cjk-dict-index" -> (c => tokenizeCjkDictIndex(c)),
    "cjk-dict-maxword" -> (c => tokenizeCjkMaxword(c)),
    "cjk-freq" -> (c => tokenizeCjkFreq(c)),
    "english-stop" -> (c => tokenizeNoStop(c)))

  def analyzer(name: String): Column => Column =
    if (name.startsWith("stop:")) {
      // stopword-filtered default analyzer for any installed language list;
      // resolve the list eagerly so an unknown language fails at dispatch
      val lang = name.stripPrefix("stop:")
      if (!langStopwords.exists(_._1 == lang))
        sys.error(s"not exists stopword list: $lang")
      c => tokenizeNoStop(c, lang)
    } else if (name.startsWith("cjk-dict-rmm:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict-rmm:"))
      c => tokenizeCjkDictRmm(c, dict)
    } else if (name.startsWith("cjk-dict-index:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict-index:"))
      c => tokenizeCjkDictIndex(c, dict)
    } else if (name.startsWith("cjk-dict-maxword:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict-maxword:"))
      c => tokenizeCjkMaxword(c, dict)
    } else if (name.startsWith("cjk-dict-mmseg:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict-mmseg:"))
      c => tokenizeCjkMmseg(c, dict)
    } else if (name.startsWith("cjk-freq:")) {
      val dictName = name.stripPrefix("cjk-freq:")
      val dict = Option(freqDictRegistry.get(dictName))
        .getOrElse(sys.error(s"not exists frequency dictionary: $dictName"))
      c => tokenizeCjkFreq(c, dict)
    } else if (name.startsWith("cjk-dict-bi:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict-bi:"))
      c => tokenizeCjkDictBi(c, dict)
    } else if (name.startsWith("cjk-dict:")) {
      val dict = namedDict(name.stripPrefix("cjk-dict:"))
      c => tokenizeCjkDict(c, dict)
    } else analyzers.getOrElse(name, sys.error(s"not exists analyzer: $name"))

  private def namedDict(dictName: String): Seq[String] =
    Option(dictRegistry.get(dictName))
      .getOrElse(sys.error(s"not exists dictionary: $dictName"))

  /** Tokenized word containment (reference `Text.contains`,
    * `.../traversal/optimize/Text.java:23-32`). */
  def textContains(c: Column, word: String): Column =
    array_contains(tokenize(c), word.toLowerCase)

  /** Containment under a named analyzer (CJK-aware). */
  def textContains(c: Column, word: String, analyzerName: String): Column =
    array_contains(analyzer(analyzerName)(c), word.toLowerCase)

  def textContainsAny(c: Column, words: Seq[String]): Column =
    arrays_overlap(tokenize(c), lit(words.map(_.toLowerCase).toArray))

  // ---------------------------------------------------------------- pipeline
  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokenize(c))

  /** BPE-ish sub-token count: letter runs, digit runs, single punctuation. */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpeTokenPattern), lit(0)))

  /** Training-data PII scrub: emails → `<email>`, then URLs → `<url>`,
    * then phone-like digit runs → `<phone>` (order matters — emails carry
    * no scheme, URL digits must be gone before the phone pass). Patterns
    * stay in the RE2-compatible subset so the DuckDB oracle replays them
    * verbatim (with its 'g' flag — Spark replaces all matches by default). */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val phonePattern = "\\+?[0-9][0-9()\\- ]{5,}[0-9]"
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<email>"),
        urlPattern, "<url>"),
      phonePattern, "<phone>")

  /** Stopword sets for the n-gram language-id heuristic. Deterministic and
    * tiny on purpose — the point is the distributed shape, not NLP quality. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "que", "est", "un"))

  /** Language-ID: argmax over per-language stopword hit counts; ties broken
    * by the fixed language order above; no hits at all → "und" (undetermined). */
  def langId(c: Column): Column = langIdFromToks(tokenize(c))

  /** langId over an ALREADY-MATERIALIZED token array column — the hot-path
    * variant: four per-language filters over `tokenize(text)` would make
    * Catalyst re-run the tokenizer once per language. */
  def langIdFromToks(toks: Column): Column = {
    val scores = langStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Quality features: chars, tokens, mean token length, punctuation ratio,
    * stopword ratio, and a composite score in [0,1]. */
  def qualityStruct(c: Column): Column = qualityStructFromToks(c, tokenize(c))

  /** qualityStruct over a pre-materialized token column (hot-path twin). */
  def qualityStructFromToks(c: Column, toks: Column): Column = {
    val nChars = length(c).cast("double")
    val nToks = size(toks).cast("double")
    val punct = length(regexp_replace(lower(c), "[a-z0-9\\s]", "")).cast("double")
    val stop = size(filter(toks,
      t => t.isin(langStopwords.flatMap(_._2).distinct: _*))).cast("double")
    val meanTokLen = when(nToks > 0, aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nToks).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stopRatio = when(nToks > 0, stop / nToks).otherwise(lit(0.0))
    struct(
      nChars.as("n_chars"), nToks.as("n_tokens"),
      round(meanTokLen, 4).as("mean_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"))
  }

  /** Content-defined fingerprint: md5 over the sorted distinct token set —
    * order-insensitive near-exact dedup key. */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokenize(c)))))

  /** Shingles from an ALREADY-MATERIALIZED token array column. Callers on a
    * hot path must stage the token array first (select + localCheckpoint):
    * passing `tokenize(text)` directly makes Catalyst re-evaluate the
    * tokenizer inside every lambda invocation — O(tokens²) splits per doc. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(rawShinglesFromTokens(toks, n))

  /** RAW (non-distinct, in-order) word n-gram shingles — repetition
    * analysis needs the multiset the dedup path throws away. */
  def rawShinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    .otherwise(array(concat_ws(" ", toks)))

  /** Context-window packing: split a token array into chunks of `size`
    * tokens starting every `stride` tokens (overlap = size − stride),
    * re-joined to text. Partial tail chunks are kept — downstream packing
    * decides whether to drop or pad them. Empty token arrays chunk to
    * nothing. */
  def chunkTokens(toks: Column, size: Int, stride: Int): Column = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    when(F.size(toks) >= 1,
      transform(sequence(lit(1), F.size(toks), lit(stride)),
        st => concat_ws(" ", slice(toks, st, lit(size)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Repetition signal (the Gopher-style duplicate-n-gram quality rule):
    * fraction of n-gram occurrences that repeat an earlier one,
    * 1 − distinct/total, rounded to 4 decimals. The fallback shingle for
    * sub-n docs makes the denominator ≥ 1 by construction. */
  def repetitionRatio(toks: Column, n: Int): Column = {
    val sh = rawShinglesFromTokens(toks, n)
    round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 4)
  }

  /** Word n-gram shingles (arrays of `n` consecutive tokens joined by space).
    * Convenience form — see [[shinglesFromTokens]] for the hot-path variant. */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(tokenize(c), n)
}
