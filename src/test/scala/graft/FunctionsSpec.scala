package graft

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize lowercases and splits on non-alnum") {
    val got = Seq("Hello, World! 42-foo").toDF("text")
      .select(TextFunctions.tokenize(col("text"))).head().getSeq[String](0)
    assert(got === Seq("hello", "world", "42", "foo"))
  }

  test("textContains matches whole tokens only") {
    val df = Seq("a widget factory", "widgets only").toDF("t")
    assert(df.filter(TextFunctions.textContains(col("t"), "widget")).count() === 1L)
  }

  test("CJK unigram analyzer splits Han chars, keeps latin runs") {
    val got = Seq("Spark处理中文text123").toDF("t")
      .select(TextFunctions.tokenizeCjkUnigram(col("t"))).head().getSeq[String](0)
    assert(got === Seq("spark", "处", "理", "中", "文", "text123"))
  }

  test("CJK bigram analyzer emits overlapping 2-grams per Han run") {
    val got = Seq("图数据库用spark分词").toDF("t")
      .select(TextFunctions.tokenizeCjkBigram(col("t"))).head().getSeq[String](0)
    assert(got === Seq("图数", "数据", "据库", "库用", "spark", "分词"))
    // a lone Han char between latin runs stays a unigram
    val lone = Seq("abc中def").toDF("t")
      .select(TextFunctions.tokenizeCjkBigram(col("t"))).head().getSeq[String](0)
    assert(lone === Seq("abc", "中", "def"))
    // pure latin unaffected
    val latin = Seq("Hello World").toDF("t")
      .select(TextFunctions.tokenizeCjkBigram(col("t"))).head().getSeq[String](0)
    assert(latin === Seq("hello", "world"))
  }

  test("CJK dictionary analyzer: greedy longest match with unigram fallback") {
    // 图数据库 is in the dict whole (longest wins over 数据库/数据);
    // 分词 and 引擎 match as words; 很强 falls back to unigrams
    val got = Seq("图数据库分词引擎很强yes").toDF("t")
      .select(TextFunctions.tokenizeCjkDict(col("t"))).head().getSeq[String](0)
    assert(got === Seq("图数据库", "分词", "引擎", "很", "强", "yes"))
    // longest-match is positional: starting mid-word matches the shorter entry
    val mid = Seq("大数据库x").toDF("t")
      .select(TextFunctions.tokenizeCjkDict(col("t"))).head().getSeq[String](0)
    assert(mid === Seq("大", "数据库", "x"))
    // registry dispatch
    assert(Seq("图数据库").toDF("t")
      .filter(TextFunctions.textContains(col("t"), "图数据库", "cjk-dict")).count() === 1L)
  }

  test("analyzer registry dispatches and textContains is analyzer-aware") {
    val df = Seq("图数据库很强").toDF("t")
    assert(df.filter(TextFunctions.textContains(col("t"), "数据", "cjk-bigram")).count() === 1L)
    assert(df.filter(TextFunctions.textContains(col("t"), "数", "cjk-unigram")).count() === 1L)
    intercept[Exception](TextFunctions.analyzer("nope"))
  }

  test("stopword analyzer: drops stopwords where the base analyzer keeps them, per-language") {
    val df = Seq("the cat is in the hat").toDF("t")
    // disagreement with the base analyzer on the same string
    val base = df.select(TextFunctions.analyzer("english")(col("t")))
      .head().getSeq[String](0)
    val stopped = df.select(TextFunctions.analyzer("english-stop")(col("t")))
      .head().getSeq[String](0)
    assert(base === Seq("the", "cat", "is", "in", "the", "hat"))
    assert(stopped === Seq("cat", "hat"))
    // textContains is stopword-aware through the registry
    assert(df.filter(TextFunctions.textContains(col("t"), "the", "english")).count() === 1L)
    assert(df.filter(TextFunctions.textContains(col("t"), "the", "english-stop")).count() === 0L)
    // parameterized per-language lists: 'de' keeps English stopwords
    val deStopped = df.select(TextFunctions.analyzer("stop:de")(col("t")))
      .head().getSeq[String](0)
    assert(deStopped === base)
    intercept[Exception](TextFunctions.analyzer("stop:xx"))
  }

  test("dictionary analyzer: per-registry-entry wordlists disagree on the same string") {
    // lexA knows the compound 数据库; lexB only knows 数据 — same input,
    // different segmentations under "cjk-dict:<name>" dispatch
    TextFunctions.registerDict("lexA", Seq("数据库", "数据"))
    TextFunctions.registerDict("lexB", Seq("数据"))
    val df = Seq("数据库").toDF("t")
    val a = df.select(TextFunctions.analyzer("cjk-dict:lexA")(col("t")))
      .head().getSeq[String](0)
    val b = df.select(TextFunctions.analyzer("cjk-dict:lexB")(col("t")))
      .head().getSeq[String](0)
    assert(a === Seq("数据库"))
    assert(b === Seq("数据", "库"))
    // unknown dictionary name is an error, like an unknown analyzer
    intercept[Exception](TextFunctions.analyzer("cjk-dict:missing"))
  }

  test("RMM analyzer: right-anchored longest match disagrees with FMM where it should") {
    // dict {数据, 据库} over 数据库: FMM eats 数据 first → [数据, 库];
    // RMM matches 据库 ending at the boundary → [数, 据库]
    TextFunctions.registerDict("ambig", Seq("数据", "据库"))
    val df = Seq("数据库").toDF("t")
    val fmm = df.select(TextFunctions.analyzer("cjk-dict:ambig")(col("t")))
      .head().getSeq[String](0)
    val rmm = df.select(TextFunctions.analyzer("cjk-dict-rmm:ambig")(col("t")))
      .head().getSeq[String](0)
    assert(fmm === Seq("数据", "库"))
    assert(rmm === Seq("数", "据库"))
    // default-dict RMM agrees with FMM on the unambiguous demo string and
    // still falls back to unigrams off-dictionary
    val got = Seq("图数据库分词yes").toDF("t")
      .select(TextFunctions.tokenizeCjkDictRmm(col("t"))).head().getSeq[String](0)
    assert(got === Seq("图数据库", "分词", "yes"))
    // Latin runs pass through whole
    assert(Seq("hello 引擎").toDF("t")
      .select(TextFunctions.tokenizeCjkDictRmm(col("t"))).head().getSeq[String](0)
      === Seq("hello", "引擎"))
  }

  test("BiMM analyzer votes between FMM and RMM per Han run") {
    val df = Seq("数据库表").toDF("t")
    // fewer tokens wins: dict {数据库, 库表} → FMM [数据库, 表] (2) beats
    // RMM [数, 据, 库表] (3)
    TextFunctions.registerDict("bi1", Seq("数据库", "库表"))
    assert(df.select(TextFunctions.analyzer("cjk-dict-bi:bi1")(col("t")))
      .head().getSeq[String](0) === Seq("数据库", "表"))
    // full tie → RMM: dict {数据, 据库} on 数据库 gives 2 tokens / 1 single
    // both ways; BiMM resolves to the RMM segmentation
    TextFunctions.registerDict("bi2", Seq("数据", "据库"))
    assert(Seq("数据库").toDF("t")
      .select(TextFunctions.analyzer("cjk-dict-bi:bi2")(col("t")))
      .head().getSeq[String](0) === Seq("数", "据库"))
    // count tie broken by fewer single-char tokens: dict {数据, 库表, 据库表}
    // → FMM [数据, 库表] (0 singles) beats RMM [数, 据库表] (1 single)
    TextFunctions.registerDict("bi3", Seq("数据", "库表", "据库表"))
    assert(df.select(TextFunctions.analyzer("cjk-dict-bi:bi3")(col("t")))
      .head().getSeq[String](0) === Seq("数据", "库表"))
    // default dict + Latin passthrough
    assert(Seq("spark图数据库引擎").toDF("t")
      .select(TextFunctions.tokenizeCjkDictBi(col("t"))).head().getSeq[String](0)
      === Seq("spark", "图数据库", "引擎"))
  }

  test("mmseg analyzer: chunk scoring beats FMM's greedy split, ties fall to longest word") {
    // Tsai's canonical example: dict {研究, 研究生, 生命, 起源} on
    // 研究生命起源 — FMM greedily eats 研究生 → [研究生, 命, 起源];
    // mmseg's (2,2,2) chunk ties (3,1,2) on total length and word count
    // but wins on variance → [研究, 生命, 起源]
    TextFunctions.registerDict("mm", Seq("研究", "研究生", "生命", "起源"))
    val df = Seq("研究生命起源").toDF("t")
    assert(df.select(TextFunctions.analyzer("cjk-dict:mm")(col("t")))
      .head().getSeq[String](0) === Seq("研究生", "命", "起源"))
    assert(df.select(TextFunctions.analyzer("cjk-dict-mmseg:mm")(col("t")))
      .head().getSeq[String](0) === Seq("研究", "生命", "起源"))
    // total length dominates: dict {数据, 据库} on 数据库 — (2,1,0) and
    // (1,2,0) tie through variance; longest-first-word tie-break → FMM-like
    TextFunctions.registerDict("mm2", Seq("数据", "据库"))
    assert(Seq("数据库").toDF("t")
      .select(TextFunctions.analyzer("cjk-dict-mmseg:mm2")(col("t")))
      .head().getSeq[String](0) === Seq("数据", "库"))
    // default dict + Latin passthrough + off-dict unigram fallback
    assert(Seq("spark图数据库x引擎了").toDF("t")
      .select(TextFunctions.tokenizeCjkMmseg(col("t"))).head().getSeq[String](0)
      === Seq("spark", "图数据库", "x", "引擎", "了"))
  }

  test("index-mode analyzer (jieba INDEX): segmented words also emit in-dict sub-words") {
    // FMM on 图数据库 → [图数据库]; index mode additionally surfaces the
    // embedded dictionary words 数据 (2-gram) and 数据库 (3-gram), word last
    val got = Seq("图数据库分词").toDF("t")
      .select(TextFunctions.tokenizeCjkDictIndex(col("t"))).head().getSeq[String](0)
    assert(got === Seq("数据", "数据库", "图数据库", "分词"))
    // disagreement with FMM on the same string: same segmentation, finer grams
    val fmm = Seq("图数据库分词").toDF("t")
      .select(TextFunctions.tokenizeCjkDict(col("t"))).head().getSeq[String](0)
    assert(fmm === Seq("图数据库", "分词"))
    // 2-char words emit no sub-grams of themselves; latin passthrough
    assert(Seq("spark数据x").toDF("t")
      .select(TextFunctions.tokenizeCjkDictIndex(col("t"))).head().getSeq[String](0)
      === Seq("spark", "数据", "x"))
  }

  test("max-word analyzer (IK max_word): all overlapping dict matches plus uncovered singles") {
    // every dictionary word at every position: 图数据库 (pos 1) overlaps
    // 数据库 and 数据 (pos 2); positions 3-4 are covered → no singles
    val got = Seq("图数据库分词").toDF("t")
      .select(TextFunctions.tokenizeCjkMaxword(col("t"))).head().getSeq[String](0)
    assert(got === Seq("图数据库", "数据库", "数据", "分词"))
    // uncovered positions fall back to single chars (了 matches nothing)
    assert(Seq("引擎了").toDF("t")
      .select(TextFunctions.tokenizeCjkMaxword(col("t"))).head().getSeq[String](0)
      === Seq("引擎", "了"))
    // a char inside a longer word is NOT re-emitted as a single even when
    // no word starts there (库 sits inside 图数据库/数据库)
    TextFunctions.registerDict("mw", Seq("数据", "据库"))
    assert(Seq("数据库x").toDF("t")
      .select(TextFunctions.analyzer("cjk-dict-maxword:mw")(col("t")))
      .head().getSeq[String](0) === Seq("数据", "据库", "x"))
  }

  test("max-probability analyzer (jieba exact mode): frequency beats greedy and BiMM") {
    // 研究生命起源: FMM grabs 研究生 then strands 命; the max-probability
    // route P(研究)·P(生命)·P(起源) wins (jieba's canonical demo)
    val got = Seq("研究生命起源").toDF("t")
      .select(TextFunctions.tokenizeCjkFreq(col("t"))).head().getSeq[String](0)
    assert(got === Seq("研究", "生命", "起源"))
    // DISAGREEMENT with BiMM on the same wordlist: 方法学 ties FMM
    // (方法|学) against RMM (方|法学) on both token count and single count,
    // so BiMM's vote falls to RMM — but freq(方法)=60000 ≫ freq(法学)=800,
    // so the probability route keeps 方法|学
    val words = TextFunctions.cjkFreqDict.map(_._1)
    val bimm = Seq("方法学").toDF("t")
      .select(TextFunctions.tokenizeCjkDictBi(col("t"), words))
      .head().getSeq[String](0)
    val freq = Seq("方法学").toDF("t")
      .select(TextFunctions.tokenizeCjkFreq(col("t"))).head().getSeq[String](0)
    assert(bimm === Seq("方", "法学"))
    assert(freq === Seq("方法", "学"))
    // unknown singles smooth to 1/(total+1) instead of failing; latin runs
    // pass through whole (the overHanRuns contract)
    assert(Seq("了spark引擎").toDF("t")
      .select(TextFunctions.tokenizeCjkFreq(col("t"))).head().getSeq[String](0)
      === Seq("了", "spark", "引擎"))
    // registry dispatch with a custom frequency lexicon: flipping the
    // frequencies flips the segmentation
    TextFunctions.registerFreqDict("flip",
      Seq("方法" -> 10L, "法学" -> 900000L, "学" -> 100L))
    assert(Seq("方法学").toDF("t")
      .select(TextFunctions.analyzer("cjk-freq:flip")(col("t")))
      .head().getSeq[String](0) === Seq("方", "法学"))
  }

  test("shingles produces distinct 3-grams, short-doc fallback") {
    val got = Seq("a b c d", "x y").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("x y"))
  }

  test("minhash signature is permutation-stable: identical docs, identical sigs") {
    val df = Seq("the quick brown fox", "the quick brown fox", "something else entirely")
      .toDF("t")
      .select(HashFunctions.minhashSignature(TextFunctions.shingles(col("t"), 2), 8).as("sig"))
    val sigs = df.collect().map(_.getSeq[String](0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
  }

  test("simhash: similar docs closer than dissimilar ones") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy cat"),
      ("c", "completely different words appear here instead now")).toDF("id", "t")
      .select(col("id"), HashFunctions.simhash32(TextFunctions.tokenize(col("t"))).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def ham(x: String, y: String) = x.zip(y).count { case (a, b) => a != b }
    assert(m("a").length === 32)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")))
  }

  test("cosine expression agrees with builtin composition and handles zero vectors") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
      .select(
        VectorFunctions.cosineSim(col("a"), col("b")).as("native"),
        VectorFunctions.cosineSimBuiltin(col("a"), col("b")).as("builtin"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
    assert(df.collect()(1).getDouble(0) === 0.0)
  }

  test("dot product expression") {
    VectorFunctions.register(spark)
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(d - 11.0) < 1e-12)
  }

  test("langId picks dominant stopword language, und when none") {
    val df = Seq("the cat and the dog is in a house",
      "el gato y la casa es de madera que",
      "zzz qqq xxx").toDF("t")
      .select(TextFunctions.langId(col("t")))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "es", "und"))
  }

  test("hammingBits") {
    val d = Seq(("1010", "1001")).toDF("a", "b")
      .select(HashFunctions.hammingBits(col("a"), col("b"))).head().getInt(0)
    assert(d === 2)
  }

  test("chunkTokens: stride windows, kept tail, empty input") {
    val toks = (1 to 10).map(i => s"t$i")
    val chunks = Seq(Tuple1(toks)).toDF("toks")
      .select(TextFunctions.chunkTokens(col("toks"), size = 4, stride = 3))
      .head().getSeq[String](0)
    // starts 1,4,7,10: three full 4-token windows then a 1-token tail
    assert(chunks === Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(TextFunctions.chunkTokens(col("toks"), size = 4, stride = 3))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("repetitionRatio: repeats raise it, distinct trigrams zero it") {
    val r = Seq(
      Tuple1(Seq("a", "b", "c", "a", "b", "c", "a", "b", "c")), // trigram "a b c" repeats
      Tuple1(Seq("a", "b", "c", "d", "e")))                     // all trigrams distinct
      .toDF("toks")
      .select(TextFunctions.repetitionRatio(col("toks"), 3))
      .collect().map(_.getDouble(0))
    assert(r(0) > 0.5) // 7 trigram slots, 3 distinct → 1 - 3/7 ≈ 0.57
    assert(r(1) === 0.0)
  }

  test("unicode normalize: NFC composes, strip_accents folds, codegen = eval") {
    graft.functions.UnicodeFunctions.register(spark)
    import graft.functions.UnicodeFunctions.{nfcNormalize, stripAccents}
    val d = Seq(("café naïve", "café señor")).toDF("dec", "comp")
    val r = d.select(
      nfcNormalize(col("dec")).as("n"), stripAccents(col("dec")).as("s1"),
      stripAccents(col("comp")).as("s2"),
      length(col("dec")).as("lb"), length(nfcNormalize(col("dec"))).as("la"))
      .head()
    assert(r.getString(0) === "café naïve")      // composed output
    assert(r.getString(1) === "cafe naive")
    assert(r.getString(2) === "cafe senor")      // composed input also folds
    assert(r.getInt(3) === 12 && r.getInt(4) === 10) // 2 combining marks merged
    // interpreted (no-codegen) path agrees with the codegen'd one
    val expr = graft.functions.UnicodeFunctions.NfcNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("café"))
    assert(expr.eval(null).toString === "café")
  }

  test("ICU cjdict lexicon: production width, broadcast Viterbi segmentation") {
    import graft.functions.IcuLexicon
    // the shipped lexicon is REAL width (254k entries) — the parity item
    // the demo dict stood in for (reference AnalyzerFactory.java:34-53
    // wires shipped lexicons into its pluggable segmenters)
    assert(IcuLexicon.cjkScoreLexicon.size > 10000)
    assert(IcuLexicon.cjkScoreLexicon.forall { case (w, lp) => lp < 0 && w.nonEmpty })
    val lexMap = IcuLexicon.cjkScoreLexicon.toMap
    // the canonical ambiguity set is present and resolves by frequency,
    // exactly like the demo-dict Viterbi (jieba's canonical example)
    assert(lexMap.contains("\u7814\u7a76") && lexMap.contains("\u7814\u7a76\u751f")
      && lexMap.contains("\u751f\u547d") && lexMap.contains("\u8d77\u6e90"))
    val lex = IcuLexicon.cjkScoreLexicon.toDF("word", "lp")
    val docs = Seq(
      (1L, "\u7814\u7a76\u751f\u547d\u8d77\u6e90spark\u5f15\u64ce"),
      (2L, "\u56fe\u6570\u636e\u5e93")).toDF("doc_id", "text")
    val seg = graft.ops.CjkSegment.segment(docs, "doc_id", col("text"),
      lex, maxLen = 6, unknownScore = IcuLexicon.cjkUnknownScore)
    val got = seg.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // frequency beats greedy FMM (which would eat \u7814\u7a76\u751f and strand \u547d);
    // latin runs pass through whole (the overHanRuns contract)
    assert(got(1L) === "\u7814\u7a76 \u751f\u547d \u8d77\u6e90 spark \u5f15\u64ce")
    assert(got(2L).split(" ").mkString("") === "\u56fe\u6570\u636e\u5e93")
    // the lexicon side of the plan is a broadcast exchange — the corpus
    // side never shuffles for the lookup (the 100 TB contract)
    val plan = seg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("CjkSegment: adversarial unpunctuated Han spam is chunked at runCap, real text unaffected") {
    import graft.functions.IcuLexicon
    val lex = IcuLexicon.cjkScoreLexicon.toDF("word", "lp")
    // 1200 unpunctuated Han chars (a 2-char word repeated 600×): without
    // the enforced runCap bound this single row's DP was O(len²·maxLen²)
    val spam = "研究" * 600
    val docs = Seq((1L, spam), (2L, "生命" + ("." + "起源") * 3))
      .toDF("doc_id", "text")
    val got = graft.ops.CjkSegment.segment(docs, "doc_id", col("text"),
      lex, maxLen = 6, unknownScore = IcuLexicon.cjkUnknownScore)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // chunking is token-stream-invisible here: runCap=256 is a multiple of
    // the word length, so every chunk segments to the same word repeated
    assert(got(1L) === Array.fill(600)("研究").mkString(" "))
    // runs shorter than the cap (all real text) are untouched
    assert(got(2L) === "生命 起源 起源 起源")
  }
}
