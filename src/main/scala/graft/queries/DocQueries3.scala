package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Ann, Corpus, Multimodal, Sketch}
import QueryDef._

/** Round-7 curation/analysis operators: TF-IDF term weighting, character
  * entropy, CCNet perplexity bucketing, per-domain URL stats, Count-Min
  * heavy hitters, embedding standardization. Oracles follow the
  * [[DocQueries]] contracts (md5-derived hashes, exact-decimal stats,
  * rounded-6 doubles). */
object DocQueries3 {

  private def tokOf(c: String) =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** DuckDB twin of Packing.hash16 over doc_id (DocQueries.hash16Sql). */
  private val hash16Sql = {
    def d(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
    s"(${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)})"
  }

  /** DuckDB twin of Sketch.hash60 (DocQueries2.hash60Sql). */
  private def hash60Sql(c: String): String =
    (0 until 15).map { j =>
      val mult = math.pow(16, 14 - j).toLong
      s"(strpos('0123456789abcdef', substr(md5($c), ${j + 1}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Word n-gram shingles over a `toks` column (DocQueries2.shingleSql —
    * identical to TextFunctions.shinglesFromTokens incl. short-doc
    * fallback). */
  private def shingleSql(n: Int) =
    s"""list_distinct(CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
       |  ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  /** Deterministic URL augmentation — the synthetic corpus carries no URLs,
    * so selected docs get one or two appended (the q_redact_pii / c4Aug
    * synthesis precedent). */
  private val urlAugSql =
    """lower(text ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' visit https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/p' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' via http://cdn.shared.net/lib.js' ELSE '' END)""".stripMargin

  private def urlAug = lower(concat(col("text"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" visit https://site"), (col("doc_id") % 20).cast("string"),
        lit(".example.com/p"))).otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit(" via http://cdn.shared.net/lib.js"))
      .otherwise(lit(""))))

  /** Unrolled BPE-training CTE chain (ops.Bpe.train's oracle twin): s0 =
    * char-split word-frequency table; each round r = weighted adjacent-pair
    * count → (count desc, a, b) argmax → left-to-right fold-merge via
    * `list_reduce` over the space-joined symbol encoding (symbols are
    * space-free, so the encoding is lossless — the exact contract of
    * Bpe.mergeFold). A round whose pair table is empty is a no-op (LEFT
    * JOIN + CASE keeps syms unchanged), matching Bpe.train's skip
    * behavior instead of collapsing the symbol table to zero rows. */
  private def bpeCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      s"""p$r AS (SELECT syms[i] AS a, syms[i + 1] AS b, sum(cnt) AS c
         |  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM s${r - 1}) z$r
         |  GROUP BY 1, 2),
         |best$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a ASC, b ASC LIMIT 1),
         |s$r AS MATERIALIZED (SELECT word, cnt,
         |  CASE WHEN best$r.a IS NULL THEN syms ELSE
         |  list_filter(string_split(list_reduce(list_prepend('', syms),
         |    (acc, x) -> CASE WHEN acc = '' THEN x
         |      WHEN string_split(acc, ' ')[-1] = best$r.a AND x = best$r.b
         |      THEN left(acc, length(acc) - length(best$r.a)) || best$r.a || best$r.b
         |      ELSE acc || ' ' || x END), ' '), s -> len(s) > 0) END AS syms
         |  FROM s${r - 1} LEFT JOIN best$r ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
       |e AS (SELECT doc_id, unnest(toks) AS word FROM t),
       |w AS (SELECT word, count(*) AS cnt FROM e GROUP BY word),
       |s0 AS MATERIALIZED (SELECT word, cnt,
       |  list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS syms
       |  FROM w),
       |$rounds""".stripMargin
  }

  /** Correlated-subquery cosine twin of VectorFunctions.cosine
    * (DocQueries.cosExpr). */
  private def cosExpr(x: String, y: String): String =
    s"""((SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
       |  FROM (SELECT unnest($x) AS a, unnest($y) AS b) zz1) /
       | sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest($x) AS a) zz2) *
       |      (SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT unnest($y) AS b) zz3)))""".stripMargin

  /** Shared unigram-LM CTE prefix (the q_unigram_logprob oracle). */
  private val unigramCte =
    s"""t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
       |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |f AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM f),
       |lp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |  round(avg(ln(cnt)) - ln((SELECT n FROM tot)), 6) + 0 AS logprob
       |  FROM e JOIN f USING (tok) GROUP BY doc_id)""".stripMargin

  /** Unrolled logistic-regression training chain (the
    * Corpus.trainQualityClassifier oracle twin): rounded-9 DECIMAL hashed
    * frequencies and σ values make every moment exact; per round z → σ →
    * residual → gradient → weight update, weights MATERIALIZED. */
  private def logRegCtes(dims: Int, rounds: Int): String = {
    val rs = (1 to rounds).map { r =>
      s"""z$r AS (SELECT doc_id, sum(w.w * x.x) AS z
         |  FROM x JOIN w${r - 1} w USING (j) GROUP BY doc_id),
         |r$r AS (SELECT doc_id,
         |  y.y - CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-CAST(z AS DOUBLE))), 9) AS DECIMAL(16,9)) AS r
         |  FROM z$r JOIN y USING (doc_id)),
         |g$r AS (SELECT j, sum(r.r * x.x) AS g FROM x JOIN r$r r USING (doc_id) GROUP BY j),
         |w$r AS MATERIALIZED (SELECT w.j,
         |  CAST(round(CAST(w.w AS DOUBLE)
         |    + CAST(coalesce(g.g, 0) AS DOUBLE) / (SELECT n FROM nn), 9) AS DECIMAL(16,9)) AS w
         |  FROM w${r - 1} w LEFT JOIN g$r g USING (j))""".stripMargin
    }.mkString(",\n")
    s"""t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
       |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |nt AS (SELECT doc_id, count(*) AS n_toks FROM e GROUP BY doc_id),
       |cx AS (SELECT doc_id, ${hash60Sql("tok")} % $dims AS j, count(*) AS cnt
       |       FROM e GROUP BY 1, 2),
       |x AS MATERIALIZED (SELECT doc_id, j,
       |  CAST(round(CAST(cnt AS DOUBLE) / n_toks, 9) AS DECIMAL(16,9)) AS x
       |  FROM cx JOIN nt USING (doc_id)),
       |y AS (SELECT doc_id,
       |  CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DECIMAL(16,9)) AS y
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM documents),
       |w0 AS (SELECT j, CAST(0 AS DECIMAL(16,9)) AS w
       |       FROM (SELECT unnest(range(0, $dims)) AS j)),
       |$rs""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // in-engine quality-classifier training: 3 rounds of full-batch
    // logistic regression over 32 hashed token-frequency features, label =
    // (lang = 'en'); scores every doc with the trained weights. Decimal-
    // exact gradients; the oracle unrolls the identical GD recurrence
    q("q_quality_classifier",
      s"""WITH ${logRegCtes(32, 3)},
         |zf AS (SELECT doc_id, sum(w.w * x.x) AS z FROM x JOIN w3 w USING (j) GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |  round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-CAST(z AS DOUBLE))), 6) AS score
         |  FROM zf)
         |SELECT sc.doc_id, CAST(y.y AS BIGINT) AS y, sc.score,
         |  CAST(sc.score >= 0.5 AS BIGINT) AS pred
         |FROM sc JOIN y USING (doc_id)""".stripMargin,
      bench = true) { (s, d) =>
      Corpus.trainQualityClassifier(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", dims = 32, rounds = 3)
    },

    q("q_tfidf_topterms",
      s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY doc_id, tok),
         |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
         |SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |       round(tf * ln(n / df), 6) AS tfidf, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT tf.doc_id, tf.tok, tf.tf, dfx.df, n.n,
         |        row_number() OVER (PARTITION BY tf.doc_id
         |          ORDER BY tf.tf * ln(n.n / dfx.df) DESC, tf.tok ASC) AS rank
         |      FROM tf JOIN dfx USING (tok) CROSS JOIN n) z
         |WHERE rank <= 3""".stripMargin, bench = true) { (s, d) =>
      Corpus.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
    },

    q("q_char_entropy",
      """WITH s AS (SELECT doc_id,
        |  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS st FROM documents),
        |ch AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(st) + 1), i -> substr(st, i, 1))) AS ch
        |  FROM s WHERE len(st) > 0),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       round(log2(CAST(sum(c) AS DOUBLE))
        |             - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) + 0 AS entropy
        |FROM cc GROUP BY doc_id""".stripMargin) { (s, d) =>
      Corpus.charEntropy(Tables.documents(s, d), "doc_id", "text")
    },

    q("q_ccnet_bucket",
      s"""WITH $unigramCte,
         |st AS (SELECT count(*) AS cnt,
         |  CAST(sum(CAST(logprob AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |  CAST(sum(CAST(logprob AS DECIMAL(18,6)) * CAST(logprob AS DECIMAL(18,6))) AS DOUBLE) AS ssv
         |  FROM lp)
         |SELECT doc_id, n_toks, logprob, round(z, 6) + 0 AS z,
         |  CASE WHEN z >= 0.5 THEN 'head' WHEN z <= -0.5 THEN 'tail'
         |       ELSE 'middle' END AS bucket
         |FROM (SELECT lp.*,
         |        (logprob - sv / cnt) / sqrt((ssv - sv * sv / cnt) / (cnt - 1)) AS z
         |      FROM lp CROSS JOIN st) zz""".stripMargin, bench = true) { (s, d) =>
      Corpus.perplexityBuckets(Tables.documents(s, d), "doc_id", "text")
    },

    q("q_url_domains",
      s"""WITH t AS (SELECT doc_id, $urlAugSql AS aug FROM documents),
         |h AS (SELECT doc_id,
         |  unnest(regexp_extract_all(aug, 'https?://([a-z0-9.-]+)', 1)) AS domain
         |  FROM t)
         |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_hits
         |FROM h WHERE len(domain) > 0 GROUP BY domain""".stripMargin) { (s, d) =>
      Corpus.urlDomains(
        Tables.documents(s, d).select(col("doc_id"), urlAug.as("text")),
        "doc_id", "text")
    },

    q("q_cms_topk",
      {
        val h = hash60Sql("CAST(r AS VARCHAR) || ':' || tok")
        s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
           |e AS (SELECT unnest(toks) AS tok FROM t),
           |rr AS (SELECT unnest(range(0, 4)) AS r),
           |ex AS (SELECT tok, count(*) AS exact FROM e GROUP BY tok
           |       ORDER BY exact DESC, tok ASC LIMIT 20),
           |cells AS (SELECT r, $h % 256 AS b, count(*) AS cell
           |          FROM e CROSS JOIN rr GROUP BY r, b),
           |probes AS (SELECT tok, exact, r, $h % 256 AS b FROM ex CROSS JOIN rr)
           |SELECT tok, CAST(exact AS BIGINT) AS exact, CAST(min(cell) AS BIGINT) AS est
           |FROM probes JOIN cells USING (r, b)
           |GROUP BY tok, exact""".stripMargin
      }, bench = true) { (s, d) =>
      val e = Corpus.tokens(Tables.documents(s, d), "doc_id", "text")
        .select(explode(col("toks")).as("tok"))
      Sketch.countMinTopK(e, "tok", depth = 4, width = 256, k = 20)
    },

    // Bloom-filter decontamination: same eval-set framing as
    // q_decontaminate (docs < 25 = the benchmark, 5-grams), but membership
    // goes through a 65536-bit/3-hash filter — n_flagged ⊇ q_decontaminate's
    // n_hits docs (one-sided error), with a fixed-size broadcast at any
    // benchmark scale
    q("q_bloom_decontaminate",
      {
        val h = (c: String) => s"(${hash60Sql(c)}) % 65536"
        s"""WITH btoks AS (SELECT ${tokOf("text")} AS toks FROM documents WHERE doc_id < 25),
           |bg AS (SELECT DISTINCT unnest(sh5) AS gram
           |       FROM (SELECT ${shingleSql(5)} AS sh5 FROM btoks) zz),
           |jj AS (SELECT unnest(range(0, 3)) AS j),
           |bpos AS (SELECT DISTINCT ${h("CAST(j AS VARCHAR) || ':' || md5(gram)")} AS p
           |         FROM bg CROSS JOIN jj),
           |ctoks AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents WHERE doc_id >= 25),
           |cg AS (SELECT doc_id, unnest(sh5) AS gram
           |       FROM (SELECT doc_id, ${shingleSql(5)} AS sh5 FROM ctoks) zz),
           |cgh AS (SELECT doc_id, md5(gram) AS gh FROM cg),
           |cpos AS (SELECT doc_id, gh, j, ${h("CAST(j AS VARCHAR) || ':' || gh")} AS p
           |         FROM cgh CROSS JOIN jj),
           |flg AS (SELECT doc_id, gh FROM cpos JOIN bpos ON bpos.p = cpos.p
           |        GROUP BY doc_id, gh HAVING count(DISTINCT j) = 3)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
           |FROM flg GROUP BY doc_id""".stripMargin
      }) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.Decontaminate.bloomContaminated(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", "text", ngram = 5, mBits = 65536, kHashes = 3)
    },

    // bigram LM perplexity proxy — the order-2 upgrade of
    // q_unigram_logprob (add-one smoothing, corpus-trained, distributed
    // count tables)
    q("q_bigram_logprob",
      s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM t),
         |bgn AS (SELECT doc_id, tok, nxt FROM (
         |  SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |  FROM e) z WHERE nxt IS NOT NULL),
         |c1 AS (SELECT tok, count(*) AS c1 FROM e GROUP BY tok),
         |c12 AS (SELECT tok, nxt, count(*) AS c12 FROM bgn GROUP BY tok, nxt),
         |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v))), 6) + 0 AS logprob
         |FROM bgn JOIN c12 USING (tok, nxt) JOIN c1 USING (tok) CROSS JOIN v
         |GROUP BY doc_id""".stripMargin, bench = true) { (s, d) =>
      Corpus.bigramLogProb(Tables.documents(s, d), "doc_id", "text")
    },

    // BPE tokenizer training: the learned merge table after 8 rounds —
    // training runs on the distinct-word table (Zipf-collapsed working
    // set); argmax + fold-merge reproduced exactly by the unrolled oracle
    q("q_bpe_merges",
      {
        val rows = (1 to 8).map(r =>
          s"""SELECT CAST($r AS BIGINT) AS round, a AS sym_a, b AS sym_b,
             |       CAST(c AS BIGINT) AS pair_count FROM best$r""".stripMargin)
          .mkString("\nUNION ALL\n")
        s"WITH ${bpeCtes(8)}\n$rows"
      }, bench = true) { (s, d) =>
      graft.ops.Bpe.merges(Tables.documents(s, d), "doc_id", "text", nMerges = 8)
    },

    // per-document encoding stats under the trained merges — the
    // chars-per-token compression gauge of a tokenizer bake-off
    q("q_bpe_encode",
      s"""WITH ${bpeCtes(8)},
         |enc AS (SELECT word, CAST(length(word) AS BIGINT) AS n_chars_w,
         |        CAST(len(syms) AS BIGINT) AS n_syms_w FROM s8)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_chars_w) AS BIGINT) AS n_chars,
         |       CAST(sum(n_syms_w) AS BIGINT) AS n_bpe_tokens,
         |       round(CAST(sum(n_chars_w) AS DOUBLE) / sum(n_syms_w), 6) AS chars_per_token
         |FROM e JOIN enc USING (word) GROUP BY doc_id""".stripMargin) { (s, d) =>
      graft.ops.Bpe.encodeStats(Tables.documents(s, d), "doc_id", "text", nMerges = 8)
    },

    // pairwise source vocabulary jaccard via the inverted token→source
    // index — the mixture designer's source-redundancy gauge
    q("q_source_overlap",
      s"""WITH t AS (SELECT source, ${tokOf("text")} AS toks FROM documents),
         |st AS (SELECT DISTINCT source AS g, unnest(toks) AS tok FROM t),
         |vsz AS (SELECT g, count(*) AS v FROM st GROUP BY g),
         |inter AS (SELECT l.g AS ga, r.g AS gb, count(*) AS n_common
         |          FROM st l JOIN st r ON l.tok = r.tok AND l.g < r.g
         |          GROUP BY l.g, r.g)
         |SELECT ga, gb, CAST(n_common AS BIGINT) AS n_common,
         |       CAST(va.v AS BIGINT) AS va, CAST(vb.v AS BIGINT) AS vb,
         |       round(CAST(n_common AS DOUBLE) / (va.v + vb.v - n_common), 6) AS jaccard
         |FROM inter JOIN vsz va ON va.g = inter.ga
         |           JOIN vsz vb ON vb.g = inter.gb""".stripMargin) { (s, d) =>
      Corpus.sourceOverlap(Tables.documents(s, d), "source", "text")
    },

    // per-source dataset-card row: volume, vocabulary, language-mix entropy
    q("q_source_card",
      s"""WITH t AS (SELECT source, ${tokOf("text")} AS toks FROM documents),
         |vol AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |        CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab
         |        FROM (SELECT source, unnest(toks) AS tok FROM t) z GROUP BY source),
         |lc AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang),
         |lm AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
         |       round(log2(CAST(sum(c) AS DOUBLE))
         |             - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) + 0 AS lang_entropy
         |       FROM lc GROUP BY source)
         |SELECT lm.source, n_docs, n_tokens, n_vocab,
         |       round(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_toks,
         |       lang_entropy
         |FROM lm JOIN vol ON vol.source = lm.source""".stripMargin) { (s, d) =>
      Corpus.sourceCard(Tables.documents(s, d), "source", "text", "lang")
    },

    // composed "topic model lite": k-means cells over the embeddings (the
    // SAME memoized trained quantizer as q_semantic_dedup / q_knn_graph)
    // labeled by their top TF-IDF terms — cluster keyword extraction, the
    // corpus-exploration surface a curation run ships with its clusters
    q("q_topic_keywords",
      {
        // the knnGraphSql training chain (full-table cands, 8 cells, 2
        // Lloyd's rounds) up to `assigned`, then cluster-summed tf-idf
        val kmeans = DocQueries2.kmeansAssignedCtes(8, 2)
        s"""WITH $kmeans,
           |t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
           |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY doc_id, tok),
           |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
           |w AS (SELECT a.cid, tf.tok,
           |        round(sum(tf.tf * ln(n.n / dfx.df)), 6) AS weight
           |      FROM tf JOIN assigned a ON a.vec_id = tf.doc_id
           |           JOIN dfx USING (tok) CROSS JOIN n
           |      GROUP BY a.cid, tf.tok)
           |SELECT cid, tok, weight, CAST(rank AS BIGINT) AS rank
           |FROM (SELECT w.*, row_number() OVER (PARTITION BY cid
           |        ORDER BY weight DESC, tok ASC) AS rank FROM w) z
           |WHERE rank <= 3""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val assigned = Ann.cellAssignments(Tables.embeddings(s, d), 8, 2)
        .select(col("vec_id").as("doc_id"), col("cid"))
      val e = Corpus.tokens(docs, "doc_id", "text")
        .select(col("doc_id"), explode(col("toks")).as("tok"))
      val tf = e.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfx = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      // rounded BEFORE the top-k cut (the bm25 determinism discipline: the
      // cluster sum is an unordered double fold)
      val w = tf.join(assigned, Seq("doc_id")).join(dfx, Seq("tok"))
        .crossJoin(broadcast(n))
        .groupBy(col("cid"), col("tok"))
        .agg(round(sum(col("tf") * log(col("n") / col("df"))), 6).as("weight"))
      val win = Window.partitionBy(col("cid"))
        .orderBy(col("weight").desc, col("tok").asc)
      w.withColumn("rank", row_number().over(win)).filter(col("rank") <= 3)
        .select(col("cid"), col("tok"), col("weight"),
          col("rank").cast("long").as("rank"))
    },

    // Efraimidis–Spirakis A-Res weighted sampling: −ln(u)/w keys from the
    // md5-uniform draw, k smallest win — reproducible weighted selection
    q("q_weighted_sample",
      {
        def d4(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
        val h16 = s"(${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})"
        s"""SELECT doc_id, n_chars, round(key, 9) AS key FROM (
           |  SELECT doc_id, n_chars,
           |         -ln(CAST($h16 + 1 AS DOUBLE) / 65536.0) / n_chars AS key
           |  FROM documents)
           |ORDER BY key ASC, doc_id ASC LIMIT 50""".stripMargin
      }) { (s, d) =>
      graft.ops.Packing.weightedSample(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), k = 50)
    },

    // pairwise-cosine histogram over a bounded probe sample — the
    // embedding-quality diagnostic (a collapsed or bimodal similarity
    // distribution flags bad embeddings before they poison dedup/ANN);
    // the all-pairs term is confined to the 50-vector sample
    q("q_sim_histogram",
      s"""WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
         |p AS (SELECT ${cosExpr("a.embedding", "b.embedding")} AS sim
         |      FROM s a JOIN s b ON a.vec_id < b.vec_id)
         |SELECT CAST(floor(sim * 10) AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM p GROUP BY bin""".stripMargin) { (s, d) =>
      val sample = Tables.embeddings(s, d).filter(col("vec_id") < 50)
      graft.functions.VectorFunctions.register(s)
      sample.as("a").join(sample.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(graft.functions.VectorFunctions
          .cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
        .groupBy(floor(col("sim") * 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
    },

    q("q_boilerplate_removal",
      // CCNet/RefinedWeb line-dedup as a TRANSFORM: 3-token non-overlapping
      // chunks shared by >5 distinct docs are boilerplate, cut from every
      // doc, survivors rejoined in order. Oracle rebuilds the same chunking
      // (list-slice windows), thresholds distinct-doc counts, and filters
      // in the list domain against the collapsed boilerplate dictionary —
      // the engine's one-shuffle + broadcast-dictionary shape.
      s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
         |ch AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 1
         |    THEN list_transform(range(1, len(toks) + 1, 3),
         |           st -> array_to_string(toks[CAST(st AS INT):CAST(st + 2 AS INT)], ' '))
         |    ELSE CAST([] AS VARCHAR[]) END AS chunks FROM t),
         |ex AS (SELECT doc_id, unnest(list_distinct(chunks)) AS c FROM ch),
         |bp AS (SELECT c FROM ex GROUP BY c HAVING count(*) > 5),
         |bpl AS (SELECT coalesce(list_sort(list(c)), CAST([] AS VARCHAR[])) AS bp FROM bp),
         |fin AS (SELECT doc_id, chunks,
         |          list_filter(chunks, c -> NOT list_contains(bp, c)) AS kept
         |        FROM ch CROSS JOIN bpl)
         |SELECT doc_id, array_to_string(kept, ' ') AS text_clean,
         |       CAST(len(chunks) AS BIGINT) AS n_chunks,
         |       CAST(len(chunks) - len(kept) AS BIGINT) AS n_removed
         |FROM fin""".stripMargin) { (s, d) =>
      Corpus.removeBoilerplate(Tables.documents(s, d), "doc_id", "text",
        chunk = 3, maxDocs = 5)
    },

    q("q_embed_standardize",
      """WITH e AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
        |  FROM (SELECT vec_id, unnest(embedding) AS v,
        |        generate_subscripts(embedding, 1) AS dim FROM embeddings) z),
        |st AS (SELECT dim, count(*) AS n, CAST(sum(v) AS DOUBLE) AS sv,
        |       CAST(sum(v * v) AS DOUBLE) AS ssv FROM e GROUP BY dim)
        |SELECT e.vec_id, e.dim,
        |  round((CAST(e.v AS DOUBLE) - sv / n)
        |        / sqrt((ssv - sv * sv / n) / (n - 1)), 6) + 0 AS z
        |FROM e JOIN st USING (dim)""".stripMargin) { (s, d) =>
      Ann.standardize(Tables.embeddings(s, d), "vec_id", "embedding")
    },

    // distributed PCA's corpus-sized pass: exact-decimal upper-triangle
    // covariance (the shuffle carries d(d+1)/2 groups at ANY corpus size);
    // the eigensolve/projection halves are PcaSpec-verified (a driver-side
    // O(d³) Jacobi has no SQL twin)
    q("q_embed_covariance",
      """WITH e AS (SELECT vec_id, CAST(dim - 1 AS INT) AS dim,
        |  CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
        |  FROM (SELECT vec_id, unnest(embedding) AS v,
        |        generate_subscripts(embedding, 1) AS dim FROM embeddings) z),
        |st AS (SELECT dim, sum(v) AS sx, count(*) AS n FROM e GROUP BY dim),
        |xy AS (SELECT a.dim AS i, b.dim AS j, sum(a.v * b.v) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |       GROUP BY 1, 2)
        |SELECT i, j,
        |  round((CAST(sxy AS DOUBLE)
        |         - CAST(sa.sx AS DOUBLE) * CAST(sb.sx AS DOUBLE) / sa.n)
        |        / (sa.n - 1), 6) + 0 AS cov
        |FROM xy JOIN st sa ON sa.dim = i JOIN st sb ON sb.dim = j""".stripMargin,
      bench = true) { (s, d) =>
      graft.ops.Pca.covariance(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64)
    },

    // per-source length-distribution card: exact interpolated percentiles
    // (Spark percentile ≡ DuckDB quantile_cont, both index p·(n−1))
    q("q_len_percentiles",
      """SELECT source, round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |       round(quantile_cont(n_chars, 0.9), 6) AS p90,
        |       round(quantile_cont(n_chars, 0.99), 6) AS p99
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      Corpus.groupPercentiles(Tables.documents(s, d), "source",
        col("n_chars"), Seq(0.5, 0.9, 0.99))
    },

    // exactly-N-per-group deterministic sample: the md5-uniform order makes
    // it a per-key top-N — composed from the bounded-heap top_k_by aggregate
    // (no window sort; k rows per group cross the wire). The fixed-COUNT
    // sibling of the fixed-RATE mixSample.
    q("q_group_sample",
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY $hash16Sql ASC, doc_id ASC) AS rn
         |  FROM documents) z WHERE rn <= 10""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.TopK.registerKernels(docs)
      // rank by hash ASC = top-k of the NEGATED hash; payload ties ASC
      // match the oracle's doc_id tiebreak... negate ranks (-h DESC, id ASC)
      docs.groupBy(col("source"))
        .agg(graft.functions.TopK.topKBy(
          -graft.ops.Packing.hash16(col("doc_id")), col("doc_id"), 10).as("tk"))
        .select(col("source"), explode(col("tk.payload")).as("doc_id"))
    },

    // temperature-flattened source mixing (XLM §3.1 recipe): keep rates
    // derived from per-source char mass at alpha=0.6 toward a 30% target;
    // rounded-6 decimal rates + md5 threshold replay exactly in DuckDB
    q("q_temperature_mix",
      s"""WITH s AS (SELECT source AS stratum, sum(n_chars) AS sz
         |           FROM documents GROUP BY 1),
         |sp AS (SELECT stratum, sz,
         |  CAST(round(pow(CAST(sz AS DOUBLE), 0.6), 6) AS DECIMAL(28,6)) AS pz
         |  FROM s),
         |t AS (SELECT sum(sz) AS n_total, sum(pz) AS z FROM sp),
         |r AS (SELECT stratum,
         |  round(least(1.0, 0.3 * CAST(pz AS DOUBLE) / CAST(z AS DOUBLE)
         |        * CAST(n_total AS DOUBLE) / CAST(sz AS DOUBLE)), 6) AS rate
         |  FROM sp CROSS JOIN t)
         |SELECT d.doc_id, r.stratum, r.rate
         |FROM documents d JOIN r ON r.stratum = d.source
         |WHERE $hash16Sql < rate * 65536.0""".stripMargin,
      bench = true) { (s, d) =>
      graft.ops.Packing.temperatureMix(Tables.documents(s, d), "doc_id",
        col("source"), col("n_chars"), alpha = 0.6, targetFraction = 0.3)
    },

    // perceptual image dHash over REAL decoded pixels: Spark renders
    // id-seeded RGB PNGs, ImageIO-decodes the full bitmap back, and
    // computes the 9×8 luma difference hash; the oracle replays the
    // integer pixel/luma/sample arithmetic analytically — the gate proves
    // the codec round-trip is lossless down to the pixel path (extends
    // q_image_decode's header gate). RGB subset only: gray/alpha types
    // transform through colorspaces the analytic twin can't replay
    q("q_image_dhash",
      {
        // luma of the sampled pixel at grid (gxE, gy): nearest-neighbor
        // sample coords floor(g·dim/grid), pixel v = (id·31+x·7+y·13) mod 2^24
        def lum(gxE: String, al: String) =
          s"""((SELECT (299 * (v // 65536) + 587 * ((v // 256) % 256) + 114 * (v % 256)) // 1000
             |  FROM (SELECT (doc_id * 31 + (($gxE) * w // 9) * 7 + (gy * h // 8) * 13) % 16777216 AS v) $al))""".stripMargin
        s"""WITH g AS (SELECT doc_id, 16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h,
           |    unnest(range(0, 8)) AS gy
           |  FROM documents WHERE doc_id % 3 = 1 AND doc_id < 200),
           |c AS (SELECT doc_id, w, h, gy, unnest(range(0, 8)) AS gx FROM g),
           |b AS (SELECT doc_id, w, h, gy, gx,
           |  CASE WHEN ${lum("gx + 1", "zr")} > ${lum("gx", "zl")}
           |       THEN CAST(1 AS HUGEINT) << (gy * 8 + gx) ELSE 0 END AS bit
           |  FROM c)
           |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           |  lower(lpad(to_hex(CAST(sum(bit) AS UBIGINT)), 16, '0')) AS dhash
           |FROM b GROUP BY doc_id, w, h""".stripMargin
      }) { (s, d) =>
      Multimodal.imageDHash(Multimodal.pngAssets(
        Tables.documents(s, d).filter(col("doc_id") % 3 === 1 && col("doc_id") < 200)))
        .select(col("doc_id"), col("width"), col("height"),
          lower(lpad(hex(col("dhash")), 16, "0")).as("dhash"))
    },

    // per-source percentile winsorization: clip n_chars into its [p5, p95]
    // band — the robust feature-engineering guard before length-based rules
    q("q_winsorize",
      """WITH b AS (SELECT source, round(quantile_cont(n_chars, 0.05), 6) AS p5,
        |                  round(quantile_cont(n_chars, 0.95), 6) AS p95
        |           FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, CAST(d.n_chars AS DOUBLE) AS v,
        |  round(least(greatest(CAST(d.n_chars AS DOUBLE), p5), p95), 6) AS clipped
        |FROM documents d JOIN b USING (source)""".stripMargin) { (s, d) =>
      graft.ops.Robust.winsorize(Tables.documents(s, d), "doc_id", "source",
        col("n_chars"), lo = 0.05, hi = 0.95)
    },

    // median/MAD robust z-score outliers per source (Hampel rule) — the
    // heavy-tail-proof twin of q_event_zscore's mean/sigma flags
    q("q_mad_outliers",
      """WITH v AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS v FROM documents),
        |m AS (SELECT source, round(quantile_cont(v, 0.5), 6) AS med FROM v GROUP BY source),
        |dv AS (SELECT v.doc_id, v.source, v.v, m.med, abs(v.v - m.med) AS ad
        |       FROM v JOIN m USING (source)),
        |md AS (SELECT source, round(quantile_cont(ad, 0.5), 6) AS mad FROM dv GROUP BY source)
        |SELECT doc_id, source, v, med, mad,
        |  round((v - med) / (CAST(1.4826 AS DOUBLE) * mad), 6) AS rz
        |FROM dv JOIN md USING (source)
        |WHERE mad > 0
        |  AND abs(round((v - med) / (CAST(1.4826 AS DOUBLE) * mad), 6)) > 2.0""".stripMargin) { (s, d) =>
      graft.ops.Robust.madOutliers(Tables.documents(s, d), "doc_id", "source",
        col("n_chars"), cutoff = 2.0)
    },

    // precision/recall sweep over every distinct classifier score — the
    // threshold-calibration table off the MEMOIZED trained classifier
    // (exact suffix-sum counts via the token-budget bucket decomposition)
    q("q_pr_curve",
      s"""WITH ${logRegCtes(32, 3)},
         |zf AS (SELECT doc_id, sum(w.w * x.x) AS z FROM x JOIN w3 w USING (j) GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |  round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-CAST(z AS DOUBLE))), 6) AS score
         |  FROM zf),
         |scj AS (SELECT sc.doc_id, sc.score, CAST(y.y AS BIGINT) AS yb
         |        FROM sc JOIN y USING (doc_id)),
         |per AS (SELECT score AS t, CAST(sum(yb) AS BIGINT) AS np,
         |               CAST(count(*) AS BIGINT) AS nt FROM scj GROUP BY 1),
         |tot AS (SELECT CAST(sum(yb) AS BIGINT) AS pos_total FROM scj),
         |r AS (SELECT t, sum(np) OVER (ORDER BY t DESC) AS tp,
         |             sum(nt) OVER (ORDER BY t DESC) AS pp FROM per)
         |SELECT t, CAST(tp AS BIGINT) AS tp, CAST(pp - tp AS BIGINT) AS fp,
         |  CAST(pos_total - tp AS BIGINT) AS fn,
         |  round(CAST(tp AS DOUBLE) / pp, 6) AS prec,
         |  round(CAST(tp AS DOUBLE) / pos_total, 6) AS rec,
         |  round(CAST(2 AS DOUBLE) * tp / (pp + pos_total), 6) AS f1
         |FROM r CROSS JOIN tot""".stripMargin) { (s, d) =>
      Corpus.prCurve(
        Corpus.trainQualityClassifier(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en", dims = 32, rounds = 3), "score", "y")
    },

    // exact ROC AUC of the trained classifier (Mann–Whitney rank-sum form:
    // integer-exact off the per-score histogram; reads the memoized scores)
    q("q_auc",
      s"""WITH ${logRegCtes(32, 3)},
         |zf AS (SELECT doc_id, sum(w.w * x.x) AS z FROM x JOIN w3 w USING (j) GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |  round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-CAST(z AS DOUBLE))), 6) AS score
         |  FROM zf),
         |scj AS (SELECT sc.score, CAST(y.y AS BIGINT) AS yb FROM sc JOIN y USING (doc_id)),
         |per AS (SELECT score AS t, CAST(sum(yb) AS BIGINT) AS np,
         |               CAST(count(*) - sum(yb) AS BIGINT) AS nn FROM scj GROUP BY 1),
         |r AS (SELECT np, nn,
         |  coalesce(sum(nn) OVER (ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
         |  FROM per)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         |  round(CAST(sum(np * (2 * neg_below + nn)) AS DOUBLE)
         |        / (CAST(2 AS DOUBLE) * sum(np) * sum(nn)), 6) AS auc
         |FROM r""".stripMargin) { (s, d) =>
      Corpus.aucFromScores(
        Corpus.trainQualityClassifier(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en", dims = 32, rounds = 3), "score", "y")
    },

    // unicode canonicalization: NFC composition + accent folding as native
    // codegen'd Catalyst expressions (java.text.Normalizer kernels); the
    // ASCII corpus gets composed AND decomposed accent tails appended so
    // the gate exercises real (re)composition — DuckDB's utf8proc twins
    // must agree byte-for-byte
    q("q_text_normalize",
      """WITH a AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' café señor'
        |       WHEN doc_id % 3 = 1 THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |       ELSE '' END AS aug FROM documents)
        |SELECT doc_id, nfc_normalize(aug) AS norm, strip_accents(aug) AS stripped,
        |  CAST(length(aug) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(aug)) AS BIGINT) AS n_after
        |FROM a""".stripMargin) { (s, d) =>
      graft.functions.UnicodeFunctions.register(s)
      import graft.functions.UnicodeFunctions.{nfcNormalize, stripAccents}
      val aug = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" café señor"))
          .when(col("doc_id") % 3 === 1, lit(" cafe\u0301 nai\u0308ve"))
          .otherwise(lit("")))
      Tables.documents(s, d).select(col("doc_id"),
        nfcNormalize(aug).as("norm"), stripAccents(aug).as("stripped"),
        length(aug).cast("long").as("n_before"),
        length(nfcNormalize(aug)).cast("long").as("n_after"))
    },

    // REAL audio sample decode + features: RMS energy, peak, channel-0
    // zero crossings off the streamed PCM payload; the oracle replays the
    // id-seeded little-endian 16-bit samples analytically — the
    // sample-level extension of q_audio_meta's header gate
    q("q_audio_features",
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch, 100 + doc_id % 400 AS frames
        |           FROM documents WHERE doc_id < 100),
        |sx AS (SELECT doc_id, ch, unnest(range(0, frames * ch)) AS k FROM d),
        |v AS (SELECT doc_id, ch, k,
        |  CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
        |       ELSE lo + 256 * hi END AS s
        |  FROM (SELECT doc_id, ch, k,
        |          (doc_id * 131 + (2 * k) * 7) % 256 AS lo,
        |          (doc_id * 131 + (2 * k + 1) * 7) % 256 AS hi FROM sx) z),
        |c0 AS (SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS prev
        |       FROM v WHERE k % ch = 0),
        |cr AS (SELECT doc_id,
        |    CAST(count(*) FILTER (WHERE prev IS NOT NULL AND (s < 0) <> (prev < 0)) AS BIGINT) AS zero_crossings
        |  FROM c0 GROUP BY doc_id),
        |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |        CAST(sum(s * s) AS BIGINT) AS sum_sq, CAST(max(abs(s)) AS INT) AS peak
        |       FROM v GROUP BY doc_id)
        |SELECT ag.doc_id, ag.n_samples, ag.sum_sq, ag.peak, cr.zero_crossings,
        |  round(sqrt(CAST(ag.sum_sq AS DOUBLE) / ag.n_samples), 6) AS rms
        |FROM ag JOIN cr USING (doc_id)""".stripMargin) { (s, d) =>
      Multimodal.audioFeatures(Multimodal.wavAssets(
        Tables.documents(s, d).filter(col("doc_id") < 100)))
        .select(col("doc_id"), col("n_samples"), col("sum_sq"), col("peak"),
          col("zero_crossings"), round(col("rms"), 6).as("rms"))
    },

    // Zipf-law fit per source: least-squares ln(freq)~ln(rank) over the
    // top-200 terms — natural text near slope −1, templated sources drift.
    // All four moments DECIMAL-exact; slope/intercept are single double
    // divisions, bit-equal cross-engine
    q("q_zipf_fit",
      s"""WITH t AS (SELECT doc_id, source, ${tokOf("text")} AS toks FROM documents),
         |f AS (SELECT source, tok, count(*) AS cnt
         |  FROM (SELECT source, unnest(toks) AS tok FROM t) e GROUP BY 1, 2),
         |r AS (SELECT source, cnt,
         |  row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok ASC) AS rank
         |  FROM f),
         |xy AS (SELECT source,
         |  CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
         |  CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
         |  FROM r WHERE rank <= 200),
         |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(x) AS DECIMAL(14,9)) AS sx, CAST(sum(y) AS DECIMAL(14,9)) AS sy,
         |  CAST(sum(CAST(x * y AS DECIMAL(25,18))) AS DECIMAL(24,18)) AS sxy,
         |  CAST(sum(CAST(x * x AS DECIMAL(25,18))) AS DECIMAL(24,18)) AS sxx
         |  FROM xy GROUP BY source),
         |s AS (SELECT source, n_terms, sx, sy,
         |  CAST(CAST(n_terms AS DECIMAL(6,0)) * sxy - sx * sy AS DOUBLE) /
         |  CAST(CAST(n_terms AS DECIMAL(6,0)) * sxx - sx * sx AS DOUBLE) AS slope
         |  FROM a)
         |SELECT source, n_terms, round(slope, 6) + 0 AS slope,
         |  round(CAST(sy AS DOUBLE) / n_terms
         |        - slope * (CAST(sx AS DOUBLE) / n_terms), 6) + 0 AS intercept
         |FROM s""".stripMargin) { (s, d) =>
      Corpus.zipfFit(Tables.documents(s, d), "doc_id", "source", "text",
        topK = 200)
    },

    // HyperLogLog distinct sketch per source over 3-gram shingles — the
    // 64-byte-register sibling of q_kmv_distinct: the RAW shingle stream
    // folds without any distinct-shuffle; exact-integer register sum S =
    // Σ 2^(55-Mⱼ), so the α·m²·2^55/S estimate is one double division on
    // both engines (n_exact = the accuracy gauge, as in the KMV row)
    q("q_hll_distinct",
      s"""WITH t AS (SELECT doc_id, source, ${tokOf("text")} AS toks FROM documents),
         |w AS (SELECT source, unnest(${shingleSql(3)}) AS sh FROM t),
         |hh AS (SELECT source, ${hash60Sql("sh")} AS h FROM w),
         |regs AS (SELECT source, h % 64 AS b,
         |    max(CASE WHEN h // 64 = 0 THEN 55
         |             ELSE 55 - length(bin(h // 64)) END) AS mreg
         |  FROM hh GROUP BY 1, 2),
         |agg AS (SELECT source,
         |    CAST(sum(CAST(1 AS BIGINT) << (55 - mreg))
         |         + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT) AS s_reg,
         |    CAST(64 - count(*) AS BIGINT) AS n_empty
         |  FROM regs GROUP BY source),
         |ex AS (SELECT source, CAST(count(DISTINCT sh) AS BIGINT) AS n_exact
         |       FROM w GROUP BY source)
         |SELECT ex.source, ex.n_exact, agg.s_reg, agg.n_empty,
         |  round(CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE) / CAST(agg.s_reg AS DOUBLE) <= 160.0
         |               AND agg.n_empty > 0
         |        THEN 64.0 * ln(64.0 / CAST(agg.n_empty AS DOUBLE))
         |        ELSE CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE) / CAST(agg.s_reg AS DOUBLE) END, 6) AS est
         |FROM ex JOIN agg USING (source)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Sketch.registerKernels(docs)
      val sh = Corpus.tokens(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"),
          explode(graft.functions.TextFunctions.shinglesFromTokens(col("toks"), 3)).as("sh"))
      sh.select(col("source"), col("sh"), Sketch.hash60(col("sh")).as("h"))
        .groupBy(col("source"))
        .agg(countDistinct(col("sh")).as("n_exact"),
          Sketch.hllEstimate(col("h")).as("hll"))
        .select(col("source"), col("n_exact"), col("hll.s_reg").as("s_reg"),
          col("hll.n_empty").as("n_empty"), round(col("hll.est"), 6).as("est"))
    },

    // kNN-distance outlier score: mean cosine distance to the 5 nearest
    // in-cell neighbors — rides the SAME memoized quantizer + knn edge
    // stream as q_knn_graph; decimal-exact mean, one double division
    q("q_knn_outlier",
      s"""SELECT src_id AS vec_id, CAST(count(*) AS BIGINT) AS n_nbrs,
         |  round(1.0 - CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) + 0 AS outlier
         |FROM (${DocQueries2.knnGraphSql(8, 2, 5)}) g
         |GROUP BY src_id""".stripMargin) { (s, d) =>
      Ann.knnOutlierScores(Tables.embeddings(s, d), nClusters = 8, iters = 2,
        k = 5)
    },

    // token-budget curriculum cut: best docs by mean-token-length score
    // until 50% of the corpus' tokens are spent. The oracle is the naive
    // global window; the engine computes the identical exclusive running
    // sum via score-interval buckets (tiny broadcast histogram + PARTITIONED
    // per-bucket windows — no global sort at any size)
    q("q_token_budget",
      s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
         |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  round(CASE WHEN len(toks) > 0
         |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         |    ELSE 0 END, 4) AS score FROM t),
         |tot AS (SELECT 0.5 * sum(n_tokens) AS budget FROM s),
         |r AS (SELECT doc_id, n_tokens, score,
         |  sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tokens_before
         |  FROM s)
         |SELECT doc_id, n_tokens, score, CAST(tokens_before AS BIGINT) AS tokens_before
         |FROM r CROSS JOIN tot WHERE tokens_before < budget""".stripMargin,
      bench = true) { (s, d) =>
      graft.ops.Packing.tokenBudgetSelect(Tables.documents(s, d), "doc_id",
        "text", frac = 0.5)
    },

    // intra-document repetition removal: repeated 3-token chunks within a
    // doc collapse to their first occurrence (Gopher duplicate-line rule,
    // within-doc half of q_boilerplate_removal). The corpus has no natural
    // intra-doc repetition, so every 4th doc gets a period-3 repeated tail
    // appended (c4Aug/urlAug synthesis precedent) — any chunk alignment of
    // a period-3 run yields identical consecutive chunks
    q("q_intradoc_dedup",
      s"""WITH t AS (SELECT doc_id, ${tokOf("aug")} AS toks FROM (
         |    SELECT doc_id, text || CASE WHEN doc_id % 4 = 0
         |      THEN repeat(' click here now', 4) ELSE '' END AS aug
         |    FROM documents)),
         |ce AS (SELECT doc_id, generate_subscripts(chs, 1) AS pos, unnest(chs) AS c
         |  FROM (SELECT doc_id,
         |    list_transform(range(1, len(toks) + 1, 3), i ->
         |      array_to_string(list_slice(toks, i, i + 2), ' ')) AS chs FROM t)),
         |f AS (SELECT doc_id, c, min(pos) AS pos, count(*) AS occ
         |  FROM ce GROUP BY 1, 2)
         |SELECT doc_id, string_agg(c, ' ' ORDER BY pos) AS text_clean,
         |  CAST(sum(occ) AS BIGINT) AS n_chunks,
         |  CAST(sum(occ) - count(*) AS BIGINT) AS n_removed
         |FROM f GROUP BY doc_id""".stripMargin) { (s, d) =>
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 4 === 0,
          lit(" click here now" * 4)).otherwise(lit(""))).as("text"))
      Corpus.intraDocDedup(aug, "doc_id", "text", chunk = 3)
    },

    // max-probability segmentation against the REAL production lexicon —
    // ICU4J's bundled cjdict (254k Han entries, ICU/Unicode license, on the
    // Spark classpath), held as broadcast DATA through CjkSegment's
    // edge-join dataflow instead of tokenizeCjkFreq's expression-tree demo
    // dict. The oracle enumerates every segmentation with the SAME integer
    // snlp scores (relevant lexicon slice inlined as VALUES) and takes the
    // (score DESC, length-sequence DESC) argmax — the q_tokenize_cjk_freq
    // tie contract at real dictionary width. Slice exactness is ENFORCED by
    // construction, not assumed: latin ' x ' separators flank `source` (so
    // an empty or Han-edged source can never merge a run across the literal
    // boundary and admit cross-boundary cjdict words the VALUES slice
    // omits) and any interior Han in `source` is stripped on BOTH sides —
    // the only Han runs reaching the DP are exactly the two literals.
    q("q_tokenize_cjk_real", {
      val lexMap = graft.functions.IcuLexicon.cjkScoreLexicon.toMap
      val unk = graft.functions.IcuLexicon.cjkUnknownScore
      val hanLits = Seq("研究生命起源",
        "图数据库分词引擎")
      val rel = hanLits.flatMap { t =>
        for {
          i <- 0 until t.length
          n <- 1 to math.min(6, t.length - i)
        } yield t.substring(i, i + n)
      }.distinct.flatMap(w => lexMap.get(w).map(lp => (w, w.length, lp)))
      val values = rel.map { case (w, n, lp) =>
        s"('$w', $n, CAST($lp AS BIGINT))" }.mkString(",\n         |  ")
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |    '${hanLits.head}' || ' x ' ||
         |    regexp_replace(source, '\\p{Han}', '', 'g') || ' x ' ||
         |    '${hanLits(1)}' || CAST(doc_id % 10 AS VARCHAR) AS zh
         |  FROM documents WHERE doc_id < 200),
         |rl AS (SELECT doc_id,
         |    regexp_extract_all(lower(zh), '([a-z0-9]+|\\p{Han}+)', 1) AS rs FROM t),
         |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
         |dict(w, n, lp) AS (VALUES $values),
         |cands(w, n, lp) AS (SELECT w, n, lp FROM dict
         |  UNION ALL SELECT NULL, 1, CAST($unk AS BIGINT)),
         |seg(doc_id, ord, r, pos, toks, score, lens) AS (
         |  SELECT doc_id, ord, r, CAST(1 AS BIGINT), CAST([] AS VARCHAR[]),
         |         CAST(0 AS BIGINT), ''
         |  FROM runs WHERE regexp_full_match(r, '\\p{Han}+')
         |  UNION ALL
         |  SELECT doc_id, ord, r, pos + n, toks || [substr(r, pos, CAST(n AS BIGINT))],
         |         score + lp, lens || CAST(n AS VARCHAR)
         |  FROM (SELECT seg.*, c.n, c.lp
         |        FROM seg JOIN cands c
         |          ON (c.w IS NULL OR substr(seg.r, seg.pos, CAST(c.n AS BIGINT)) = c.w)
         |        WHERE seg.pos <= length(seg.r)) z),
         |fin AS (SELECT doc_id, ord, toks, score, lens FROM seg WHERE pos > length(r)),
         |best AS (SELECT doc_id, ord, toks FROM (
         |    SELECT fin.*, row_number() OVER (PARTITION BY doc_id, ord
         |      ORDER BY score DESC, lens DESC) AS rn FROM fin) zz WHERE rn = 1),
         |allr AS (SELECT doc_id, ord, toks FROM best
         |         UNION ALL
         |         SELECT doc_id, ord, [r] FROM runs
         |         WHERE NOT regexp_full_match(r, '\\p{Han}+')),
         |agg AS (SELECT doc_id, flatten(list(toks ORDER BY ord)) AS toks
         |        FROM allr GROUP BY doc_id)
         |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM agg""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val lex = graft.functions.IcuLexicon.cjkScoreLexicon.toDF("word", "lp")
      graft.ops.CjkSegment.segment(
        Tables.documents(s, d).filter(col("doc_id") < 200), "doc_id",
        concat(lit("研究生命起源"), lit(" x "),
          regexp_replace(col("source"), lit("\\p{IsHan}"), lit("")),
          lit(" x "), lit("图数据库分词引擎"),
          (col("doc_id") % 10).cast("string")),
        lex, maxLen = 6,
        unknownScore = graft.functions.IcuLexicon.cjkUnknownScore)
    })
}
