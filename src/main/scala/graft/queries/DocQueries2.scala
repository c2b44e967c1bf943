package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.{Ann, Corpus, Sketch}
import QueryDef._

/** Round-6 curation/embedding operators: C4 rule bundle, KMV distinct
  * sketch, JL random projection, clustered kNN graph. Oracles mirror the
  * md5-derived constants exactly (the [[DocQueries]] contract). */
object DocQueries2 {

  private def tokOf(c: String) =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** DuckDB twin of Sketch.hash60: first 15 hex chars of md5 → BIGINT. */
  private def hash60Sql(c: String): String =
    (0 until 15).map { j =>
      val mult = math.pow(16, 14 - j).toLong
      s"(strpos('0123456789abcdef', substr(md5($c), ${j + 1}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Word 3-gram shingles over a `toks` column (identical to
    * TextFunctions.shinglesFromTokens incl. short-doc fallback). */
  private def shingleSql(n: Int) =
    s"""list_distinct(CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
       |  ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  /** Same correlated-subquery cosine as DocQueries.cosExpr (double math in
    * VectorFunctions.cosine's fold order). */
  private def cosExpr(x: String, y: String): String =
    s"""((SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
       |  FROM (SELECT unnest($x) AS a, unnest($y) AS b) zz1) /
       | sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest($x) AS a) zz2) *
       |      (SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT unnest($y) AS b) zz3)))""".stripMargin

  /** The deterministic text augmentation that makes the C4 drop-rules
    * discriminative on a boilerplate-free synthetic corpus (the
    * q_redact_pii synthesis precedent): selected docs get a lorem-ipsum
    * tail, a code brace, or a policy phrase. */
  private val c4AugSql =
    """text ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum dolor sit amet' ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0 THEN ' function() { return 1; }' ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0 THEN ' see our privacy policy for details' ELSE '' END""".stripMargin

  private def c4Aug = concat(col("text"),
    when(col("doc_id") % 7 === 0, lit(" lorem ipsum dolor sit amet")).otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit(" function() { return 1; }")).otherwise(lit("")),
    when(col("doc_id") % 13 === 0, lit(" see our privacy policy for details")).otherwise(lit("")))

  def kmvSql(k: Int): String =
    s"""WITH t AS (SELECT doc_id, source, ${tokOf("text")} AS toks FROM documents),
       |w AS (SELECT source, unnest(${shingleSql(3)}) AS sh FROM t),
       |d AS (SELECT DISTINCT source, sh FROM w),
       |h AS (SELECT DISTINCT source, ${hash60Sql("sh")} AS h FROM d),
       |km AS (SELECT source, h FROM (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h)
       |  WHERE rn <= $k),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
       |        FROM km GROUP BY source),
       |ex AS (SELECT source, CAST(count(DISTINCT sh) AS BIGINT) AS n_exact
       |       FROM w GROUP BY source)
       |SELECT ex.source, ex.n_exact, agg.n_kept,
       |  round(CASE WHEN agg.n_kept < $k THEN CAST(agg.n_kept AS DOUBLE)
       |        ELSE (CAST(${k - 1} AS DOUBLE) * 1152921504606846976.0) / CAST(agg.hk AS DOUBLE) END, 6) AS est
       |FROM ex JOIN agg USING (source)""".stripMargin

  def rpSql(dOut: Int, dims: Int): String =
    (0 until dOut).map { i =>
      val signs = (0 until dims)
        .map(j => if (Ann.projSign(i, j) > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"""SELECT vec_id, CAST($i AS BIGINT) AS dim,
         |  round((SELECT sum(CAST(a AS DOUBLE) * b)
         |         FROM (SELECT unnest(embedding) AS a, unnest($signs) AS b) z)
         |        / sqrt(CAST($dOut AS DOUBLE)), 6) AS v
         |FROM embeddings""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The unrolled fp-stabilized Lloyd's chain of DocQueries.semDedupSql
    * (full-table candidates) up to the `assigned(vec_id, embedding, cid)`
    * CTE — shared by the kNN-graph and topic-keyword oracles. */
  def kmeansAssignedCtes(nClusters: Int, iters: Int): String = {
    def iter(prev: String, n: Int): String =
      s"""a${n}_scored AS MATERIALIZED (
         |  SELECT c.vec_id, c.embedding, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
         |  FROM cands c CROSS JOIN $prev t),
         |a$n AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
         |    FROM a${n}_scored) WHERE rn = 1),
         |m$n AS MATERIALIZED (
         |  SELECT cid, list(m ORDER BY i) AS cem FROM (
         |    SELECT cid, i, round(avg(CAST(v AS DOUBLE)), 6) AS m
         |    FROM (SELECT cid, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
         |          FROM a$n) z
         |    GROUP BY cid, i) zz GROUP BY cid),
         |c$n AS MATERIALIZED (
         |  SELECT p.cid, COALESCE(m$n.cem, p.ce) AS ce FROM $prev p LEFT JOIN m$n USING (cid)),"""
    s"""cands AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM cands ORDER BY vec_id LIMIT $nClusters),
       |${(1 to iters).map(n => iter(s"c${n - 1}", n)).mkString("\n")}
       |fin_scored AS MATERIALIZED (
       |  SELECT c.vec_id, c.embedding, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
       |  FROM cands c CROSS JOIN c$iters t),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |    FROM fin_scored) WHERE rn = 1)""".stripMargin
  }

  /** Trained-quantizer kNN-graph oracle: the unrolled fp-stabilized Lloyd's
    * of DocQueries.semDedupSql (same training, full table), then exact
    * cosine top-k per vector within its cell. */
  def knnGraphSql(nClusters: Int, iters: Int, k: Int): String = {
    s"""WITH ${kmeansAssignedCtes(nClusters, iters)},
       |scored AS (
       |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
       |         ${cosExpr("x.embedding", "y.embedding")} AS sim
       |  FROM assigned x JOIN assigned y
       |    ON x.cid = y.cid AND x.vec_id <> y.vec_id)
       |SELECT src_id, dst_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, dst_id) AS rank
       |      FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    q("q_c4_rules",
      s"""WITH t AS (SELECT doc_id, $c4AugSql AS aug FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(${tokOf("aug")}) AS BIGINT) AS n_words,
         |  contains(lower(aug), 'lorem ipsum') AS has_lorem,
         |  contains(lower(aug), '{') AS has_brace,
         |  (contains(lower(aug), 'privacy policy') OR contains(lower(aug), 'cookie policy')
         |    OR contains(lower(aug), 'terms of use')) AS has_policy
         |  FROM t)
         |SELECT doc_id, n_words, has_lorem, has_brace, has_policy,
         |  CAST((n_words >= 5 AND NOT has_lorem AND NOT has_brace AND NOT has_policy) AS INT) AS pass
         |FROM r""".stripMargin) { (s, d) =>
      Corpus.c4Rules(
        Tables.documents(s, d).select(col("doc_id"), c4Aug.as("text")),
        "doc_id", "text", minWords = 5)
    },

    // KMV distinct-count sketch per source over 3-gram shingles — the
    // bounded-buffer TypedImperativeAggregate (k longs cross the wire per
    // group; the exact countDistinct column is the accuracy gauge)
    q("q_kmv_distinct", kmvSql(64), bench = true) { (s, d) =>
      val docs = Tables.documents(s, d)
      Sketch.registerKernels(docs)
      val sh = Corpus.tokens(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"),
          explode(TextFunctions.shinglesFromTokens(col("toks"), 3)).as("sh"))
      sh.select(col("source"), col("sh"), Sketch.hash60(col("sh")).as("h"))
        .groupBy(col("source"))
        .agg(countDistinct(col("sh")).as("n_exact"),
          Sketch.kmvEstimate(col("h"), 64).as("kmv"))
        .select(col("source"), col("n_exact"),
          col("kmv.n_kept").as("n_kept"), round(col("kmv.est"), 6).as("est"))
    },

    // Johnson–Lindenstrauss ±1 random projection 64 → 16 dims (long-form
    // output; the sign matrix is a shared planning-time constant)
    q("q_rp_reduce", rpSql(16, 64)) { (s, d) =>
      Ann.randomProjection(Tables.embeddings(s, d), "vec_id", "embedding",
        dOut = 16, dims = 64)
    },

    // clustered kNN graph: cosine top-5 within trained k-means cells —
    // rides the same memoized full-table quantizer as q_semantic_dedup
    q("q_knn_graph", knnGraphSql(8, 2, 5), bench = true) { (s, d) =>
      Ann.knnGraph(Tables.embeddings(s, d), nClusters = 8, iters = 2, k = 5)
    },

    // deterministic stratified train/val/test split: md5-uniform draw per
    // doc, thresholds applied WITHIN each source stratum — the canonical
    // dataset-split op (mixSample's 3-way labeled sibling). Shuffle-free
    // narrow map; reproducible across engines and runs by construction.
    q("q_split_assign",
      {
        def d4(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
        val h16 = s"(${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})"
        s"""SELECT doc_id, source,
           |  CASE WHEN $h16 < 52429 THEN 'train'
           |       WHEN $h16 < 58982 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents""".stripMargin
      }) { (s, d) =>
      // same uniform draw as Packing.hash16 / mixSample — first 16 md5 bits
      val h = graft.ops.Packing.hash16(col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        when(h < 52429, "train").when(h < 58982, "val").otherwise("test")
          .as("split"))
    },

    // windowed co-occurrence PMI: top collocations (exact integer counts →
    // fixed-order log terms, so the doubles rank identically cross-engine)
    q("q_pmi_pairs",
      s"""WITH t AS (SELECT doc_id, ${tokOf("text")} AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM t),
         |pr AS (SELECT least(l.tok, r.tok) AS x, greatest(l.tok, r.tok) AS y
         |       FROM e l JOIN e r ON r.doc_id = l.doc_id AND r.pos > l.pos AND r.pos <= l.pos + 2),
         |cxy AS (SELECT x, y, count(*) AS cxy FROM pr GROUP BY x, y),
         |cx AS (SELECT tok, count(*) AS c FROM e GROUP BY tok),
         |tt AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM cx) AS t,
         |              (SELECT CAST(sum(cxy) AS DOUBLE) FROM cxy) AS p)
         |SELECT x, y, CAST(cxy AS BIGINT) AS cxy, round(pmi, 6) + 0 AS pmi FROM (
         |  SELECT c.x, c.y, c.cxy,
         |    ln(c.cxy / tt.p) - ln(a.c / tt.t) - ln(b.c / tt.t) AS pmi
         |  FROM cxy c JOIN cx a ON a.tok = c.x JOIN cx b ON b.tok = c.y CROSS JOIN tt
         |  WHERE c.cxy >= 5)
         |ORDER BY pmi DESC, x, y LIMIT 20""".stripMargin) { (s, d) =>
      Corpus.pmiPairs(Tables.documents(s, d), "doc_id", "text",
        window = 2, minCount = 5, k = 20)
    })
}
