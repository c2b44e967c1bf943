package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{TextFunctions, VectorFunctions}
import graft.ops.{Ann, Dedup, Multimodal}
import QueryDef._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup (exact / MinHash+LSH / SimHash / n-gram jaccard), similarity
  * search (brute-force + SRP-bucketed ANN), text analysis (lang-id,
  * quality, token counts, fingerprints) and multimodal binary plumbing.
  * Oracles mirror the md5-based hash families exactly, so even the LSH
  * candidate sets are reproducible in DuckDB. */
object DocQueries {

  /** DuckDB tokenizer identical to TextFunctions.tokenize. */
  private def tokOf(c: String) =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), t -> len(t) > 0)"
  private val tok = tokOf("text")

  /** DuckDB word n-gram shingles identical to
    * TextFunctions.shinglesFromTokens(toks, n) (incl. the short-doc
    * whole-sequence fallback). */
  private def shingleSql(n: Int) =
    s"""list_distinct(CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
       |  ELSE [array_to_string(toks, ' ')] END)""".stripMargin
  private val shingle3 = shingleSql(3)

  /** DuckDB twin of Packing.hash16: uniform [0, 2^16) from the first 4 md5
    * hex digits of the stringified doc_id. */
  private val hash16Sql = {
    def d(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
    s"(${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)})"
  }

  private val K = 12; private val BANDS = 6; private val ROWS = 2
  private val P = graft.functions.HashFunctions.MinhashPrime

  /** md5-hex(15 chars) → int64 mod p, identical to HashFunctions.shingleBase. */
  private def hexBaseExpr: String = {
    val terms = (0 until 15).map { j =>
      val mult = math.pow(16, 14 - j).toLong
      s"(strpos('0123456789abcdef', substr(md5(s), ${j + 1}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString(" + ")
    s"list_transform(sh, s -> ($terms) % $P)"
  }

  private def sigExprs: String =
    (0 until K).map { i =>
      val a = graft.functions.HashFunctions.minhashA(i)
      val b = graft.functions.HashFunctions.minhashB(i)
      s"list_min(list_transform(base, h -> ($a * h + $b) % $P))"
    }.mkString("[", ", ", "]")

  private def bandExprs: String =
    (0 until BANDS).map { b =>
      val parts = (0 until ROWS).map(r => s"CAST(sig[${b * ROWS + r + 1}] AS VARCHAR)")
      (s"'$b'" +: parts).mkString(" || '|' || ")
    }.mkString("[", ", ", "]")

  /** The MinHash CTE chain up to verified pair scores (`j`), shared by the
    * pair query and the transitive-cluster query. */
  private def minhashPairsCtes: String =
    s"""toks AS MATERIALIZED (SELECT doc_id, $tok AS toks FROM documents),
       |sh AS MATERIALIZED (SELECT doc_id, $shingle3 AS sh FROM toks),
       |base AS MATERIALIZED (SELECT doc_id, sh, $hexBaseExpr AS base FROM sh),
       |sig AS MATERIALIZED (SELECT doc_id, sh, $sigExprs AS sig FROM base),
       |bk AS MATERIALIZED (SELECT doc_id, unnest($bandExprs) AS bucket FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |j AS (SELECT a, b,
       |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |        len(list_distinct(sa.sh || sb.sh)) AS jaccard
       |      FROM cand JOIN sh sa ON sa.doc_id = cand.a JOIN sh sb ON sb.doc_id = cand.b)""".stripMargin

  def minhashSql: String =
    s"""WITH $minhashPairsCtes
       |SELECT a, b, round(jaccard, 9) AS jaccard FROM j WHERE jaccard >= 0.5""".stripMargin

  /** Fuzzy-decontamination oracle: the same MinHash chain, but candidates
    * pair the corpus split (doc_id ≥ benchCut) against the benchmark split
    * (doc_id < benchCut) instead of all a<b pairs. */
  def fuzzyDecontamSql(benchCut: Long, threshold: Double): String =
    s"""WITH toks AS MATERIALIZED (SELECT doc_id, $tok AS toks FROM documents),
       |sh AS MATERIALIZED (SELECT doc_id, $shingle3 AS sh FROM toks),
       |base AS MATERIALIZED (SELECT doc_id, sh, $hexBaseExpr AS base FROM sh),
       |sig AS MATERIALIZED (SELECT doc_id, sh, $sigExprs AS sig FROM base),
       |bk AS MATERIALIZED (SELECT doc_id, unnest($bandExprs) AS bucket FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS bench_id
       |         FROM bk x JOIN bk y ON x.bucket = y.bucket
       |         WHERE x.doc_id >= $benchCut AND y.doc_id < $benchCut),
       |j AS (SELECT cand.doc_id, cand.bench_id,
       |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |        len(list_distinct(sa.sh || sb.sh)) AS jaccard
       |      FROM cand JOIN sh sa ON sa.doc_id = cand.doc_id
       |                JOIN sh sb ON sb.doc_id = cand.bench_id)
       |SELECT doc_id, bench_id, round(jaccard, 9) AS jaccard
       |FROM j WHERE jaccard >= $threshold""".stripMargin

  /** Transitive near-dup clusters: connected components (min-id label) over
    * the verified pair graph, as a recursive reachability closure. */
  def dedupClustersSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |pairs AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
       |verts AS (SELECT DISTINCT v FROM (SELECT a AS v FROM pairs UNION SELECT b FROM pairs) z),
       |adjp AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
       |reach(s, d) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT r.s, a.d FROM reach r JOIN adjp a ON a.s = r.d)
       |SELECT s AS doc_id, min(d) AS cluster FROM reach GROUP BY s""".stripMargin

  def simhashSql: String = {
    val bits = (0 until 32).map { j =>
      val nib = j / 4 + 1; val off = 3 - (j % 4)
      s"""CASE WHEN list_sum(list_transform(toks,
         |  t -> (((strpos('0123456789abcdef', substr(md5(t), $nib, 1)) - 1) >> $off) & 1) * 2 - 1)) > 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $tok AS toks FROM documents)
       |SELECT doc_id, $bits AS simhash FROM t""".stripMargin
  }

  private val allStops =
    TextFunctions.langStopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")

  private def stopCount(lang: String): String = {
    val ws = TextFunctions.langStopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($ws)))"
  }

  def cosineSql(topK: Int, qFilter: String, cFilter: String): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE $qFilter),
       |c AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE $cFilter),
       |scored AS (
       |  SELECT q.query_id, c.vec_id,
       |    (SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
       |     FROM (SELECT unnest(q.qe) AS a, unnest(c.ce) AS b) z) /
       |    sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest(q.qe) AS a) z2) *
       |         (SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT unnest(c.ce) AS b) z3)) AS sim
       |  FROM q CROSS JOIN c)
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** Correlated-subquery cosine over two list columns, double math in the
    * exact same op order as VectorFunctions.cosine. */
  private def cosExpr(x: String, y: String): String =
    s"""((SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
       |  FROM (SELECT unnest($x) AS a, unnest($y) AS b) zz1) /
       | sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest($x) AS a) zz2) *
       |      (SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT unnest($y) AS b) zz3)))""".stripMargin

  def ivfSql(topK: Int, nCentroids: Int, nProbe: Int): String =
    s"""WITH cents AS MATERIALIZED (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |  WHERE vec_id >= 5 ORDER BY vec_id LIMIT $nCentroids),
       |cand_scored AS MATERIALIZED (
       |  SELECT c.vec_id, c.embedding, ct.cid, ${cosExpr("c.embedding", "ct.ce")} AS csim
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5) c
       |  CROSS JOIN cents ct),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |    FROM cand_scored) WHERE rn = 1),
       |probe_scored AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, q.embedding AS qe, ct.cid, ${cosExpr("q.embedding", "ct.ce")} AS csim
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
       |  CROSS JOIN cents ct),
       |probes AS MATERIALIZED (
       |  SELECT query_id, qe, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cid) AS rn
       |    FROM probe_scored) WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${cosExpr("p.qe", "a.embedding")} AS sim
       |  FROM assigned a JOIN probes p USING (cid))
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** k-means-trained IVF oracle: Lloyd's iterations unrolled as CTE blocks —
    * cosine assignment (ties → smallest cid), per-dimension mean rounded to
    * 6 decimals (the fp-stabilization contract of `Ann.kmeansCentroids`),
    * empty cells keep their centroid — then the standard IVF probe. */
  def ivfKmeansSql(topK: Int, nCentroids: Int, nProbe: Int): String = {
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
    s"""WITH cands AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM cands ORDER BY vec_id LIMIT $nCentroids),
       |${iter("c0", 1)}
       |${iter("c1", 2)}
       |fin_scored AS MATERIALIZED (
       |  SELECT c.vec_id, c.embedding, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
       |  FROM cands c CROSS JOIN c2 t),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |    FROM fin_scored) WHERE rn = 1),
       |probe_scored AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid, ${cosExpr("q.embedding", "t.ce")} AS csim
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q CROSS JOIN c2 t),
       |probes AS MATERIALIZED (
       |  SELECT query_id, qe, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cid) AS rn
       |    FROM probe_scored) WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${cosExpr("p.qe", "a.embedding")} AS sim
       |  FROM assigned a JOIN probes p USING (cid))
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin
  }

  /** PQ oracle: per subspace, the same unrolled fp-stabilized Lloyd's as
    * [[ivfKmeansSql]] over the subvector slice, nearest-code assignment,
    * reconstruction by list concatenation, exact cosine against x̂. */
  def pqSql(topK: Int, m: Int, ks: Int, dims: Int, iters: Int): String = {
    val sub = dims / m
    def subspace(s: Int): String = {
      val (lo, hi) = (s * sub + 1, (s + 1) * sub)
      def iter(n: Int): String =
        s"""s${s}a${n}_scored AS MATERIALIZED (
           |  SELECT c.vec_id, c.embedding, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
           |  FROM s${s}cands c CROSS JOIN s${s}c${n - 1} t),
           |s${s}a$n AS MATERIALIZED (
           |  SELECT vec_id, embedding, cid FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
           |    FROM s${s}a${n}_scored) WHERE rn = 1),
           |s${s}m$n AS MATERIALIZED (
           |  SELECT cid, list(m ORDER BY i) AS cem FROM (
           |    SELECT cid, i, round(avg(CAST(v AS DOUBLE)), 6) AS m
           |    FROM (SELECT cid, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
           |          FROM s${s}a$n) z
           |    GROUP BY cid, i) zz GROUP BY cid),
           |s${s}c$n AS MATERIALIZED (
           |  SELECT p.cid, COALESCE(s${s}m$n.cem, p.ce) AS ce
           |  FROM s${s}c${n - 1} p LEFT JOIN s${s}m$n USING (cid)),"""
      s"""s${s}cands AS MATERIALIZED (
         |  SELECT vec_id, embedding[$lo:$hi] AS embedding FROM cands),
         |s${s}c0 AS MATERIALIZED (
         |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
         |  FROM s${s}cands ORDER BY vec_id LIMIT $ks),
         |${(1 to iters).map(iter).mkString("\n")}
         |s${s}code_scored AS MATERIALIZED (
         |  SELECT c.vec_id, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
         |  FROM s${s}cands c CROSS JOIN s${s}c$iters t),
         |s${s}ce AS MATERIALIZED (
         |  SELECT k.vec_id, b.ce FROM (
         |    SELECT vec_id, cid FROM (
         |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
         |      FROM s${s}code_scored) WHERE rn = 1) k
         |  JOIN s${s}c$iters b USING (cid)),"""
    }
    val xhat = (0 until m).map(s => s"s$s.ce").mkString(" || ")
    val joins = (1 until m).map(s => s"JOIN s${s}ce s$s USING (vec_id)").mkString(" ")
    s"""WITH cands AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
       |${(0 until m).map(subspace).mkString("\n")}
       |recon AS MATERIALIZED (
       |  SELECT s0.vec_id, $xhat AS xhat FROM s0ce s0 $joins),
       |scored AS (
       |  SELECT q.vec_id AS query_id, r.vec_id, ${cosExpr("q.embedding", "r.xhat")} AS sim
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q CROSS JOIN recon r)
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin
  }

  /** IVF×PQ oracle: [[ivfKmeansSql]]'s trained coarse quantizer, cell
    * assignment and probes + [[pqSql]]'s per-subspace codebooks and
    * reconstruction — ADC scoring restricted to each query's probed cells. */
  def ivfPqSql(topK: Int, nCentroids: Int, nProbe: Int,
               m: Int, ks: Int, dims: Int, iters: Int): String = {
    val sub = dims / m
    def coarseIter(n: Int): String = {
      val prev = if (n == 1) "c0" else s"c${n - 1}"
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
    }
    def subspace(s: Int): String = {
      val (lo, hi) = (s * sub + 1, (s + 1) * sub)
      def iter(n: Int): String =
        s"""s${s}a${n}_scored AS MATERIALIZED (
           |  SELECT c.vec_id, c.embedding, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
           |  FROM s${s}cands c CROSS JOIN s${s}c${n - 1} t),
           |s${s}a$n AS MATERIALIZED (
           |  SELECT vec_id, embedding, cid FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
           |    FROM s${s}a${n}_scored) WHERE rn = 1),
           |s${s}m$n AS MATERIALIZED (
           |  SELECT cid, list(m ORDER BY i) AS cem FROM (
           |    SELECT cid, i, round(avg(CAST(v AS DOUBLE)), 6) AS m
           |    FROM (SELECT cid, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
           |          FROM s${s}a$n) z
           |    GROUP BY cid, i) zz GROUP BY cid),
           |s${s}c$n AS MATERIALIZED (
           |  SELECT p.cid, COALESCE(s${s}m$n.cem, p.ce) AS ce
           |  FROM s${s}c${n - 1} p LEFT JOIN s${s}m$n USING (cid)),"""
      s"""s${s}cands AS MATERIALIZED (
         |  SELECT vec_id, embedding[$lo:$hi] AS embedding FROM cands),
         |s${s}c0 AS MATERIALIZED (
         |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
         |  FROM s${s}cands ORDER BY vec_id LIMIT $ks),
         |${(1 to iters).map(iter).mkString("\n")}
         |s${s}code_scored AS MATERIALIZED (
         |  SELECT c.vec_id, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
         |  FROM s${s}cands c CROSS JOIN s${s}c$iters t),
         |s${s}ce AS MATERIALIZED (
         |  SELECT k.vec_id, b.ce FROM (
         |    SELECT vec_id, cid FROM (
         |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
         |      FROM s${s}code_scored) WHERE rn = 1) k
         |  JOIN s${s}c$iters b USING (cid)),"""
    }
    val xhat = (0 until m).map(s => s"s$s.ce").mkString(" || ")
    val joins = (1 until m).map(s => s"JOIN s${s}ce s$s USING (vec_id)").mkString(" ")
    s"""WITH cands AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM cands ORDER BY vec_id LIMIT $nCentroids),
       |${(1 to iters).map(coarseIter).mkString("\n")}
       |fin_scored AS MATERIALIZED (
       |  SELECT c.vec_id, t.cid, ${cosExpr("c.embedding", "t.ce")} AS csim
       |  FROM cands c CROSS JOIN c$iters t),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |    FROM fin_scored) WHERE rn = 1),
       |probe_scored AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid, ${cosExpr("q.embedding", "t.ce")} AS csim
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q CROSS JOIN c$iters t),
       |probes AS MATERIALIZED (
       |  SELECT query_id, qe, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cid) AS rn
       |    FROM probe_scored) WHERE rn <= $nProbe),
       |${(0 until m).map(subspace).mkString("\n")}
       |recon AS MATERIALIZED (
       |  SELECT s0.vec_id, $xhat AS xhat FROM s0ce s0 $joins),
       |scored AS (
       |  SELECT p.query_id, r.vec_id, ${cosExpr("p.qe", "r.xhat")} AS sim
       |  FROM recon r JOIN assigned a USING (vec_id) JOIN probes p USING (cid))
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin
  }

  /** SRP bucket expression with the plane-sign literals baked in. */
  def srpBucketSqlExpr(colName: String, bits: Int, dims: Int): String =
    VectorFunctions.planeSigns(bits, dims).map { signs =>
      val lits = signs.map(s => s"CAST($s AS DOUBLE)").mkString("[", ", ", "]")
      s"""CASE WHEN (SELECT sum(CAST(a AS DOUBLE) * s)
         |FROM (SELECT unnest($colName) AS a, unnest($lits) AS s) zz) >= 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")

  /** Embedding-cosine near-dup oracle: SRP-bucketed candidate pairs, exact
    * cosine verify, threshold on the UNROUNDED sim (mirrors
    * `Dedup.embeddingNearDups` double-op order exactly). */
  def embedDedupSql(threshold: Double, bits: Int, dims: Int): String = {
    val t = java.lang.Double.toString(threshold)
    s"""WITH b AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${srpBucketSqlExpr("embedding", bits, dims)} AS bucket
       |  FROM embeddings),
       |pairs AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b, ${cosExpr("x.embedding", "y.embedding")} AS sim
       |  FROM b x JOIN b y ON y.bucket = x.bucket AND x.vec_id < y.vec_id)
       |SELECT a, b, round(sim, 6) + 0 AS sim FROM pairs WHERE sim >= $t""".stripMargin
  }

  def srpSql(topK: Int, bits: Int, dims: Int): String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${srpBucketSqlExpr("embedding", bits, dims)} AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 5),
       |c AS (SELECT vec_id, embedding AS ce, bucket FROM b WHERE vec_id >= 5),
       |scored AS (
       |  SELECT q.query_id, c.vec_id,
       |    (SELECT sum(CAST(a AS DOUBLE) * CAST(b2 AS DOUBLE))
       |     FROM (SELECT unnest(q.qe) AS a, unnest(c.ce) AS b2) z) /
       |    sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest(q.qe) AS a) z2) *
       |         (SELECT sum(CAST(b2 AS DOUBLE) * CAST(b2 AS DOUBLE)) FROM (SELECT unnest(c.ce) AS b2) z3)) AS sim
       |  FROM q JOIN c USING (bucket))
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** Gopher rule-bundle CTE chain ending in `gq(doc_id, n_words,
    * mean_word_len, ttr, top_word_frac, stop_hits, pass)` — shared by the
    * rule query and the quality-weighted sampler. */
  def gopherCtes: String =
    s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
       |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM e GROUP BY 1, 2),
       |m AS (SELECT doc_id,
       |    CAST(sum(c) AS BIGINT) AS n_words,
       |    round(CAST(sum(length(w) * c) AS DOUBLE) / sum(c), 6) AS mean_word_len,
       |    round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
       |    round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_word_frac,
       |    CAST(count(*) FILTER (WHERE w IN ('the','a','and','of','to','in','is')) AS BIGINT) AS stop_hits
       |  FROM wc GROUP BY 1),
       |gq AS (SELECT *, CAST(CASE WHEN n_words BETWEEN 30 AND 100000
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND ttr >= 0.4 AND top_word_frac <= 0.12
       |    AND stop_hits >= 1 THEN 1 ELSE 0 END AS INT) AS pass
       |  FROM m)""".stripMargin

  /** Matryoshka two-stage oracle: coarse rank over the first `coarseDims`
    * list elements, full-vector rerank of the per-query top `rerankFrom`. */
  def matryoshkaSql(topK: Int, coarseDims: Int, rerankFrom: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE vec_id >= 5),
       |coarse AS (
       |  SELECT q.query_id, c.vec_id, q.qe, c.ce,
       |    ${cosExpr(s"list_slice(q.qe, 1, $coarseDims)", s"list_slice(c.ce, 1, $coarseDims)")} AS csim
       |  FROM c CROSS JOIN q),
       |surv AS (SELECT query_id, vec_id, qe, ce FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, vec_id) AS crank
       |  FROM coarse) z WHERE crank <= $rerankFrom),
       |fullv AS (SELECT query_id, vec_id, ${cosExpr("qe", "ce")} AS sim FROM surv)
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM fullv) z
       |WHERE rank <= $topK""".stripMargin

  /** Recall@k oracle: the exact and approximate top-k oracles nest as CTE
    * subqueries (DuckDB allows a WITH inside a CTE body); hits = the
    * (query_id, vec_id) intersection, recall = hits/k, queries with an
    * empty probe still report 0. */
  def recallSql(k: Int, exactSql: String, approxSql: String): String =
    s"""WITH exact_tk AS ($exactSql),
       |approx_tk AS ($approxSql),
       |hits AS (
       |  SELECT e.query_id, count(*) AS hits
       |  FROM exact_tk e JOIN approx_tk a USING (query_id, vec_id)
       |  GROUP BY e.query_id)
       |SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / $k, 6) AS recall
       |FROM (SELECT DISTINCT query_id FROM exact_tk) q
       |LEFT JOIN hits h USING (query_id)""".stripMargin

  /** Multi-probe SRP oracle: the query side expands to its own bucket plus
    * every single-bit flip; candidates keep exactly one bucket. */
  def srpMultiSql(topK: Int, bits: Int, dims: Int): String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${srpBucketSqlExpr("embedding", bits, dims)} AS bucket
       |  FROM embeddings),
       |q0 AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS b0 FROM b WHERE vec_id < 5),
       |q AS (SELECT query_id, qe,
       |        unnest([b0] || list_transform(range(1, $bits + 1), i ->
       |          substr(b0, 1, CAST(i - 1 AS INTEGER)) ||
       |          (CASE WHEN substr(b0, CAST(i AS INTEGER), 1) = '1' THEN '0' ELSE '1' END) ||
       |          substr(b0, CAST(i + 1 AS INTEGER)))) AS bucket
       |      FROM q0),
       |c AS (SELECT vec_id, embedding AS ce, bucket FROM b WHERE vec_id >= 5),
       |scored AS (
       |  SELECT q.query_id, c.vec_id,
       |    (SELECT sum(CAST(a AS DOUBLE) * CAST(b2 AS DOUBLE))
       |     FROM (SELECT unnest(q.qe) AS a, unnest(c.ce) AS b2) z) /
       |    sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest(q.qe) AS a) z2) *
       |         (SELECT sum(CAST(b2 AS DOUBLE) * CAST(b2 AS DOUBLE)) FROM (SELECT unnest(c.ce) AS b2) z3)) AS sim
       |  FROM q JOIN c USING (bucket))
       |SELECT query_id, vec_id, round(sim, 6) + 0 AS sim, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** Full corpus-cleaning pipeline restated in SQL: exact dedup → MinHash
    * near-dedup (same CTE chain as minhashSql, over the canon set) →
    * quality gate → language distribution. */
  def pipelineSql: String =
    s"""WITH canon AS MATERIALIZED (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
       |    FROM documents) WHERE rk = 1),
       |toks AS MATERIALIZED (SELECT doc_id, text, $tok AS toks FROM canon),
       |sh AS MATERIALIZED (SELECT doc_id, $shingle3 AS sh FROM toks),
       |base AS MATERIALIZED (SELECT doc_id, sh, $hexBaseExpr AS base FROM sh),
       |sig AS MATERIALIZED (SELECT doc_id, sh, $sigExprs AS sig FROM base),
       |bk AS MATERIALIZED (SELECT doc_id, unnest($bandExprs) AS bucket FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |losers AS (SELECT DISTINCT cand.b AS doc_id
       |           FROM cand JOIN sh sa ON sa.doc_id = cand.a JOIN sh sb ON sb.doc_id = cand.b
       |           WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |                 len(list_distinct(sa.sh || sb.sh)) >= 0.5),
       |surv AS (SELECT t.doc_id, t.toks FROM toks t
       |         WHERE t.doc_id NOT IN (SELECT doc_id FROM losers)),
       |qual AS (SELECT doc_id, toks FROM surv
       |         WHERE len(toks) >= 10 AND
       |               round(CASE WHEN len(toks) > 0
       |                 THEN CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE) / len(toks)
       |                 ELSE 0 END, 4) <= 0.9),
       |s AS (SELECT doc_id,
       |  ${stopCount("en")} AS s_en, ${stopCount("es")} AS s_es,
       |  ${stopCount("de")} AS s_de, ${stopCount("fr")} AS s_fr FROM qual)
       |SELECT CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
       |            WHEN s_fr > s_en AND s_fr > s_es AND s_fr > s_de THEN 'fr'
       |            WHEN s_de > s_en AND s_de > s_es THEN 'de'
       |            WHEN s_es > s_en THEN 'es'
       |            ELSE 'en' END AS lang_pred,
       |       CAST(count(*) AS BIGINT) AS n_docs
       |FROM s GROUP BY 1""".stripMargin

  /** SemDeDup oracle: the fp-stabilized unrolled Lloyd's of [[ivfKmeansSql]]
    * trained over ALL embeddings, deterministic cell cap, then within-cell
    * pairwise exact cosine — a vector is dropped iff a lower-id member of
    * its cell is ≥ threshold similar. */
  def semDedupSql(nClusters: Int, iters: Int, threshold: Double, cellCap: Int): String = {
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
    s"""WITH cands AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
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
       |    FROM fin_scored) WHERE rn = 1),
       |capped AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS crn
       |    FROM assigned) WHERE crn <= $cellCap),
       |dropped AS (
       |  SELECT DISTINCT y.vec_id
       |  FROM capped x JOIN capped y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE ${cosExpr("x.embedding", "y.embedding")} >= $threshold)
       |SELECT c.vec_id, c.cid AS cluster, (d.vec_id IS NULL) AS keep
       |FROM capped c LEFT JOIN dropped d ON c.vec_id = d.vec_id""".stripMargin
  }

  /** Non-distinct n-token windows (the multiset [[shingleSql]] dedups),
    * identical to TextFunctions.rawShinglesFromTokens. */
  private def rawWindowSql(n: Int) =
    s"""CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
       |  ELSE [array_to_string(toks, ' ')] END""".stripMargin

  def dupWindowsSql(n: Int): String =
    s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
       |w AS (SELECT doc_id, md5(unnest(${rawWindowSql(n)})) AS h FROM t),
       |f AS (SELECT h, count(*) AS freq FROM w GROUP BY h)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  round(CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
       |FROM w JOIN f USING (h) GROUP BY doc_id""".stripMargin

  def dsirSql(targetPred: String): String =
    s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
       |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |tgt AS (SELECT doc_id FROM documents WHERE $targetPred),
       |cr AS (SELECT tok, count(*) AS cr FROM e GROUP BY tok),
       |ct AS (SELECT tok, count(*) AS ct FROM e JOIN tgt USING (doc_id) GROUP BY tok),
       |st AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM cr) AS totr,
       |              (SELECT CAST(count(*) AS DOUBLE) FROM cr) AS v,
       |              (SELECT CAST(sum(ct) AS DOUBLE) FROM ct) AS tott),
       |d AS (SELECT tok,
       |        ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / (tott + v)) -
       |        ln(CAST(cr + 1 AS DOUBLE) / (totr + v)) AS d
       |      FROM cr LEFT JOIN ct USING (tok) CROSS JOIN st),
       |pd AS (SELECT doc_id, count(*) AS n_toks, round(sum(d), 6) + 0 AS logweight
       |       FROM e JOIN d USING (tok) GROUP BY doc_id)
       |SELECT a.doc_id, CAST(COALESCE(pd.n_toks, 0) AS BIGINT) AS n_toks,
       |       COALESCE(pd.logweight, 0.0) AS logweight
       |FROM (SELECT doc_id FROM documents) a LEFT JOIN pd USING (doc_id)""".stripMargin

  def bm25Sql(terms: Seq[String], k: Int, k1: Double, b: Double): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
       |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM e
       |       WHERE tok IN ($termList) GROUP BY doc_id, tok),
       |idf AS (SELECT tok, ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf, avgdl
       |        FROM (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
       |        CROSS JOIN st),
       |sc AS (SELECT doc_id,
       |         round(sum(idf * tf * ${k1 + 1} / (tf + $k1 * (${1 - b} + $b * dl / avgdl))), 6) AS score
       |       FROM tf JOIN dl USING (doc_id) JOIN idf USING (tok) GROUP BY doc_id)
       |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    q("q_corpus_pipeline", pipelineSql, bench = true) { (s, d) =>
      graft.ops.CorpusPipeline.langDistribution(Tables.documents(s, d),
        graft.ops.CorpusPipeline.Params(minTokens = 10, maxStopwordRatio = 0.9))
    },

    // generated docs are all distinct, so the plain-table variant proved
    // emptiness only — union an id-shifted copy of a slice on BOTH sides so
    // exact dup groups exist and the oracle gate carries real rows
    q("q_dedup_exact",
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50)
        |SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        |       CAST(count(*) AS BIGINT) AS n_dups
        |FROM u GROUP BY md5(text) HAVING count(*) > 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val shifted = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 100000L)
      Dedup.exactGroups(docs.unionByName(shifted), "doc_id", "text")
    },

    q("q_fingerprint",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents)
         |SELECT doc_id, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
         |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))
    },

    q("q_minhash_lsh", minhashSql, bench = true) { (s, d) =>
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
    },

    // asymmetric containment dedup — the sub-document duplication rule
    // (c(A→B) = |∩|/|S_A|) over the same pinned LSH candidates; catches
    // doc-inside-doc mirrors whose jaccard stays below the near-dup gate
    q("q_containment_dup",
      s"""WITH $minhashPairsCtes,
         |co AS (SELECT a, b,
         |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh) AS c_ab,
         |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh) AS c_ba
         |       FROM cand JOIN sh sa ON sa.doc_id = cand.a
         |                 JOIN sh sb ON sb.doc_id = cand.b)
         |SELECT a, b, round(c_ab, 9) AS c_ab, round(c_ba, 9) AS c_ba
         |FROM co WHERE greatest(c_ab, c_ba) >= 0.8""".stripMargin) { (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.8)
    },

    // cluster-representative retention: each near-dup cluster keeps its
    // longest member (ties → smallest id); unclustered docs keep themselves
    // — the quality-aware alternative to drop-the-larger-id
    q("q_dedup_keep_best",
      s"""WITH RECURSIVE $minhashPairsCtes,
         |pairs AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
         |verts AS (SELECT DISTINCT v FROM (SELECT a AS v FROM pairs UNION SELECT b FROM pairs) z),
         |adjp AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
         |reach(s, d) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT r.s, a.d FROM reach r JOIN adjp a ON a.s = r.d),
         |cl AS (SELECT s AS doc_id, min(d) AS cluster FROM reach GROUP BY s),
         |sc AS (SELECT doc_id, n_chars AS score FROM documents),
         |kp AS (SELECT cluster, doc_id AS keeper,
         |         row_number() OVER (PARTITION BY cluster
         |                            ORDER BY score DESC, doc_id ASC) AS rn
         |       FROM cl JOIN sc USING (doc_id)),
         |k1 AS (SELECT cluster, keeper FROM kp WHERE rn = 1)
         |SELECT sc.doc_id, coalesce(cl.cluster, sc.doc_id) AS cluster,
         |       (cl.cluster IS NULL OR k1.keeper = sc.doc_id) AS kept
         |FROM sc LEFT JOIN cl USING (doc_id)
         |        LEFT JOIN k1 ON k1.cluster = cl.cluster""".stripMargin) { (s, d) =>
      Dedup.keepBestPerCluster(Tables.documents(s, d), "doc_id", "text",
        scoreCol = col("n_chars"),
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
    },

    // incremental-ingest dedup: the 20% batch (doc_id % 10 >= 8) matched
    // against the stored corpus signatures + earlier batch rows — the
    // snapshot-over-snapshot mode; the corpus side reads the pinned
    // artifact and never self-joins
    q("q_incremental_dedup",
      s"""WITH $minhashPairsCtes,
         |candi AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS dup_of
         |          FROM bk x JOIN bk y ON x.bucket = y.bucket
         |          WHERE x.doc_id % 10 >= 8 AND y.doc_id <> x.doc_id
         |            AND (y.doc_id % 10 < 8 OR y.doc_id < x.doc_id)),
         |ji AS (SELECT new_id, dup_of,
         |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |        len(list_distinct(sa.sh || sb.sh)) AS jaccard
         |      FROM candi JOIN sh sa ON sa.doc_id = candi.new_id
         |                 JOIN sh sb ON sb.doc_id = candi.dup_of)
         |SELECT new_id, dup_of, round(jaccard, 9) AS jaccard
         |FROM ji WHERE jaccard >= 0.5""".stripMargin) { (s, d) =>
      Dedup.incrementalNearDups(Tables.documents(s, d), "doc_id", "text",
        isNew = col("doc_id") % 10 >= 8,
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
    },

    // transitive closure of the verified near-dup pairs: WCC (min-id label)
    // over the pair graph — pairs (a,b),(b,c) cluster a,b,c together
    q("q_dedup_clusters", dedupClustersSql) { (s, d) =>
      Dedup.nearDupClusters(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
    },

    // LSH recall gauge — the dedup twin of Ann.recallAtK: what fraction of
    // the TRUE ≥0.5-jaccard pairs (exact all-pairs on the bounded doc_id<50
    // universe, the q_ngram_jaccard precedent) did banding surface? The
    // tuning loop every LSH deployment runs (bands/rows against measured
    // recall on a sampled universe). Both sides read the session-pinned
    // signature chain; the exact side is the bounded baseline.
    q("q_lsh_recall",
      s"""WITH $minhashPairsCtes,
         |approx AS (SELECT a, b FROM j WHERE jaccard >= 0.5 AND a < 50 AND b < 50),
         |toks2 AS (SELECT doc_id, $tok AS toks FROM documents WHERE doc_id < 50),
         |sh2 AS (SELECT doc_id, $shingle3 AS sh FROM toks2),
         |exact AS (SELECT x.doc_id AS a, y.doc_id AS b
         |          FROM sh2 x JOIN sh2 y ON x.doc_id < y.doc_id
         |          WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
         |                len(list_distinct(x.sh || y.sh)) >= 0.5),
         |hit AS (SELECT e.a, e.b FROM exact e JOIN approx x USING (a, b))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
         |       (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit,
         |       round(CASE WHEN (SELECT count(*) FROM exact) = 0 THEN 1.0
         |             ELSE (SELECT CAST(count(*) AS DOUBLE) FROM hit) /
         |                  (SELECT count(*) FROM exact) END, 6) AS recall""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          ngram = 3, maxId = 50L)
        .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
      val approx = Dedup.minhashNearDups(docs, "doc_id", "text",
          ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
        .filter(col("a") < 50 && col("b") < 50).select(col("a"), col("b"))
      val hit = exact.join(approx, Seq("a", "b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"), col("n_hit"),
          round(when(col("n_exact") === 0, 1.0)
            .otherwise(col("n_hit").cast("double") / col("n_exact")), 6)
            .as("recall"))
    },

    // PII scrub over a deterministically synthesized contact line (the
    // corpus has no natural PII — same synthesis precedent as the CJK
    // analyzer queries)
    q("q_redact_pii",
      """WITH t AS (SELECT doc_id,
        |  'contact ' || source || CAST(doc_id AS VARCHAR) ||
        |  '@mail.example.com now, call +1 (555) 010-' ||
        |  CAST(doc_id % 10000 AS VARCHAR) ||
        |  ' or visit https://docs.example.com/p/' || CAST(doc_id AS VARCHAR) ||
        |  ' thanks' AS raw FROM documents)
        |SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(raw,
        |  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<email>', 'g'),
        |  'https?://[^ ]+', '<url>', 'g'),
        |  '\+?[0-9][0-9()\- ]{5,}[0-9]', '<phone>', 'g') AS redacted
        |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.redactPii(concat(
          lit("contact "), col("source"), col("doc_id").cast("string"),
          lit("@mail.example.com now, call +1 (555) 010-"),
          (col("doc_id") % 10000).cast("string"),
          lit(" or visit https://docs.example.com/p/"), col("doc_id").cast("string"),
          lit(" thanks"))).as("redacted"))
    },

    q("q_simhash", simhashSql) { (s, d) =>
      Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
    },

    // Gopher-style duplicate-trigram quality signal, off the shared pinned
    // token view (tokens staged once per session)
    q("q_repetition_ratio",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         |    ELSE [array_to_string(toks, ' ')] END AS rsh FROM t)
         |SELECT doc_id,
         |  round(1.0 - CAST(len(list_distinct(rsh)) AS DOUBLE) / len(rsh), 4) AS rep_ratio
         |FROM r""".stripMargin) { (s, d) =>
      graft.ops.Corpus.tokens(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"),
          TextFunctions.repetitionRatio(col("toks"), 3).as("rep_ratio"))
    },

    // context-window packing: 32-token chunks every 24 tokens (8 overlap),
    // partial tails kept — the chunking stage of a training-data pipeline
    q("q_chunk_tokens",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |c AS (SELECT doc_id,
         |  generate_subscripts(list_transform(range(1, len(toks) + 1, 24), i ->
         |    array_to_string(list_slice(toks, i, i + 31), ' ')), 1) AS chunk_idx,
         |  unnest(list_transform(range(1, len(toks) + 1, 24), i ->
         |    array_to_string(list_slice(toks, i, i + 31), ' '))) AS chunk
         |  FROM t)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
         |  CAST(len(${tokOf("chunk")}) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin) { (s, d) =>
      graft.ops.Corpus.tokens(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"),
          posexplode(TextFunctions.chunkTokens(col("toks"), size = 32, stride = 24)))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_idx"),
          col("col").as("chunk"),
          TextFunctions.tokenCountWs(col("col")).cast("long").as("n_tokens"))
    },

    // corpus-level top bigrams: one explode + count, distributed partial
    // top-k (TakeOrderedAndProject) with a deterministic tie-break
    q("q_top_ngrams",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 2
         |    THEN list_transform(range(1, len(toks)), i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         |    ELSE [array_to_string(toks, ' ')] END AS rsh FROM t),
         |x AS (SELECT unnest(rsh) AS ngram FROM r)
         |SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY ngram
         |ORDER BY n DESC, ngram LIMIT 20""".stripMargin) { (s, d) =>
      graft.ops.Corpus.tokens(Tables.documents(s, d), "doc_id", "text")
        .select(explode(TextFunctions.rawShinglesFromTokens(col("toks"), 2)).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram").asc).limit(20)
    },

    q("q_ngram_jaccard",
      s"""WITH toks AS (SELECT doc_id, $tok AS toks FROM documents WHERE doc_id < 50),
         |sh AS (SELECT doc_id, $shingle3 AS sh FROM toks),
         |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |        CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
         |        len(list_distinct(x.sh || y.sh)) AS jaccard
         |      FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
         |SELECT a, b, round(jaccard, 9) AS jaccard FROM p WHERE jaccard > 0""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", ngram = 3, maxId = 50L)
    },

    // concat-then-split sequence packing: md5-bucketed streams, greedy
    // running-sum block assignment (block of the doc's first token)
    q("q_pack_blocks",
      s"""WITH c AS (SELECT doc_id, CAST(len($tok) AS BIGINT) AS n_tokens,
         |             CAST($hash16Sql % 8 AS BIGINT) AS bucket FROM documents)
         |SELECT doc_id, n_tokens, bucket,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512.0) AS BIGINT) AS block
         |FROM c""".stripMargin) { (s, d) =>
      graft.ops.Packing.packBlocks(Tables.documents(s, d), "doc_id", "text",
        budget = 512, buckets = 8)
    },

    // deterministic hash sampling for dataset mixing: per-language keep
    // rates, reproducible across engines (md5-uniform < rate)
    q("q_mix_sample",
      s"""SELECT doc_id, lang FROM documents
         |WHERE $hash16Sql < (CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.9
         |  ELSE 0.05 END) * 65536.0""".stripMargin) { (s, d) =>
      graft.ops.Packing.mixSample(Tables.documents(s, d), "doc_id", col("lang"),
          Map("en" -> 0.25, "zh" -> 0.9), defaultRate = 0.05)
        .select(col("doc_id"), col("lang"))
    },

    // benchmark decontamination: docs < 25 stand in for the eval set;
    // contamination = sharing any 5-gram with it (GPT-3-style overlap rule)
    q("q_decontaminate",
      s"""WITH btoks AS (SELECT $tok AS toks FROM documents WHERE doc_id < 25),
         |bg AS (SELECT DISTINCT unnest(${shingleSql(5)}) AS gram FROM btoks),
         |ctoks AS (SELECT doc_id, $tok AS toks FROM documents WHERE doc_id >= 25),
         |cg AS (SELECT doc_id, unnest(${shingleSql(5)}) AS gram FROM ctoks)
         |SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits
         |FROM cg JOIN bg USING (gram) GROUP BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.Decontaminate.contaminated(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", "text", ngram = 5)
    },

    // FUZZY decontamination: corpus docs whose MinHash bands collide with a
    // benchmark doc AND verify at jaccard >= 0.5 — the near-dup rule that
    // catches paraphrased eval leakage verbatim n-grams miss
    q("q_decontaminate_fuzzy", fuzzyDecontamSql(25, 0.5)) { (s, d) =>
      graft.ops.Decontaminate.contaminatedFuzzy(
        Tables.documents(s, d), "doc_id", "text",
        benchPred = col("doc_id") < 25, ngram = 3, k = K, bands = BANDS,
        rows = ROWS, threshold = 0.5)
    },

    q("q_ann_cosine_topk",
      cosineSql(10, "vec_id < 5", "vec_id >= 5"), bench = true) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.bruteForceTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), k = 10)
    },

    q("q_ann_srp_topk", srpSql(3, 8, 64)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.srpBucketTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 3, bits = 8, dims = 64)
    },

    // multi-probe SRP: each query also probes the `bits` buckets one
    // hyperplane-flip away — the recall/cost dial of LSH ANN
    q("q_ann_srp_multiprobe", srpMultiSql(3, 8, 64)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.srpMultiProbeTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 3, bits = 8, dims = 64)
    },

    // Matryoshka two-stage retrieval: coarse 16-dim prefix rank over all
    // candidates, full 64-dim rerank of the top-10 survivors — the modern
    // embedding-store read path (prefix index + bounded full-vector touch)
    q("q_ann_matryoshka", matryoshkaSql(5, 16, 10)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.matryoshkaTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 5, coarseDims = 16, rerankFrom = 10)
    },

    // recall@k of the SRP-bucketed index against the exact baseline — the
    // index-quality gauge a deployment tunes bits/nProbe against; the
    // oracle nests the two top-k oracles and intersects them
    q("q_ann_recall",
      recallSql(3, cosineSql(3, "vec_id < 5", "vec_id >= 5"), srpSql(3, 8, 64))) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 5)
      val cs = e.filter(col("vec_id") >= 5)
      Ann.recallAtK(
        Ann.bruteForceTopK(qs, cs, k = 3),
        Ann.srpBucketTopK(qs, cs, k = 3, bits = 8, dims = 64), k = 3)
    },

    // symmetric int8 embedding quantization + dequantized-cosine fidelity —
    // the 4x-smaller storage format of an embedding store at scale
    q("q_embed_quantize",
      s"""WITH s AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
         |  FROM embeddings),
         |qz AS (SELECT vec_id, embedding, sc,
         |  CASE WHEN sc = 0 THEN list_transform(embedding, x -> 0)
         |       ELSE list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / sc) AS INTEGER))
         |  END AS qv FROM s),
         |dq AS (SELECT vec_id, embedding, sc, qv,
         |  list_transform(qv, qi -> CAST(qi AS DOUBLE) * sc / 127.0) AS dv FROM qz)
         |SELECT vec_id, array_to_string(qv, ',') AS qvec, round(sc, 9) AS scale,
         |  round(${cosExpr("embedding", "dv")}, 6) + 0 AS fidelity
         |FROM dq""".stripMargin) { (s, d) =>
      VectorFunctions.register(s)
      Tables.embeddings(s, d)
        .withColumn("z", VectorFunctions.quantizeInt8(col("embedding")))
        .select(col("vec_id"),
          concat_ws(",", transform(col("z.q"), _.cast("string"))).as("qvec"),
          round(col("z.scale"), 9).as("scale"),
          round(VectorFunctions.cosineSim(col("embedding"),
            VectorFunctions.dequantizeInt8(col("z.q"), col("z.scale"))), 6).as("fidelity"))
    },

    q("q_dedup_embed", embedDedupSql(0.3, 4, 64)) { (s, d) =>
      // embedding-cosine near-dup: SRP-LSH candidates + exact verify
      Dedup.embeddingNearDups(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.3, bits = 4, dims = 64)
    },

    q("q_tokenize_cjk",
      """WITH t AS (SELECT doc_id,
        |    '图数据库' || source || '分词引擎' || CAST(doc_id % 10 AS VARCHAR) AS zh
        |  FROM documents WHERE doc_id < 200),
        |runs AS (SELECT doc_id,
        |    regexp_extract_all(lower(zh), '([a-z0-9]+|\p{Han}+)', 1) AS rs FROM t),
        |tk AS (SELECT doc_id,
        |  flatten(list_transform(rs, r -> CASE WHEN regexp_full_match(r, '\p{Han}{2,}')
        |    THEN list_transform(range(1, length(r)), i -> substr(r, i, 2))
        |    ELSE [r] END)) AS toks FROM runs)
        |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM tk""".stripMargin) { (s, d) =>
      // CJK bigram analyzer over a mixed Han/Latin column derived from the
      // documents table (the reference's pluggable-analyzer surface, §2.8)
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkBigram(
            concat(lit("图数据库"), col("source"), lit("分词引擎"),
              (col("doc_id") % 10).cast("string")))).as("toks"))
    },

    // dictionary (FMM) CJK analyzer: the oracle replays the same greedy
    // longest-match scan as a recursive CTE over (doc, run, pos) states
    q("q_tokenize_cjk_dict",
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    '图数据库' || source || '分词引擎' || CAST(doc_id % 10 AS VARCHAR) AS zh
        |  FROM documents WHERE doc_id < 200),
        |rl AS (SELECT doc_id,
        |    regexp_extract_all(lower(zh), '([a-z0-9]+|\p{Han}+)', 1) AS rs FROM t),
        |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
        |seg(doc_id, ord, r, pos, toks) AS (
        |  SELECT doc_id, ord, r, CAST(1 AS BIGINT), CAST([] AS VARCHAR[])
        |  FROM runs WHERE regexp_full_match(r, '\p{Han}+')
        |  UNION ALL
        |  SELECT doc_id, ord, r, pos + ml, toks || [substr(r, pos, ml)]
        |  FROM (SELECT doc_id, ord, r, pos, toks,
        |          CASE WHEN substr(r, pos, 4) IN ('图数据库') THEN CAST(4 AS BIGINT)
        |               WHEN substr(r, pos, 3) IN ('数据库') THEN 3
        |               WHEN substr(r, pos, 2) IN ('数据','分词','引擎','查询','索引','分析') THEN 2
        |               ELSE 1 END AS ml
        |        FROM seg WHERE pos <= length(r)) z),
        |fin AS (SELECT doc_id, ord, toks FROM seg WHERE pos > length(r)
        |        UNION ALL
        |        SELECT doc_id, ord, [r] FROM runs WHERE NOT regexp_full_match(r, '\p{Han}+')),
        |agg AS (SELECT doc_id, flatten(list(toks ORDER BY ord)) AS toks FROM fin GROUP BY doc_id)
        |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM agg""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkDict(
            concat(lit("图数据库"), col("source"), lit("分词引擎"),
              (col("doc_id") % 10).cast("string")))).as("toks"))
    },

    // mmseg "complex" dictionary analyzer: chunk scoring (max total length,
    // max average = min word count, min variance = min Σlen², longest first
    // word) — the oracle replays the same integer ranking with DuckDB
    // nested-lambda chunk enumeration inside the recursive scan CTE. The
    // zh column embeds Tsai's canonical FMM-vs-mmseg disagreement string,
    // so the gate certifies real chunk scoring, not greedy matching.
    q("q_tokenize_cjk_mmseg", {
      val dict = TextFunctions.cjkDict ++ Seq("研究", "研究生", "生命", "起源")
      val byLen = dict.groupBy(_.length).toSeq.sortBy(-_._1)
      def lensAt(p: String): String = {
        val parts = byLen.map { case (n, ws) =>
          s"CASE WHEN substr(r, $p, $n) IN (${ws.map(w => s"'$w'").mkString(",")}) THEN [$n] ELSE [] END"
        } :+ s"CASE WHEN $p <= length(r) THEN [1] ELSE [0] END"
        parts.reduce((a, b) => s"list_concat($a, $b)")
      }
      val combos =
        s"""flatten(list_transform(${lensAt("pos")}, l1 ->
           |  flatten(list_transform(${lensAt("pos + l1")}, l2 ->
           |    list_transform(${lensAt("pos + l1 + l2")}, l3 -> [l1, l2, l3])))))""".stripMargin
      val ml =
        s"""CAST(-(list_sort(list_transform($combos, c ->
           |  [-(c[1]+c[2]+c[3]),
           |   CASE WHEN c[2] > 0 THEN (CASE WHEN c[3] > 0 THEN 3 ELSE 2 END) ELSE 1 END,
           |   c[1]*c[1]+c[2]*c[2]+c[3]*c[3],
           |   -c[1]]))[1][4]) AS BIGINT)""".stripMargin
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |    '图数据库' || source || '研究生命起源' || CAST(doc_id % 10 AS VARCHAR) AS zh
         |  FROM documents WHERE doc_id < 200),
         |rl AS (SELECT doc_id,
         |    regexp_extract_all(lower(zh), '([a-z0-9]+|\\p{Han}+)', 1) AS rs FROM t),
         |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
         |seg(doc_id, ord, r, pos, toks) AS (
         |  SELECT doc_id, ord, r, CAST(1 AS BIGINT), CAST([] AS VARCHAR[])
         |  FROM runs WHERE regexp_full_match(r, '\\p{Han}+')
         |  UNION ALL
         |  SELECT doc_id, ord, r, pos + ml, toks || [substr(r, pos, ml)]
         |  FROM (SELECT doc_id, ord, r, pos, toks, $ml AS ml
         |        FROM seg WHERE pos <= length(r)) z),
         |fin AS (SELECT doc_id, ord, toks FROM seg WHERE pos > length(r)
         |        UNION ALL
         |        SELECT doc_id, ord, [r] FROM runs WHERE NOT regexp_full_match(r, '\\p{Han}+')),
         |agg AS (SELECT doc_id, flatten(list(toks ORDER BY ord)) AS toks FROM fin GROUP BY doc_id)
         |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM agg""".stripMargin
    }) { (s, d) =>
      val dict = TextFunctions.cjkDict ++ Seq("研究", "研究生", "生命", "起源")
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkMmseg(
            concat(lit("图数据库"), col("source"), lit("研究生命起源"),
              (col("doc_id") % 10).cast("string")), dict)).as("toks"))
    },

    // index-mode dictionary analyzer (jieba INDEX / cut_for_search,
    // reference analyzer/JiebaAnalyzer.java:35-38): the oracle replays the
    // FMM scan CTE, then expands every segmented word with its in-dict
    // 2-gram/3-gram sub-words (word last) — the same post-expansion the
    // engine fuses into the tokenize expression. Dict is Han-only, so the
    // uniform expansion is a no-op on Latin run tokens.
    q("q_tokenize_cjk_index",
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    '图数据库' || source || '分词引擎' || CAST(doc_id % 10 AS VARCHAR) AS zh
        |  FROM documents WHERE doc_id < 200),
        |rl AS (SELECT doc_id,
        |    regexp_extract_all(lower(zh), '([a-z0-9]+|\p{Han}+)', 1) AS rs FROM t),
        |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
        |seg(doc_id, ord, r, pos, toks) AS (
        |  SELECT doc_id, ord, r, CAST(1 AS BIGINT), CAST([] AS VARCHAR[])
        |  FROM runs WHERE regexp_full_match(r, '\p{Han}+')
        |  UNION ALL
        |  SELECT doc_id, ord, r, pos + ml, toks || [substr(r, pos, ml)]
        |  FROM (SELECT doc_id, ord, r, pos, toks,
        |          CASE WHEN substr(r, pos, 4) IN ('图数据库') THEN CAST(4 AS BIGINT)
        |               WHEN substr(r, pos, 3) IN ('数据库') THEN 3
        |               WHEN substr(r, pos, 2) IN ('数据','分词','引擎','查询','索引','分析') THEN 2
        |               ELSE 1 END AS ml
        |        FROM seg WHERE pos <= length(r)) z),
        |ex AS (SELECT doc_id, ord, flatten(list_transform(toks, w -> list_concat(
        |    CASE WHEN length(w) > 2 THEN list_filter(
        |        list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INT), 2)),
        |        s -> s IN ('数据','分词','引擎','查询','索引','分析'))
        |      ELSE CAST([] AS VARCHAR[]) END,
        |    list_concat(
        |      CASE WHEN length(w) > 3 THEN list_filter(
        |          list_transform(range(1, length(w) - 1), i -> substr(w, CAST(i AS INT), 3)),
        |          s -> s IN ('数据库'))
        |        ELSE CAST([] AS VARCHAR[]) END,
        |      [w])))) AS toks
        |  FROM seg WHERE pos > length(r)),
        |fin AS (SELECT doc_id, ord, toks FROM ex
        |        UNION ALL
        |        SELECT doc_id, ord, [r] FROM runs WHERE NOT regexp_full_match(r, '\p{Han}+')),
        |agg AS (SELECT doc_id, flatten(list(toks ORDER BY ord)) AS toks FROM fin GROUP BY doc_id)
        |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM agg""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkDictIndex(
            concat(lit("图数据库"), col("source"), lit("分词引擎"),
              (col("doc_id") % 10).cast("string")))).as("toks"))
    },

    // max-word dictionary analyzer (IK max_word, reference
    // analyzer/IKAnalyzer.java:37-40): every overlapping dictionary match
    // at every position (longest first per position) plus single-char
    // tokens for uncovered positions. The oracle enumerates positions
    // non-recursively and decides coverage with a running-max window over
    // match end positions — exactly the engine's left-to-right cover scan.
    q("q_tokenize_cjk_maxword",
      """WITH t AS (SELECT doc_id,
        |    '图数据库' || source || '分词引擎' || CAST(doc_id % 10 AS VARCHAR) AS zh
        |  FROM documents WHERE doc_id < 200),
        |rl AS (SELECT doc_id,
        |    regexp_extract_all(lower(zh), '([a-z0-9]+|\p{Han}+)', 1) AS rs FROM t),
        |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
        |pos AS (SELECT doc_id, ord, r, unnest(range(1, length(r) + 1)) AS i
        |        FROM runs WHERE regexp_full_match(r, '\p{Han}+')),
        |m AS (SELECT doc_id, ord, r, i,
        |    list_concat(
        |      CASE WHEN substr(r, i, 4) IN ('图数据库') THEN [substr(r, i, 4)] ELSE CAST([] AS VARCHAR[]) END,
        |      list_concat(
        |        CASE WHEN substr(r, i, 3) IN ('数据库') THEN [substr(r, i, 3)] ELSE CAST([] AS VARCHAR[]) END,
        |        CASE WHEN substr(r, i, 2) IN ('数据','分词','引擎','查询','索引','分析') THEN [substr(r, i, 2)] ELSE CAST([] AS VARCHAR[]) END)) AS ws,
        |    CASE WHEN substr(r, i, 4) IN ('图数据库') THEN i + 3
        |         WHEN substr(r, i, 3) IN ('数据库') THEN i + 2
        |         WHEN substr(r, i, 2) IN ('数据','分词','引擎','查询','索引','分析') THEN i + 1
        |         ELSE 0 END AS mend
        |  FROM pos),
        |c AS (SELECT *, coalesce(max(mend) OVER (PARTITION BY doc_id, ord ORDER BY i
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cover FROM m),
        |tk AS (SELECT doc_id, ord, i, list_concat(ws,
        |    CASE WHEN len(ws) = 0 AND cover < i THEN [substr(r, i, 1)]
        |         ELSE CAST([] AS VARCHAR[]) END) AS ws FROM c),
        |ht AS (SELECT doc_id, ord, flatten(list(ws ORDER BY i)) AS toks FROM tk GROUP BY doc_id, ord),
        |fin AS (SELECT doc_id, ord, toks FROM ht
        |        UNION ALL
        |        SELECT doc_id, ord, [r] FROM runs WHERE NOT regexp_full_match(r, '\p{Han}+')),
        |agg AS (SELECT doc_id, flatten(list(toks ORDER BY ord)) AS toks FROM fin GROUP BY doc_id)
        |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM agg""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkMaxword(
            concat(lit("图数据库"), col("source"), lit("分词引擎"),
              (col("doc_id") % 10).cast("string")))).as("toks"))
    },

    // stopword-aware analyzer (Lucene StopFilter semantics): default
    // tokens minus the language stopword list, via the analyzer registry
    q("q_tokenize_stop", {
      val enStops = TextFunctions.langStopwords.toMap.apply("en")
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, list_filter($tok, x -> x NOT IN ($enStops)) AS toks
         |           FROM documents WHERE doc_id < 200)
         |SELECT doc_id, array_to_string(toks, ' ') AS toks FROM t""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.analyzer("english-stop")(col("text"))).as("toks"))
    },

    // max-probability dictionary analyzer (jieba's exact mode): the engine
    // runs an integer micro-nat Viterbi per Han run; the oracle enumerates
    // EVERY segmentation with the same exact integer scores and takes the
    // (score DESC, length-sequence DESC) argmax — identical tie contract,
    // zero fp ambiguity. The zh string embeds both canonical ambiguity
    // sets: 研究生命起源 (freq beats FMM) and 方法学 (freq beats BiMM).
    q("q_tokenize_cjk_freq", {
      val (lp, lp1) = TextFunctions.microLogProbs(TextFunctions.cjkFreqDict)
      val byLen = TextFunctions.cjkFreqDict.map(_._1).groupBy(_.length)
      val lens = 1 to byLen.keys.max
      def caseFor(n: Int): String = {
        val ws = byLen.getOrElse(n, Nil)
        val arms = ws.map(w =>
          s"WHEN substr(r, pos, $n) = '$w' THEN CAST(${lp(w)} AS BIGINT)")
        val fallback =
          if (n == 1) s"ELSE CAST($lp1 AS BIGINT)" else "ELSE CAST(NULL AS BIGINT)"
        if (arms.isEmpty && n != 1) "CAST(NULL AS BIGINT)"
        else s"CASE ${arms.mkString(" ")} $fallback END"
      }
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |    '研究生命起源' || source || '方法学数据库' || CAST(doc_id % 10 AS VARCHAR) AS zh
         |  FROM documents WHERE doc_id < 200),
         |rl AS (SELECT doc_id,
         |    regexp_extract_all(lower(zh), '([a-z0-9]+|\\p{Han}+)', 1) AS rs FROM t),
         |runs AS (SELECT doc_id, generate_subscripts(rs, 1) AS ord, unnest(rs) AS r FROM rl),
         |seg(doc_id, ord, r, pos, toks, score, lens) AS (
         |  SELECT doc_id, ord, r, CAST(1 AS BIGINT), CAST([] AS VARCHAR[]),
         |         CAST(0 AS BIGINT), ''
         |  FROM runs WHERE regexp_full_match(r, '\\p{Han}+')
         |  UNION ALL
         |  SELECT doc_id, ord, r, pos + n, toks || [substr(r, pos, n)],
         |         score + lp, lens || CAST(n AS VARCHAR)
         |  FROM (SELECT seg.*, c.n,
         |          CASE c.n ${lens.map(n => s"WHEN $n THEN (${caseFor(n)})").mkString(" ")} END AS lp
         |        FROM seg, (VALUES ${lens.map(n => s"($n)").mkString(", ")}) c(n)
         |        WHERE pos <= length(r)) z
         |  WHERE lp IS NOT NULL),
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
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(" ", TextFunctions.tokenizeCjkFreq(
            concat(lit("研究生命起源"), col("source"), lit("方法学数据库"),
              (col("doc_id") % 10).cast("string")))).as("toks"))
    },

    q("q_ann_ivf_topk", ivfSql(10, 16, 2)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.ivfTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 10, nCentroids = 16, nProbe = 2)
    },

    // IVF with a TRAINED coarse quantizer: 2 Lloyd's rounds of spherical
    // k-means (cosine assignment, rounded per-dim mean update) — the
    // production swap-in the lowest-id-seed variant documents
    q("q_ann_ivf_kmeans", ivfKmeansSql(10, 8, 2)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.ivfKmeansTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 10, nCentroids = 8, nProbe = 2, iters = 2)
    },

    // product quantization: 4 subspaces x 8 codes over 64 dims, ADC via
    // reconstruction — the memory half of IVF-PQ
    q("q_ann_pq_topk", pqSql(10, 4, 8, 64, 2)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.pqTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 10, m = 4, ks = 8, dims = 64, iters = 2)
    },

    // IVF × PQ composed: trained coarse cells prune the scan, per-subspace
    // codes shrink the index — the actual 100 TB ANN index shape
    q("q_ann_ivfpq_topk", ivfPqSql(10, 8, 2, 4, 8, 64, 2)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.ivfPqTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        k = 10, nCentroids = 8, nProbe = 2, m = 4, ks = 8, dims = 64, iters = 2)
    },

    q("q_lang_id",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  ${stopCount("en")} AS s_en, ${stopCount("es")} AS s_es,
         |  ${stopCount("de")} AS s_de, ${stopCount("fr")} AS s_fr FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         |       WHEN s_fr > s_en AND s_fr > s_es AND s_fr > s_de THEN 'fr'
         |       WHEN s_de > s_en AND s_de > s_es THEN 'de'
         |       WHEN s_es > s_en THEN 'es'
         |       ELSE 'en' END AS lang_pred
         |FROM s""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))
    },

    q("q_quality_score",
      s"""WITH t AS (SELECT doc_id, text, $tok AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(toks) AS DOUBLE) AS n_tokens,
         |  round(CASE WHEN len(toks) > 0
         |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         |    ELSE 0 END, 4) AS mean_token_len,
         |  round(CASE WHEN length(text) > 0
         |    THEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         |    ELSE 0 END, 4) AS punct_ratio,
         |  round(CASE WHEN len(toks) > 0
         |    THEN CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE) / len(toks)
         |    ELSE 0 END, 4) AS stopword_ratio
         |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.qualityStruct(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"), col("q.n_tokens").as("n_tokens"),
          col("q.mean_token_len").as("mean_token_len"), col("q.punct_ratio").as("punct_ratio"),
          col("q.stopword_ratio").as("stopword_ratio"))
    },

    // OOV rate vs the corpus' own top-100 vocabulary: tokenizer-coverage
    // curation signal; distributed top-k then broadcast vocab
    q("q_oov_rate",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |v AS (SELECT tok FROM (
         |  SELECT tok, count(*) AS cnt FROM e GROUP BY tok
         |  ORDER BY cnt DESC, tok LIMIT 100) z),
         |m AS (SELECT doc_id, count(*) AS n_toks,
         |    count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v)) AS n_oov
         |  FROM e GROUP BY 1)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(n_oov AS BIGINT) AS n_oov,
         |  round(CAST(n_oov AS DOUBLE) / n_toks, 6) AS oov_rate
         |FROM m""".stripMargin) { (s, d) =>
      graft.ops.Corpus.oovRate(Tables.documents(s, d), "doc_id", "text", vocabSize = 100)
    },

    // Gopher-style rule bundle (Rae et al. 2021 §A1.1, word-level subset):
    // per-doc word stats + one boolean verdict against fixed thresholds —
    // the standard web-corpus curation gate, restated over (doc, word)
    // counts so the oracle reproduces every metric exactly
    q("q_gopher_rules", s"$gopherCtes\nSELECT * FROM gq") { (s, d) =>
      graft.ops.Corpus.gopherQuality(Tables.documents(s, d), "doc_id", "text")
    },

    // curriculum / quality-weighted sampling: keep-rate depends on the
    // Gopher verdict tier (high 0.9 / mid 0.5 / low 0.1), deterministic
    // md5-uniform per doc — the quality-aware downsampling stage of a
    // curation pipeline, reproducible on both engines
    q("q_quality_sample",
      s"""$gopherCtes,
         |strat AS (SELECT doc_id,
         |    CASE WHEN pass = 1 THEN 'high' WHEN ttr >= 0.4 THEN 'mid' ELSE 'low' END AS stratum
         |  FROM gq)
         |SELECT doc_id, stratum FROM strat
         |WHERE $hash16Sql < (CASE stratum WHEN 'high' THEN 0.9 WHEN 'mid' THEN 0.5
         |  ELSE 0.1 END) * 65536.0""".stripMargin) { (s, d) =>
      val qual = graft.ops.Corpus.gopherQuality(Tables.documents(s, d), "doc_id", "text")
        .withColumn("stratum",
          when(col("pass") === 1, "high")
            .when(col("ttr") >= 0.4, "mid").otherwise("low"))
      graft.ops.Packing.mixSample(qual, "doc_id", col("stratum"),
          Map("high" -> 0.9, "mid" -> 0.5), defaultRate = 0.1)
        .select(col("doc_id"), col("stratum"))
    },

    q("q_token_count",
      s"""WITH t AS (SELECT doc_id, text, $tok AS toks FROM documents)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_ws,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe
         |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("n_ws"),
        TextFunctions.tokenCountBpe(col("text")).cast("long").as("n_bpe"))
    },

    // corpus-trained unigram LM score — the CCNet-style perplexity-proxy
    // quality filter, unigram so the oracle reproduces it exactly
    q("q_unigram_logprob",
      s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |f AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM f)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  round(avg(ln(cnt)) - ln((SELECT n FROM tot)), 6) + 0 AS logprob
         |FROM e JOIN f USING (tok) GROUP BY doc_id""".stripMargin) { (s, d) =>
      graft.ops.Corpus.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
    },

    // REAL image decode: Spark renders + PNG-encodes id-parameterized
    // images (javax.imageio, JDK-built-in) and decodes their headers back;
    // the oracle computes the expected header values analytically — the
    // gate verifies the actual codec round-trip reproduces them
    q("q_image_decode",
      """SELECT doc_id, 'png' AS format,
        |  CAST(16 + doc_id % 48 AS INT) AS width,
        |  CAST(16 + doc_id % 32 AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, d) =>
      Multimodal.imageMeta(Multimodal.pngAssets(
        Tables.documents(s, d).filter(col("doc_id") < 100)))
    },

    // REAL audio decode: Spark synthesizes id-parameterized 16-bit PCM WAV
    // files (javax.sound.sampled, JDK-built-in) and decodes their RIFF
    // headers back; the oracle computes the expected header values
    // analytically — the gate verifies the codec round-trip reproduces them
    q("q_audio_meta",
      """SELECT doc_id, 'pcm_signed' AS encoding,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
        |  CAST((100 + doc_id % 400) * 1000000 // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT) AS duration_us
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, d) =>
      Multimodal.audioMeta(Multimodal.wavAssets(
        Tables.documents(s, d).filter(col("doc_id") < 100)))
    },

    // REAL video-container metadata decode: Spark builds id-parameterized
    // ISO-BMFF (MP4) files byte-exactly to the public box layout and walks
    // their headers back (hand-rolled box parse — no codec library); the
    // oracle computes the expected values analytically
    q("q_video_meta",
      """SELECT doc_id, 'isom' AS brand,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS INT) AS timescale,
        |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration,
        |  CAST((1000 + doc_id % 9000) * 1000000 // (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END) AS BIGINT) AS duration_us,
        |  CAST(320 + 16 * (doc_id % 8) AS INT) AS width,
        |  CAST(240 + 16 * (doc_id % 5) AS INT) AS height,
        |  CAST(1 + doc_id % 2 AS INT) AS n_tracks
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, d) =>
      Multimodal.mp4Meta(Multimodal.mp4Assets(
        Tables.documents(s, d).filter(col("doc_id") < 100)))
    },

    // REAL container-level frame sampling: the stts (decoding-time-to-
    // sample) box walk expands run-length sample timings to per-frame
    // timestamps and keeps every 4th — the oracle recomputes the two
    // deterministic stts runs analytically per doc_id
    q("q_video_frames",
      """WITH p AS (SELECT doc_id,
        |    8 + doc_id % 8 AS n1, 100 + doc_id % 100 AS d1,
        |    4 + doc_id % 4 AS n2, 200 + doc_id % 50 AS d2,
        |    CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS tsc
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, tsc, n1, d1, d2, unnest(range(0, n1 + n2)) AS i FROM p),
        |ts AS (SELECT doc_id, tsc, i,
        |    CASE WHEN i < n1 THEN i * d1 ELSE n1 * d1 + (i - n1) * d2 END AS u
        |  FROM s WHERE i % 4 = 0)
        |SELECT doc_id, CAST(i AS BIGINT) AS sample_no, CAST(u AS BIGINT) AS ts_units,
        |  CAST(u * 1000000 // tsc AS BIGINT) AS ts_us
        |FROM ts""".stripMargin) { (s, d) =>
      Multimodal.mp4FrameSamples(Multimodal.mp4Assets(
        Tables.documents(s, d).filter(col("doc_id") < 100)), stride = 4)
    },

    q("q_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(unhex(repeat(md5(text), 1 + CAST(doc_id % 3 AS INT)))) AS BIGINT) AS n_bytes,
        |  substr(md5(text), 1, 8) AS header_hex
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.fakeAssets(Tables.documents(s, d))
        .select(col("doc_id"),
          length(col("bytes")).cast("long").as("n_bytes"),
          lower(hex(substring(col("bytes"), 1, 4))).as("header_hex"))
    },

    // SemDeDup: k-means clusters bound the quadratic term; within-cluster
    // cosine ≥ τ to a lower-id member → dropped
    q("q_semantic_dedup", semDedupSql(8, 2, 0.3, 1000)) { (s, d) =>
      Dedup.semanticNearDups(Tables.embeddings(s, d), "vec_id", "embedding",
        nClusters = 8, iters = 2, threshold = 0.3, cellCap = 1000)
    },

    // exact-substring duplication profile (Lee et al. window hashing):
    // per-doc count/fraction of 8-token windows repeated anywhere in corpus
    q("q_dup_windows", dupWindowsSql(8), bench = true) { (s, d) =>
      Dedup.duplicatedWindows(Tables.documents(s, d), "doc_id", "text", n = 8)
    },

    // DSIR importance weights against the English subset as the target
    // domain — smoothed unigram LM log-ratio per doc
    q("q_dsir_weights", dsirSql("lang = 'en'")) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.Corpus.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"))
    },

    // BM25 ranked retrieval: 'dup' is rare (df≈25) so its idf dominates;
    // score rounded before the top-k cut, ties broken on doc_id
    q("q_bm25_topk", bm25Sql(Seq("dup", "spark", "merge"), 20, 1.2, 0.75)) { (s, d) =>
      graft.ops.Search.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        Seq("dup", "spark", "merge"), k = 20)
    },

    // hybrid retrieval: reciprocal-rank fusion of the BM25 top-20 (sparse)
    // and the dense cosine top-20 for query vector 3 — doc_id and vec_id
    // share the same id space in the fixture, as they would in a corpus
    // whose embeddings are stored beside it. Ranks re-derive per list as
    // (score desc, id asc); contributions are rounded-9 DECIMAL so the
    // fused sum is order-independent in both engines.
    q("q_hybrid_rrf",
      s"""WITH bm AS (SELECT doc_id, score FROM (${bm25Sql(Seq("dup", "spark", "merge"), 20, 1.2, 0.75)}) zbm),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 3),
         |den AS (SELECT vec_id AS doc_id, sim AS score FROM (
         |  SELECT c.vec_id, round(${cosExpr("qv.qe", "c.ce")}, 6) AS sim
         |  FROM (SELECT vec_id, embedding AS ce FROM embeddings) c CROSS JOIN qv)
         |  ORDER BY sim DESC, doc_id LIMIT 20),
         |u AS (SELECT 'bm25' AS list, doc_id, score FROM bm
         |      UNION ALL SELECT 'dense', doc_id, score FROM den),
         |r AS (SELECT doc_id,
         |        row_number() OVER (PARTITION BY list ORDER BY score DESC, doc_id ASC) AS rk
         |      FROM u),
         |f AS (SELECT doc_id,
         |        CAST(sum(CAST(round(CAST(1 AS DOUBLE) / (60 + rk), 9) AS DECIMAL(20,9))) AS DOUBLE) AS rrf,
         |        CAST(count(*) AS BIGINT) AS n_lists
         |      FROM r GROUP BY doc_id)
         |SELECT doc_id, rrf, n_lists FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val sparse = graft.ops.Search.bm25TopK(Tables.documents(s, d), "doc_id",
        "text", Seq("dup", "spark", "merge"), k = 20)
      val dense = Ann.bruteForceTopK(e.filter(col("vec_id") === 3), e, k = 20)
        .select(col("vec_id").as("doc_id"), col("sim").as("score"))
      graft.ops.Search.rrfFuse(
        Seq("bm25" -> sparse, "dense" -> dense), "doc_id", "score", k = 10)
    },

    // embedding-space decontamination: corpus rows whose cosine to ANY
    // benchmark vector (vec_id < 5 plays the eval set) reaches τ=0.8 — the
    // semantic leakage rule; the 5 benchmark members catch themselves at
    // sim 1.0 so the gate carries guaranteed rows
    q("q_embed_decontaminate",
      s"""WITH b AS (SELECT embedding AS be FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding AS ce FROM embeddings),
         |sc AS (SELECT vec_id, round(${cosExpr("c.ce", "b.be")}, 6) AS sim
         |       FROM c CROSS JOIN b),
         |g AS (SELECT vec_id, max(sim) + 0 AS max_sim,
         |        CAST(sum(CASE WHEN sim >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |      FROM sc GROUP BY vec_id)
         |SELECT vec_id, max_sim, n_hits,
         |  CAST(max_sim >= 0.8 AS BIGINT) AS contaminated FROM g""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      graft.ops.Decontaminate.embeddingOverlap(
        e, e.filter(col("vec_id") < 5), "vec_id", "embedding", tau = 0.8)
    },

    // hard-negative mining (DPR/Contriever recipe): per query vector, the
    // top-10 most similar candidates whose label DIFFERS — the labeled
    // positives (same-label rows, incl. the query itself) are anti-joined
    // away, leaving the semantically-confusable-yet-wrong training set
    q("q_hard_negatives",
      s"""WITH qv AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding AS ce, label FROM embeddings),
         |sc AS (SELECT qv.query_id, c.vec_id,
         |         round(${cosExpr("qv.qe", "c.ce")}, 6) + 0 AS sim
         |       FROM c CROSS JOIN qv WHERE c.label <> qv.ql),
         |r AS (SELECT query_id, vec_id, sim,
         |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 5)
      val pos = broadcast(qs.select(col("vec_id").as("query_id"), col("label").as("ql")))
        .join(e.select(col("vec_id"), col("label")), col("ql") === col("label"))
        .select(col("query_id"), col("vec_id"))
      Ann.hardNegatives(qs, e, pos, k = 10)
    },

    // MMR diversified retrieval: greedy λ·rel − (1−λ)·max-sim-to-selected
    // over each query's top-8 pool, 4 picks — the oracle unrolls the greedy
    // recurrence round by round (the BPE-oracle discipline)
    q("q_mmr_diversify", mmrSql(4, 8)) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.mmrTopK(e.filter(col("vec_id") < 3), e.filter(col("vec_id") >= 3),
        k = 4, lambda = 0.7, poolSize = 8)
    },

    // leakage-safe split: near-dup cluster members draw their split from
    // the CLUSTER id (q_split_assign's md5 thresholds over the cluster
    // instead of the doc), so near-duplicates never straddle train/eval
    q("q_leakage_safe_split",
      {
        def d4(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), $i, 1)) - 1)"
        val h16 = s"(${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})"
        s"""WITH RECURSIVE $minhashPairsCtes,
           |pairs AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
           |verts AS (SELECT DISTINCT v FROM (SELECT a AS v FROM pairs UNION SELECT b FROM pairs) z),
           |adjp AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
           |reach(s, d) AS (
           |  SELECT v, v FROM verts
           |  UNION
           |  SELECT r.s, a.d FROM reach r JOIN adjp a ON a.s = r.d),
           |cl AS (SELECT s AS doc_id, min(d) AS cluster FROM reach GROUP BY s),
           |wc AS (SELECT dd.doc_id, coalesce(cl.cluster, dd.doc_id) AS cluster
           |       FROM (SELECT doc_id FROM documents) dd LEFT JOIN cl USING (doc_id))
           |SELECT doc_id, cluster,
           |  CASE WHEN $h16 < 52429 THEN 'train'
           |       WHEN $h16 < 58982 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM wc""".stripMargin
      }) { (s, d) =>
      Dedup.leakageSafeSplit(Tables.documents(s, d), "doc_id", "text",
        ngram = 3, k = K, bands = BANDS, rows = ROWS, threshold = 0.5)
    })

  /** Unrolled MMR greedy-selection CTE chain (Ann.mmrTopK's oracle twin):
    * pool = rounded-rel top-`poolSize` per query; each round r picks the
    * unselected pool row maximizing round(λ·rel − (1−λ)·max sim to the
    * selected set, 6), ties on vec_id — exactly the engine's recurrence. */
  private def mmrSql(k: Int, poolSize: Int): String = {
    val rounds = (2 to k).map { r =>
      s"""m$r AS (SELECT p.query_id, p.vec_id, p.rel,
         |  round(CAST(0.7 AS DOUBLE) * p.rel
         |      - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * mx.m, 6) AS mmr
         |  FROM pool p
         |  JOIN (SELECT ps.query_id, ps.d AS vec_id, max(ps.sim) AS m
         |        FROM psim ps JOIN sel${r - 1} s
         |          ON ps.query_id = s.query_id AND ps.s = s.vec_id
         |        GROUP BY ps.query_id, ps.d) mx USING (query_id, vec_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2
         |    WHERE s2.query_id = p.query_id AND s2.vec_id = p.vec_id)),
         |pick$r AS (SELECT query_id, vec_id, rel, $r AS rank FROM (
         |  SELECT m$r.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY mmr DESC, vec_id ASC) AS rn FROM m$r) z$r WHERE rn = 1),
         |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pick$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (SELECT vec_id AS query_id, embedding AS qe
       |            FROM embeddings WHERE vec_id < 3),
       |cc AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE vec_id >= 3),
       |sc0 AS (SELECT query_id, cc.vec_id,
       |          round(${cosExpr("qv.qe", "cc.ce")}, 6) + 0 AS rel, cc.ce
       |        FROM cc CROSS JOIN qv),
       |pool AS MATERIALIZED (SELECT query_id, vec_id, rel, ce FROM (
       |  SELECT sc0.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, vec_id ASC) AS rn FROM sc0) zp
       |  WHERE rn <= $poolSize),
       |psim AS MATERIALIZED (SELECT a.query_id, a.vec_id AS d, b.vec_id AS s,
       |    round(${cosExpr("a.ce", "b.ce")}, 6) AS sim
       |  FROM pool a JOIN pool b
       |    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
       |sel1 AS (SELECT query_id, vec_id, rel, 1 AS rank FROM (
       |  SELECT pool.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, vec_id ASC) AS rn FROM pool) z1 WHERE rn = 1),
       |$rounds
       |SELECT query_id, vec_id, rel, CAST(rank AS BIGINT) AS rank
       |FROM sel$k""".stripMargin
  }
}
