package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.traverse.{PathTraversals, SimilarityTraversals, Traversals}
import graft.traverse.PathTraversals.TemplateStep
import QueryDef._
import GraphSql._

/** Second traverser batch (SURVEY §2.12 completion): fusiform similarity,
  * jaccard top-similar, neighborRank, allShortestPaths, rays/rings, template
  * + customized + collection paths, multi-node shortest path, crosspoints,
  * bounded weighted SSSP, plus mutation-semantics checks (UNIQUE, TTL). */
object GraphQueries2 {

  private def g(s: SparkSession, d: String) = TpchGraph.cached(s, d)

  /** CTE chain re-deriving `PathTraversals.guidedWalks` (4 steps, customers
    * 1..50, OUT): each step = left join + per-walk md5-argmin; terminal CTE
    * `walks(wid, path)` unions dead-ends with full-length survivors. */
  def guidedWalksCtes: String = {
    def step(n: Int): String =
      s"""e$n AS (SELECT w.wid, w.path, a.dst, md5(w.wid || ':$n:' || a.dst) AS score
         |  FROM w${n - 1} w LEFT JOIN adj a ON a.src = w.cur),
         |t$n AS (SELECT wid, path FROM e$n WHERE dst IS NULL),
         |w$n AS (SELECT wid, dst AS cur, path || '->' || dst AS path FROM
         |  (SELECT *, row_number() OVER (PARTITION BY wid ORDER BY score, dst) AS rn
         |   FROM e$n WHERE dst IS NOT NULL) z WHERE rn = 1)""".stripMargin
    s"""edges AS ($edgesSql),
       |adj AS (SELECT DISTINCT src, dst FROM edges),
       |w0 AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS wid,
       |              'customer:' || CAST(c_custkey AS VARCHAR) AS cur,
       |              'customer:' || CAST(c_custkey AS VARCHAR) AS path
       |       FROM customer WHERE c_custkey BETWEEN 1 AND 50),
       |${step(1)},
       |${step(2)},
       |${step(3)},
       |${step(4)},
       |walks AS (SELECT wid, path FROM t1
       |  UNION ALL SELECT wid, path FROM t2
       |  UNION ALL SELECT wid, path FROM t3
       |  UNION ALL SELECT wid, path FROM t4
       |  UNION ALL SELECT wid, path FROM w4)""".stripMargin
  }

  /** Unrolled oracle for the GENERAL neighborRank (cyclic walks): mirrors
    * `SimilarityTraversals.neighborRank` step for step — path-instance
    * frontier, same/prev/on-path classification, the reference's degree
    * formula (distinct same targets + distinct prev LAYERS + new instances),
    * sameLayerTransfer-first update order, per-layer (rank desc, id) top-N. */
  def neighborRankGeneralSql(source: String, alpha: Double, tops: Seq[Int]): String = {
    val a = java.lang.Double.toString(alpha)
    val S = tops.length
    def lastR(s: Int): String = if (s == 0) "r_0" else s"r_${s}_$s"
    val steps = (0 until S).map { s =>
      val prevCtes = if (s >= 2) {
        val keys = (1 until s).map(i => s"SELECT id AS t, $i AS lyr FROM r_${i}_$s")
          .mkString(" UNION ALL ")
        s"""prevk_$s AS ($keys),
           |pk_$s AS (SELECT t, max(lyr) AS lyr FROM prevk_$s GROUP BY t),
           |""".stripMargin
      } else ""
      val lyrJoin = if (s >= 2) "LEFT JOIN pk_$S ON pk_$S.t = x.t".replace("$S", s.toString)
      else ""
      val lyrExpr = if (s >= 2) s"pk_$s.lyr" else "CAST(NULL AS INT)"
      val prevUpdates = if (s >= 2) {
        val previ =
          s"""previ_$s AS (
             |  SELECT q.lyr, q.t, sum(i.incr) AS pi FROM (
             |    SELECT DISTINCT v, lyr, t FROM cls_$s WHERE cls = 'prev') q
             |  JOIN incr_$s i ON i.v = q.v GROUP BY q.lyr, q.t),
             |""".stripMargin
        previ + (1 until s).map { i =>
          s"""r_${i}_${s + 1} AS MATERIALIZED (
             |  SELECT r.id, r.rank + coalesce(p.pi, CAST(0.0 AS DOUBLE)) AS rank
             |  FROM r_${i}_$s r LEFT JOIN (SELECT t, pi FROM previ_$s WHERE lyr = $i) p
             |  ON p.t = r.id),
             |""".stripMargin
        }.mkString
      } else ""
      s"""x_$s AS MATERIALIZED (
         |  SELECT f.id AS v, f.path, a.dst AS t
         |  FROM f_$s f JOIN adj a ON a.src = f.id),
         |cur_$s AS (SELECT DISTINCT id AS t FROM f_$s),
         |${prevCtes}cls_$s AS MATERIALIZED (
         |  SELECT x.v, x.path, x.t,
         |    CASE WHEN c.t IS NOT NULL THEN 'same'
         |         WHEN $lyrExpr IS NOT NULL THEN 'prev'
         |         WHEN list_contains(x.path, x.t) THEN 'skip'
         |         ELSE 'new' END AS cls,
         |    $lyrExpr AS lyr
         |  FROM x_$s x LEFT JOIN cur_$s c ON c.t = x.t $lyrJoin),
         |deg_$s AS MATERIALIZED (
         |  SELECT v,
         |    CAST(count(DISTINCT t) FILTER (WHERE cls = 'same')
         |       + count(DISTINCT lyr) FILTER (WHERE cls = 'prev')
         |       + count(*) FILTER (WHERE cls = 'new') AS DOUBLE) AS deg
         |  FROM cls_$s GROUP BY v
         |  HAVING CAST(count(DISTINCT t) FILTER (WHERE cls = 'same')
         |       + count(DISTINCT lyr) FILTER (WHERE cls = 'prev')
         |       + count(*) FILTER (WHERE cls = 'new') AS DOUBLE) > 0),
         |incr_$s AS MATERIALIZED (
         |  SELECT d.v, d.deg, r.rank * $a / d.deg AS incr
         |  FROM deg_$s d JOIN ${lastR(s)} r ON r.id = d.v),
         |samei_$s AS (
         |  SELECT q.t AS id, sum(i.incr) AS si FROM (
         |    SELECT DISTINCT v, t FROM cls_$s WHERE cls = 'same') q
         |  JOIN incr_$s i ON i.v = q.v GROUP BY q.t),
         |r_${s}_${s + 1} AS MATERIALIZED (
         |  SELECT r.id, r.rank + coalesce(s2.si, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM ${lastR(s)} r LEFT JOIN samei_$s s2 ON s2.id = r.id),
         |${prevUpdates}newm_$s AS (
         |  SELECT v, t, CAST(count(*) AS DOUBLE) AS m
         |  FROM cls_$s WHERE cls = 'new' GROUP BY v, t),
         |r_${s + 1}_${s + 1} AS MATERIALIZED (
         |  SELECT n.t AS id, sum(n.m * r.rank * $a / d.deg) AS rank
         |  FROM newm_$s n JOIN r_${s}_${s + 1} r ON r.id = n.v
         |  JOIN deg_$s d ON d.v = n.v GROUP BY n.t),
         |f_${s + 1} AS MATERIALIZED (
         |  SELECT t AS id, path || [t] AS path FROM cls_$s WHERE cls = 'new')""".stripMargin
    }.mkString(",\n")
    val layers = (0 to S).map { i =>
      val name = if (i == 0) "r_0" else s"r_${i}_$S"
      val top = if (i == 0) Int.MaxValue else tops(i - 1)
      s"""SELECT layer, id, round(rank, 9) AS rank FROM (
         |  SELECT $i AS layer, id, rank,
         |         row_number() OVER (ORDER BY rank DESC, id ASC) AS rn FROM $name) z$i
         |WHERE rn <= $top""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       |adj AS MATERIALIZED ($bothEdgesSql),
       |f_0(id, path) AS (SELECT '$source', ['$source']),
       |r_0(id, rank) AS (SELECT '$source', CAST(1.0 AS DOUBLE)),
       |$steps
       |$layers""".stripMargin
  }

  def weightedSsspSql(rounds: Int): String = {
    val iters = (0 until rounds).map { i =>
      s"""d${i + 1} AS MATERIALIZED (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM d$i
         |    UNION ALL
         |    SELECT w.dst AS id, d.dist + w.w AS dist
         |    FROM d$i d JOIN wedges w ON w.src = d.id) GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |ew AS (
       |  SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
       |         'part:' || CAST(l_partkey AS VARCHAR) AS dst, l_quantity AS w FROM lineitem
       |  UNION ALL
       |  SELECT 'part:' || CAST(l_partkey AS VARCHAR),
       |         'supplier:' || CAST(l_suppkey AS VARCHAR), l_quantity FROM lineitem
       |  UNION ALL
       |  SELECT src, dst, 1.0 FROM edges WHERE label IN ('in_nation', 'in_region', 'placed')),
       |wedges AS MATERIALIZED (SELECT src, dst, w FROM ew UNION ALL SELECT dst, src, w FROM ew),
       |d0 AS (SELECT 'customer:1' AS id, CAST(0.0 AS DOUBLE) AS dist),
       |$iters
       |SELECT id, round(dist, 6) AS dist FROM d$rounds""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    q("q_fusiform_similarity",
      """WITH nb AS (SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR) AS v,
        |                            'part:' || CAST(l_partkey AS VARCHAR) AS t
        |            FROM lineitem WHERE l_orderkey < 50),
        |nc AS (SELECT v, count(*) AS n FROM nb GROUP BY v HAVING count(*) >= 2),
        |back AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS t,
        |                         'order:' || CAST(l_orderkey AS VARCHAR) AS cand FROM lineitem),
        |sim AS (SELECT nb.v, back.cand, count(*) AS c
        |        FROM nb JOIN nc ON nc.v = nb.v JOIN back ON back.t = nb.t
        |        WHERE back.cand <> nb.v GROUP BY nb.v, back.cand)
        |SELECT sim.v AS source, sim.cand AS similar,
        |       round(CAST(c AS DOUBLE) / nc.n, 9) AS score
        |FROM sim JOIN nc ON nc.v = sim.v
        |WHERE CAST(c AS DOUBLE) / nc.n >= 0.4""".stripMargin,
      bench = true) { (s, d) =>
      val sources = Tables.orders(s, d).filter(col("o_orderkey") < 50)
        .select(concat(lit("order:"), col("o_orderkey").cast("string")).as("id"))
      SimilarityTraversals.fusiformSimilarity(g(s, d), sources, Direction.OUT,
        "contains", minNeighbors = 2, alpha = 0.4, minSimilars = 1, top = 0)
    },

    q("q_jaccard_similar",
      """WITH adj AS MATERIALIZED (SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
        |                          'part:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
        |srcn AS (SELECT dst FROM adj WHERE src = 'order:42'),
        |cand AS (SELECT DISTINCT a.src AS cand FROM adj a JOIN srcn s ON a.dst = s.dst
        |         WHERE a.src <> 'order:42'),
        |i AS (SELECT a.src AS cand, count(*) AS inter
        |      FROM adj a JOIN srcn s ON s.dst = a.dst JOIN cand c ON c.cand = a.src
        |      GROUP BY a.src),
        |dg AS (SELECT a.src AS cand, count(*) AS deg
        |       FROM adj a JOIN cand c ON c.cand = a.src GROUP BY a.src),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS sn FROM srcn)
        |SELECT i.cand AS id,
        |       round(CAST(i.inter AS DOUBLE) / (dg.deg + n.sn - i.inter), 9) AS similarity
        |FROM i JOIN dg ON dg.cand = i.cand CROSS JOIN n
        |WHERE i.inter > 0""".stripMargin) { (s, d) =>
      SimilarityTraversals.jaccardSimilar(g(s, d), "order:42", Direction.OUT, "contains")
    },

    q("q_neighbor_rank_general",
      neighborRankGeneralSql("customer:1", 0.85, Seq(1000, 1000, 1000))) { (s, d) =>
      // general cyclic-walk neighborRank: BOTH-direction steps make the
      // same-layer / prev-layer / on-path transfer rules all fire
      SimilarityTraversals.neighborRank(g(s, d), "customer:1", alpha = 0.85,
        steps = Seq.fill(3)(SimilarityTraversals.RankStep(EdgeStep(Direction.BOTH))))
    },

    q("q_neighbor_rank",
      """WITH e1 AS (SELECT 'customer:' || CAST(o_custkey AS VARCHAR) AS src,
        |                   'order:' || CAST(o_orderkey AS VARCHAR) AS dst FROM orders),
        |oc1 AS (SELECT src, CAST(count(*) AS DOUBLE) AS oc FROM e1 GROUP BY src),
        |r1 AS (SELECT e1.dst AS id, sum(1.0 * 0.9 / oc1.oc) AS rank
        |       FROM e1 JOIN oc1 ON oc1.src = e1.src WHERE e1.src = 'customer:1'
        |       GROUP BY e1.dst),
        |e2 AS (SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
        |              'part:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
        |oc2 AS (SELECT src, CAST(count(*) AS DOUBLE) AS oc FROM e2 GROUP BY src),
        |r2 AS (SELECT e2.dst AS id, sum(r.rank * 0.9 / oc2.oc) AS rank
        |       FROM r1 r JOIN oc2 ON oc2.src = r.id JOIN e2 ON e2.src = r.id
        |       GROUP BY e2.dst)
        |SELECT 0 AS layer, 'customer:1' AS id, CAST(1.0 AS DOUBLE) AS rank
        |UNION ALL SELECT 1, id, round(rank, 9) FROM r1
        |UNION ALL SELECT 2, id, round(rank, 9) FROM r2""".stripMargin) { (s, d) =>
      SimilarityTraversals.neighborRankLayered(g(s, d), "customer:1", alpha = 0.9,
        steps = Seq(EdgeStep(Direction.OUT, Seq("placed")),
          EdgeStep(Direction.OUT, Seq("contains"))))
    },

    q("q_all_shortest_paths",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS ($bothEdgesSql),
         |p(id, path, d) AS (
         |  SELECT 'customer:1', ['customer:1'], 0
         |  UNION ALL
         |  SELECT a.dst, p.path || [a.dst], p.d + 1
         |  FROM p JOIN adj a ON a.src = p.id
         |  WHERE p.d < 3 AND NOT list_contains(p.path, a.dst)),
         |hits AS (SELECT * FROM p WHERE id = 'supplier:3')
         |SELECT DISTINCT array_to_string(path, '->') AS path FROM hits
         |WHERE d = (SELECT min(d) FROM hits)""".stripMargin) { (s, d) =>
      PathTraversals.allShortestPaths(g(s, d), "customer:1", "supplier:3",
        Direction.BOTH, Nil, maxDepth = 3)
    },

    // deterministic hash-guided walks: the graph→training-corpus bridge;
    // next hop = argmin md5("wid:step:dst"), unrolled per step in the oracle
    q("q_guided_walks",
      s"""WITH $guidedWalksCtes
         |SELECT wid AS walk_id, path FROM walks""".stripMargin) { (s, d) =>
      PathTraversals.guidedWalks(g(s, d),
        (1 to 50).map(i => s"customer:$i"), steps = 4, Direction.OUT)
    },

    // node2vec second-order biased walks: next hop drawn ∝ the p/q bias
    // via deterministic −ln(u)/w keys (A-Res top-1) — the graph-embedding
    // walk corpus with BFS/DFS flavor control, unrolled per step
    q("q_node2vec_walks",
      {
        val (p, q2) = (2.0, 0.5)
        def h16(c: String) = {
          def d4(i: Int) =
            s"(strpos('0123456789abcdef', substr(md5($c), $i, 1)) - 1)"
          s"(${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})"
        }
        val stepsSql = (1 to 4).map { n =>
          s"""e$n AS MATERIALIZED (
             |  SELECT w.wid, w.cur, w.path, a.dst,
             |    -ln(CAST(${h16(s"w.wid || ':$n:' || a.dst")} + 1 AS DOUBLE) / 65536.0) /
             |    CASE WHEN a.dst = w.prev THEN ${1.0 / p}
             |         WHEN nb.src IS NOT NULL THEN 1.0
             |         ELSE ${1.0 / q2} END AS key
             |  FROM w${n - 1} w JOIN adj a ON a.src = w.cur
             |  LEFT JOIN adj nb ON nb.src = w.prev AND nb.dst = a.dst),
             |t$n AS (SELECT wid, path FROM w${n - 1}
             |        WHERE wid NOT IN (SELECT DISTINCT wid FROM e$n)),
             |w$n AS MATERIALIZED (
             |  SELECT wid, cur AS prev, dst AS cur, path || '->' || dst AS path FROM
             |    (SELECT *, row_number() OVER (PARTITION BY wid ORDER BY key, dst) AS rn
             |     FROM e$n) z WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS ($edgesSql),
           |adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM
           |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) zz),
           |w0 AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS wid,
           |              CAST(NULL AS VARCHAR) AS prev,
           |              'customer:' || CAST(c_custkey AS VARCHAR) AS cur,
           |              'customer:' || CAST(c_custkey AS VARCHAR) AS path
           |       FROM customer WHERE c_custkey BETWEEN 1 AND 30),
           |$stepsSql,
           |walks AS (SELECT wid, path FROM t1
           |  UNION ALL SELECT wid, path FROM t2
           |  UNION ALL SELECT wid, path FROM t3
           |  UNION ALL SELECT wid, path FROM t4
           |  UNION ALL SELECT wid, path FROM w4)
           |SELECT wid AS walk_id, path FROM walks""".stripMargin
      }) { (s, d) =>
      PathTraversals.node2vecWalks(g(s, d),
        (1 to 30).map(i => s"customer:$i"), steps = 4, Direction.BOTH,
        p = 2.0, q = 0.5)
    },

    // GraphSAGE-style layered neighbor sampling: per seed, layer ℓ keeps
    // the md5-min fanout(ℓ) neighbors of every layer-(ℓ-1) node — the GNN
    // mini-batch subgraph extraction, unrolled per layer in the oracle
    q("q_neighbor_sample",
      s"""WITH edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM edges),
         |f0 AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS seed,
         |              'customer:' || CAST(c_custkey AS VARCHAR) AS node
         |       FROM customer WHERE c_custkey BETWEEN 1 AND 20),
         |e1 AS (SELECT f.seed, f.node, a.dst,
         |    row_number() OVER (PARTITION BY f.seed, f.node
         |      ORDER BY md5(f.seed || ':1:' || f.node || ':' || a.dst), a.dst) AS rn
         |  FROM f0 f JOIN adj a ON a.src = f.node),
         |s1 AS (SELECT seed, 1 AS layer, node AS src, dst FROM e1 WHERE rn <= 3),
         |f1 AS (SELECT DISTINCT seed, dst AS node FROM s1),
         |e2 AS (SELECT f.seed, f.node, a.dst,
         |    row_number() OVER (PARTITION BY f.seed, f.node
         |      ORDER BY md5(f.seed || ':2:' || f.node || ':' || a.dst), a.dst) AS rn
         |  FROM f1 f JOIN adj a ON a.src = f.node),
         |s2 AS (SELECT seed, 2 AS layer, node AS src, dst FROM e2 WHERE rn <= 2)
         |SELECT seed, CAST(layer AS INT) AS layer, src, dst
         |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) z""".stripMargin) { (s, d) =>
      PathTraversals.layeredNeighborSample(g(s, d),
        (1 to 20).map(i => s"customer:$i"), fanouts = Seq(3, 2), Direction.OUT)
    },

    // word2vec-style skip-gram pairs over the guided-walk corpus
    q("q_walk_skipgrams",
      s"""WITH $guidedWalksCtes,
         |toks AS (SELECT wid, generate_subscripts(string_split(path, '->'), 1) AS pos,
         |                unnest(string_split(path, '->')) AS v FROM walks)
         |SELECT a.v AS center, b.v AS context, CAST(count(*) AS BIGINT) AS n
         |FROM toks a JOIN toks b
         |  ON a.wid = b.wid AND a.pos <> b.pos AND abs(a.pos - b.pos) <= 2
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      PathTraversals.walkSkipgrams(
        PathTraversals.guidedWalks(g(s, d),
          (1 to 50).map(i => s"customer:$i"), steps = 4, Direction.OUT),
        window = 2)
    },

    q("q_neg_samples",
      {
        def hash60(c: String) = (0 until 15).map { j =>
          val mult = math.pow(16, 14 - j).toLong
          s"(strpos('0123456789abcdef', substr(md5($c), ${j + 1}, 1)) - 1) * CAST($mult AS BIGINT)"
        }.mkString("(", " + ", ")")
        val seed = "center || ':' || context || ':' || CAST(i AS VARCHAR)"
        s"""WITH $guidedWalksCtes,
           |toks AS (SELECT wid, generate_subscripts(string_split(path, '->'), 1) AS pos,
           |                unnest(string_split(path, '->')) AS v FROM walks),
           |sg AS (SELECT a.v AS center, b.v AS context
           |       FROM toks a JOIN toks b
           |         ON a.wid = b.wid AND a.pos <> b.pos AND abs(a.pos - b.pos) <= 2
           |       GROUP BY 1, 2),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
           |neg AS (SELECT center, context, CAST(i AS BIGINT) AS i,
           |          'customer:' || CAST((${hash60(seed)} % nn.n) + 1 AS VARCHAR) AS negative
           |        FROM sg, (SELECT unnest(range(1, 4)) AS i) z, nn)
           |SELECT center, context, i, negative FROM neg
           |WHERE negative <> context AND negative <> center""".stripMargin
      }) { (s, d) =>
      // word2vec-style negative sampling over the walk skip-grams
      // (Mikolov et al. 2013): k=3 deterministic negatives per (center,
      // context) pair from the DENSE customer id space — the "dense vocab
      // index beside the corpus" every negative sampler keeps; md5-derived
      // draws make the samples exactly reproducible (the engine-seeded
      // rand() of a typical implementation cannot be oracle-checked).
      // Accidental hits on the true context/center are EXCLUDED (the
      // deterministic analog of word2vec's resample-on-collision). Scale:
      // a narrow 3× flatMap over the pair stream — the vocab never
      // materializes, only its SIZE broadcasts.
      val sg = PathTraversals.walkSkipgrams(
        PathTraversals.guidedWalks(g(s, d),
          (1 to 50).map(i => s"customer:$i"), steps = 4, Direction.OUT),
        window = 2).select(col("center"), col("context"))
      val n = Tables.customer(s, d).count()
      sg.crossJoin(s.range(1, 4).select(col("id").as("i")))
        .withColumn("negative", concat(lit("customer:"),
          (graft.ops.Sketch.hash60(
            concat_ws(":", col("center"), col("context"), col("i"))) % n + 1)
            .cast("string")))
        .filter(col("negative") =!= col("context") &&
          col("negative") =!= col("center"))
        .select(col("center"), col("context"), col("i"), col("negative"))
    },

    q("q_rays",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM edges),
         |p(id, path, d) AS (
         |  SELECT 'customer:1', ['customer:1'], 0
         |  UNION ALL
         |  SELECT a.dst, p.path || [a.dst], p.d + 1
         |  FROM p JOIN adj a ON a.src = p.id
         |  WHERE p.d < 5 AND NOT list_contains(p.path, a.dst))
         |SELECT DISTINCT array_to_string(path, '->') AS path FROM p
         |WHERE d = 5 OR id NOT IN (SELECT src FROM adj)""".stripMargin) { (s, d) =>
      PathTraversals.rays(g(s, d), "customer:1", Direction.OUT, Nil, maxDepth = 5)
    },

    q("q_rings",
      // BOTH-direction rings from customer:130 (two of its orders share a
      // part at every SF → customer→order→part→order'→customer 4-rings).
      // The depth-2 A→B→A backtrack over a single physical edge is NOT a
      // ring (reference SubGraphTraverser.java:250-268) — with this graph's
      // single-edge pairs the closure depth is therefore always ≥ 3, which
      // the d >= 2 guard below encodes. The OUT projection (a DAG) stays
      // covered by PathTraversalSpec's cyclic fixture + q_rings_cycle.
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges
         |                                       UNION ALL SELECT dst, src FROM edges)),
         |p(id, path, d) AS (
         |  SELECT 'customer:130', ['customer:130'], 0
         |  UNION ALL
         |  SELECT a.dst, p.path || [a.dst], p.d + 1
         |  FROM p JOIN adj a ON a.src = p.id
         |  WHERE p.d < 3 AND a.dst <> 'customer:130' AND NOT list_contains(p.path, a.dst)),
         |hits AS (
         |  SELECT p.path || ['customer:130'] AS path
         |  FROM p JOIN adj a ON a.src = p.id
         |  WHERE a.dst = 'customer:130' AND p.d >= 2 AND p.d + 1 <= 4)
         |SELECT DISTINCT array_to_string(path, '->') AS path FROM hits""".stripMargin) { (s, d) =>
      PathTraversals.rings(g(s, d), "customer:130", Direction.BOTH, Nil, maxDepth = 4)
    },

    q("q_template_paths",
      """SELECT DISTINCT 'customer:1->order:' || CAST(o.o_orderkey AS VARCHAR) ||
        |       '->part:' || CAST(l.l_partkey AS VARCHAR) AS path
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE o.o_custkey = 1 AND o.o_totalprice > 200000 AND p.p_size > 30""".stripMargin) { (s, d) =>
      PathTraversals.templatePaths(g(s, d), Seq("customer:1"), Seq(
        TemplateStep(EdgeStep(Direction.OUT, Seq("placed")),
          Some(Cond.gt("totalprice", 200000.0))),
        TemplateStep(EdgeStep(Direction.OUT, Seq("contains")),
          Some(Cond.gt("size", 30)))))
    },

    q("q_template_paths_repeat",
      // variable-length template step (reference RepeatEdgeStep.maxTimes):
      // position 1 repeats the placed|contains step 1..2 times, so the
      // fixed tail (any OUT edge) extends BOTH the 1-hop branch
      // (customer→order →contains→part, length 2) and the 2-hop branch
      // (customer→order→part →supplied_by→supplier, length 3) — two path
      // lengths in one result, which a fixed-length template can't express
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |rep AS (SELECT DISTINCT src, dst FROM edges
         |        WHERE label IN ('placed', 'contains')),
         |p(id, path, d) AS (
         |  SELECT 'customer:1', ['customer:1'], 0
         |  UNION ALL
         |  SELECT r.dst, p.path || [r.dst], p.d + 1
         |  FROM p JOIN rep r ON r.src = p.id
         |  WHERE p.d < 2 AND NOT list_contains(p.path, r.dst)),
         |tail AS (
         |  SELECT p.path || [e.dst] AS path
         |  FROM p JOIN edges e ON e.src = p.id
         |  WHERE p.d >= 1 AND NOT list_contains(p.path, e.dst))
         |SELECT DISTINCT array_to_string(path, '->') AS path FROM tail""".stripMargin) { (s, d) =>
      PathTraversals.templatePaths(g(s, d), Seq("customer:1"), Seq(
        TemplateStep(EdgeStep(Direction.OUT, Seq("placed", "contains")), None, maxTimes = 2),
        TemplateStep(EdgeStep(Direction.OUT), None)))
    },

    q("q_template_paths_ring",
      // withRing=true (reference TemplatePathsTraverser withRing flag):
      // revisits allowed, so the BOTH in_nation step repeated twice
      // backtracks customer:1→nation:n→customer:1 — a path withRing=false
      // (and the fixed-length template) excludes
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |rep AS (SELECT DISTINCT src, dst FROM
         |          (SELECT src, dst FROM edges WHERE label = 'in_nation'
         |           UNION ALL
         |           SELECT dst, src FROM edges WHERE label = 'in_nation')),
         |p(id, path, d) AS (
         |  SELECT 'customer:1', ['customer:1'], 0
         |  UNION ALL
         |  SELECT r.dst, p.path || [r.dst], p.d + 1
         |  FROM p JOIN rep r ON r.src = p.id
         |  WHERE p.d < 2)
         |SELECT DISTINCT array_to_string(path, '->') AS path
         |FROM p WHERE d >= 1""".stripMargin) { (s, d) =>
      PathTraversals.templatePaths(g(s, d), Seq("customer:1"), Seq(
        TemplateStep(EdgeStep(Direction.BOTH, Seq("in_nation")), None, maxTimes = 2)),
        withRing = true)
    },

    q("q_customized_paths",
      """WITH walks AS (
        |  SELECT 'customer:1->order:' || CAST(o.o_orderkey AS VARCHAR) ||
        |         '->part:' || CAST(l.l_partkey AS VARCHAR) AS path,
        |         1.0 + l.l_quantity AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey = 1),
        |totals AS (SELECT path, sum(w) AS total_weight FROM walks GROUP BY path)
        |SELECT path, round(total_weight, 6) AS total_weight FROM (
        |  SELECT *, row_number() OVER (ORDER BY total_weight DESC, path ASC) AS rn
        |  FROM totals) WHERE rn <= 5""".stripMargin) { (s, d) =>
      PathTraversals.customizedPaths(g(s, d), Seq("customer:1"), Seq(
        (EdgeStep(Direction.OUT, Seq("placed")), None),
        (EdgeStep(Direction.OUT, Seq("contains")), Some("quantity"))), topN = 5)
    },

    q("q_customized_paths_sample",
      // full WeightedEdgeStep knobs (reference steps/WeightedEdgeStep.java:
      // 58-88): defaultWeight fallback on the placed hop (no quantity prop
      // there -> every path gets +2.5) and a per-vertex sample=3 cap on the
      // contains hop (md5-draw-ordered deterministic twin of the
      // reference's uniform edge sampling)
      """WITH ce AS (
        |  SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
        |         'part:' || CAST(l_partkey AS VARCHAR) AS dst,
        |         CAST(l_quantity AS DOUBLE) AS ew
        |  FROM lineitem),
        |cs AS (SELECT src, dst, ew FROM (
        |  SELECT *, row_number() OVER (PARTITION BY src
        |    ORDER BY md5(src || '|' || dst), dst, ew) AS rn FROM ce) z
        |  WHERE rn <= 3),
        |walks AS (
        |  SELECT 'customer:1->order:' || CAST(o.o_orderkey AS VARCHAR) ||
        |         '->' || cs.dst AS path,
        |         2.5 + cs.ew AS w
        |  FROM orders o JOIN cs ON cs.src = 'order:' || CAST(o.o_orderkey AS VARCHAR)
        |  WHERE o.o_custkey = 1),
        |totals AS (SELECT path, sum(w) AS total_weight FROM walks GROUP BY path)
        |SELECT path, round(total_weight, 6) AS total_weight FROM (
        |  SELECT *, row_number() OVER (ORDER BY total_weight DESC, path ASC) AS rn
        |  FROM totals) WHERE rn <= 5""".stripMargin) { (s, d) =>
      import PathTraversals.WeightedStep
      PathTraversals.customizedPathsWeighted(g(s, d), Seq("customer:1"), Seq(
        WeightedStep(EdgeStep(Direction.OUT, Seq("placed")),
          weightBy = Some("quantity"), defaultWeight = 2.5),
        WeightedStep(EdgeStep(Direction.OUT, Seq("contains")),
          weightBy = Some("quantity"), sample = 3L)), topN = 5)
    },

    q("q_collection_paths",
      """SELECT DISTINCT 'customer:' || CAST(o.o_custkey AS VARCHAR) ||
        |       '->order:' || CAST(o.o_orderkey AS VARCHAR) ||
        |       '->part:' || CAST(l.l_partkey AS VARCHAR) AS path
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey IN (1, 2) AND l.l_partkey IN (32, 68)""".stripMargin) { (s, d) =>
      PathTraversals.collectionPaths(g(s, d), Seq("customer:1", "customer:2"),
        Seq("part:32", "part:68"), Direction.OUT, Nil, maxDepth = 3)
    },

    q("q_multinode_shortest",
      // pairwise customer proximity over the geography subgraph
      // (in_nation/in_region) — restricting the labels keeps the BFS on the
      // 1.5k-vertex geo graph instead of sweeping all 186k vertices
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |geo AS (SELECT src, dst FROM edges WHERE label IN ('in_nation', 'in_region')),
         |adj AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM geo
         |                                       UNION ALL SELECT dst, src FROM geo)),
         |bfs(root, id, dist) AS (
         |  SELECT id, id, CAST(0 AS BIGINT)
         |  FROM (SELECT 'customer:1' AS id UNION ALL SELECT 'customer:11' UNION ALL SELECT 'customer:13')
         |  UNION
         |  SELECT b.root, a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
         |  WHERE b.dist < 4),
         |d AS (SELECT root, id, min(dist) AS dist FROM bfs GROUP BY root, id)
         |SELECT root AS a, id AS b, dist FROM d
         |WHERE id IN ('customer:1', 'customer:11', 'customer:13') AND root < id""".stripMargin) { (s, d) =>
      // customers 1/11/13 share region 4 at every SF → the geo subgraph
      // connects each pair within 4 hops (dist 2 same-nation, else 4) and
      // the oracle gate carries real rows
      PathTraversals.multiNodeShortestDist(g(s, d),
        Seq("customer:1", "customer:11", "customer:13"), Direction.BOTH,
        Seq("in_nation", "in_region"), maxDepth = 4)
    },

    q("q_crosspoints",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT src, dst FROM edges),
         |b1(id, dist) AS (
         |  SELECT 'customer:1', CAST(0 AS BIGINT)
         |  UNION
         |  SELECT a.dst, b.dist + 1 FROM b1 b JOIN adj a ON a.src = b.id WHERE b.dist < 3),
         |b2(id, dist) AS (
         |  SELECT 'customer:2', CAST(0 AS BIGINT)
         |  UNION
         |  SELECT a.dst, b.dist + 1 FROM b2 b JOIN adj a ON a.src = b.id WHERE b.dist < 3)
         |SELECT id FROM (
         |  SELECT DISTINCT id FROM b1 WHERE id <> 'customer:1'
         |  INTERSECT
         |  SELECT DISTINCT id FROM b2 WHERE id <> 'customer:2')
         |WHERE id NOT IN ('customer:1', 'customer:2')""".stripMargin) { (s, d) =>
      PathTraversals.crosspoints(g(s, d), Seq("customer:1", "customer:2"),
        Direction.OUT, Nil, maxDepth = 3)
    },

    q("q_weighted_sssp", weightedSsspSql(4), bench = true) { (s, d) =>
      PathTraversals.weightedSssp(g(s, d), "customer:1", Direction.BOTH, Nil,
        weightCol = "quantity", rounds = 4)
    },

    q("q_unique_check",
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       array_to_string(list_sort(list('customer:' || CAST(c_custkey AS VARCHAR))), ',') AS ids
        |FROM customer GROUP BY c_nationkey, c_mktsegment HAVING count(*) > 1""".stripMargin) { (s, d) =>
      // UNIQUE-index semantics as constraint check (no physical index).
      // ids joined to csv: the driver's comparator can't sort array columns.
      Mutations.uniqueViolations(
        Tables.customer(s, d).withColumn("id",
          concat(lit("customer:"), col("c_custkey").cast("string"))),
        Seq("c_nationkey", "c_mktsegment"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          concat_ws(",", col("ids")).as("ids"))
    },

    q("q_id_strategies",
      // §2.14 id strategies as verifiable columns: PRIMARY_KEY splice
      // (SplicingIdGenerator label:pk form), CUSTOMIZE_UUID (RFC 4122 v3
      // name-based — version nibble 3, variant nibble (n&3)|8 — the
      // java.util.UUID.nameUUIDFromBytes layout UuidId.asString prints),
      // and the 6-part EdgeId (empty sort-values slot collapses to '||')
      """SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS vid,
        |       substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' ||
        |       substr(h, 14, 3) || '-' ||
        |       translate(substr(h, 17, 1), '0123456789abcdef', '89ab89ab89ab89ab') ||
        |       substr(h, 18, 3) || '-' || substr(h, 21, 12) AS uid,
        |       'customer:' || CAST(o_custkey AS VARCHAR) || '|placed||order:' ||
        |       CAST(o_orderkey AS VARCHAR) AS eid
        |FROM (SELECT o_orderkey, o_custkey,
        |        md5('order:' || CAST(o_orderkey AS VARCHAR)) AS h
        |      FROM orders WHERE o_orderkey <= 2000) z""".stripMargin) { (s, d) =>
      import graft.core.IdSplicer._
      Tables.orders(s, d).filter(col("o_orderkey") <= 2000)
        .select(
          spliceId("order", col("o_orderkey")).as("vid"),
          uuidId(spliceId("order", col("o_orderkey"))).as("uid"),
          edgeId(spliceId("customer", col("o_custkey")), lit("placed"),
            lit(null).cast("string"),
            spliceId("order", col("o_orderkey"))).as("eid"))
    },

    q("q_rings_cycle",
      // non-trivial rings: the derived "nation ring" graph (each nation →
      // next nationkey within its region, wrapping) has exactly one directed
      // cycle per region; rings from a member must find it
      """WITH RECURSIVE ring AS (
        |  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS src,
        |         'nation:' || CAST(coalesce(
        |           lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey),
        |           min(n_nationkey) OVER (PARTITION BY n_regionkey)) AS VARCHAR) AS dst
        |  FROM nation),
        |p(id, path, d) AS (
        |  SELECT 'nation:0', ['nation:0'], 0
        |  UNION ALL
        |  SELECT r.dst, p.path || [r.dst], p.d + 1
        |  FROM p JOIN ring r ON r.src = p.id
        |  WHERE p.d < 10 AND r.dst <> 'nation:0' AND NOT list_contains(p.path, r.dst))
        |,hits AS (
        |  SELECT p.path || ['nation:0'] AS path FROM p JOIN ring r ON r.src = p.id
        |  WHERE r.dst = 'nation:0')
        |SELECT DISTINCT array_to_string(path, '->') AS path FROM hits""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      val wAll = Window.partitionBy(col("n_regionkey"))
      val ring = Tables.nation(s, d).select(
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("src"),
        concat(lit("nation:"),
          coalesce(lead(col("n_nationkey"), 1).over(wOrd),
            min(col("n_nationkey")).over(wAll)).cast("string")).as("dst"))
        .withColumn("label", lit("next"))
        .withColumn("sort_values", lit(null).cast("string"))
      val verts = Tables.nation(s, d).select(
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("id"),
        lit("nation").as("label"))
      val rg = PropertyGraph(verts, ring, TpchGraph.schema)
      PathTraversals.rings(rg, "nation:0", Direction.OUT, Nil, maxDepth = 10)
    },

    q("q_sortkey_range",
      // edge sort-key prefix/range semantics (EdgeId 6-part identity,
      // reference EdgeId.java:31-43 + optimizeQuery sort-key rewrite): the
      // sort-key values are part of edge identity and range-filterable
      """SELECT 'order:42' AS src, 'part:' || CAST(l_partkey AS VARCHAR) AS dst,
        |       CAST(l_linenumber AS VARCHAR) AS sort_values, l_quantity AS quantity
        |FROM lineitem
        |WHERE l_orderkey = 42 AND l_linenumber >= 2 AND l_linenumber <= 5""".stripMargin) { (s, d) =>
      EdgeStep(Direction.OUT, Seq("contains"),
        cond = Some(Cond.gte("linenumber", 2) and Cond.lte("linenumber", 5)))
        .edgesFor(g(s, d))
        .filter(col("src") === "order:42")
        .select(col("src"), col("dst"), col("sort_values"), col("quantity"))
    },

    q("q_gremlin_frontend",
      """SELECT o.o_orderstatus AS orderstatus, CAST(count(*) AS BIGINT) AS n
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderstatus""".stripMargin) { (s, d) =>
      // the §3.1 script entry point, end to end: text → parsed steps →
      // DSL → one Catalyst plan
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').has('mktsegment', 'BUILDING')" +
          ".out('placed').groupCount('orderstatus')")
    },

    q("q_cypher_frontend",
      """SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE s.s_acctbal > 0
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      // §3.2 entry point: Cypher text → pattern joins on the same engine
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (s:supplier)-[:in_nation]->(n:nation) WHERE s.acctbal > 0 " +
          "RETURN n.name AS nation, count(*) AS n_suppliers")
    },

    q("q_cypher_multi",
      """SELECT cust, price FROM (
        |  SELECT c.c_name AS cust, o.o_totalprice AS price
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE n.n_name = 'NATION_2'
        |  ORDER BY cust ASC, price DESC
        |  LIMIT 20 OFFSET 5) z""".stripMargin) { (s, d) =>
      // multi-clause Cypher: MATCH + OPTIONAL MATCH joined on the shared
      // variable, ORDER BY over aliases, SKIP/LIMIT paging
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) " +
          "OPTIONAL MATCH (c)-[:placed]->(o:order) " +
          "WHERE n.name = 'NATION_2' " +
          "RETURN c.name AS cust, o.totalprice AS price " +
          "ORDER BY cust ASC, price DESC SKIP 5 LIMIT 20")
    },

    q("q_gremlin_choose",
      // script-reachable branch step: rich customers step to their nation,
      // the rest stay customers — per-element choose() lowered onto the
      // DSL's filter-union implementation from TEXT (reference: scripts
      // and API share one step surface, ProcessBasicSuite.java:104-196);
      // every customer has exactly one in_nation edge, so the oracle is
      // the CASE twin
      """SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT CASE WHEN c_acctbal > 5000 THEN 'nation' ELSE 'customer' END AS label
        |  FROM customer) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer')" +
          ".choose(has('acctbal', gt(5000)), out('in_nation'), identity())" +
          ".groupCount('label')")
    },

    q("q_cypher_varlen",
      // variable-length Cypher -[:in_nation*1..2]- over the BOTH view,
      // oracled by the unrolled-depth CTE twin of the engine's layered
      // expansion: per-layer DISTINCT (a, x) pairs, union over the hop
      // window, :supplier label filter on the reached end, grouped count
      s"""WITH edges AS ($edgesSql),
         |bidir AS (SELECT src, dst FROM edges WHERE label = 'in_nation'
         |          UNION ALL
         |          SELECT dst, src FROM edges WHERE label = 'in_nation'),
         |l0 AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS a,
         |              'customer:' || CAST(c_custkey AS VARCHAR) AS x
         |       FROM customer),
         |l1 AS (SELECT DISTINCT l.a, b.dst AS x FROM l0 l JOIN bidir b ON b.src = l.x),
         |l2 AS (SELECT DISTINCT l.a, b.dst AS x FROM l1 l JOIN bidir b ON b.src = l.x),
         |pairs AS (SELECT a, x FROM l1 UNION SELECT a, x FROM l2),
         |hits AS (SELECT p.a FROM pairs p
         |         JOIN supplier s ON p.x = 'supplier:' || CAST(s.s_suppkey AS VARCHAR))
         |SELECT c.c_name AS cust, CAST(count(*) AS BIGINT) AS n_nation_suppliers
         |FROM hits h JOIN customer c
         |  ON h.a = 'customer:' || CAST(c.c_custkey AS VARCHAR)
         |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation*1..2]-(x:supplier) " +
          "RETURN c.name AS cust, count(*) AS n_nation_suppliers")
    },

    q("q_gremlin_match",
      // the TinkerPop match() step (ProcessBasicSuite map-step list) as a
      // declarative DSL entry point: two patterns joined on the shared
      // variable c — the inner-join sibling of q_cypher_multi's plan,
      // lowered onto the SAME shared-variable join planner
      """SELECT cust, price FROM (
        |  SELECT c.c_name AS cust, o.o_totalprice AS price
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE n.n_name = 'NATION_2'
        |  ORDER BY cust ASC, price DESC
        |  LIMIT 20 OFFSET 5) z""".stripMargin) { (s, d) =>
      import graft.api.MatchPattern.as
      graft.api.Graft.g(g(s, d)).V().hasLabel("customer")
        .matchStep(
          as("c").hasLabel("customer").out("in_nation").as("n").hasLabel("nation"),
          as("c").out("placed").as("o").hasLabel("order"))
        .withProp("n", "name", "nname")
        .where(col("nname") === "NATION_2")
        .withProp("c", "name", "cust")
        .withProp("o", "totalprice", "price")
        .select("cust", "price")
        .orderBy(col("cust").asc, col("price").desc)
        .offset(5).limit(20)
    },

    q("q_gremlin_match_script",
      // the SAME match() join tree reached from the TEXT frontend
      // (reference: scripts and API share one step surface —
      // GremlinAPI.java:51-88 routes scripts onto the identical
      // traversal): pattern-level has() lowers to a post-join property
      // filter, select().by() projects binding properties, range() pages
      """SELECT c, o FROM (
        |  SELECT cu.c_name AS c, ord.o_totalprice AS o
        |  FROM customer cu JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |  JOIN orders ord ON ord.o_custkey = cu.c_custkey
        |  WHERE n.n_name = 'NATION_2'
        |  ORDER BY c ASC, o DESC
        |  LIMIT 20 OFFSET 5) z""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').match(" +
          "as('c').hasLabel('customer').out('in_nation').as('n')" +
          ".hasLabel('nation').has('name', 'NATION_2'), " +
          "as('c').out('placed').as('o').hasLabel('order'))" +
          ".select('c', 'o').by('name').by('totalprice')" +
          ".order().by('c').by('o', 'decr').range(5, 25)")
    },

    q("q_gremlin_repeat",
      // the §2.9 branch-step family end-to-end: repeat(out()).times(2)
      // from the script frontend = exact-2-hop OUT reachability
      s"""WITH edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM edges)
         |SELECT DISTINCT a2.dst AS id
         |FROM adj a1 JOIN adj a2 ON a2.src = a1.dst
         |WHERE a1.src = 'customer:1'""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').repeat(out()).times(2).dedup().id()")
    },

    q("q_sql_frontend",
      s"""WITH edges AS ($edgesSql)
         |SELECT split_part(src, ':', 1) AS src_label, label AS edge_label,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM edges GROUP BY 1, 2""".stripMargin) { (s, d) =>
      // §3 frontend #3: plain Spark SQL over the registered graph views —
      // the vertices join resolves the src label from the vertex table
      // (not by string-splitting the id), exercising view → Catalyst all
      // the way to the parquet scans.
      g(s, d).registerViews("g")
      s.sql("""SELECT v.label AS src_label, e.label AS edge_label,
              |       count(*) AS n
              |FROM g_edges e JOIN g_vertices v ON v.id = e.src
              |GROUP BY v.label, e.label""".stripMargin)
    },

    q("q_ttl_filter",
      """SELECT event_id FROM events
        |WHERE epoch_ms(ts) + 2592000000 > epoch_ms(TIMESTAMP '2024-01-15 00:00:00')""".stripMargin) { (s, d) =>
      // TTL-at-read semantics: 30-day TTL against a fixed "now"
      val withTtl = Tables.events(s, d)
        .withColumn("~ttl_expiry", unix_millis(col("ts")) + 2592000000L)
      Mutations.vacuumExpired(withTtl,
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime)
        .select(col("event_id"))
    },

    q("q_sublabel_route",
      // father/sub edge-label hierarchy (reference EdgeLabel.java:44-55,
      // GraphTransaction.optimizeQuery:1607-1656): per-customer counts via
      // a SUB label (routed to label=father AND sub_label=sub) and via the
      // father label (matches every sub)
      """SELECT id, CAST(coalesce(u, 0) AS BIGINT) AS n_urgent, CAST(a AS BIGINT) AS n_all
        |FROM (
        |  SELECT 'customer:' || CAST(o_custkey AS VARCHAR) AS id,
        |         count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS u,
        |         count(*) AS a
        |  FROM orders GROUP BY 1) z
        |ORDER BY n_all DESC, id ASC LIMIT 20""".stripMargin) { (s, d) =>
      val edges = Tables.orders(s, d).select(
        concat(lit("customer:"), col("o_custkey").cast("string")).as("src"),
        concat(lit("order:"), col("o_orderkey").cast("string")).as("dst"),
        lit("placed").as("label"),
        when(col("o_orderpriority") === "1-URGENT", "placed_urgent")
          .otherwise("placed_other").as("sub_label"),
        lit(null).cast("string").as("sort_values"))
      val verts = edges.select(col("src").as("id")).distinct()
        .withColumn("label", lit("customer"))
      val sch = GraphSchema(
        propertyKeys = Nil,
        vertexLabels = Seq(VertexLabelDef("customer", Nil), VertexLabelDef("order", Nil)),
        edgeLabels = Seq(
          EdgeLabelDef("placed", "customer", "order", isParent = true),
          EdgeLabelDef("placed_urgent", "customer", "order", father = Some("placed")),
          EdgeLabelDef("placed_other", "customer", "order", father = Some("placed"))))
      val pg = PropertyGraph(verts, edges, sch)
      val urgent = EdgeStep(Direction.OUT, Seq("placed_urgent")).edgesFor(pg)
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("u"))
      val all = EdgeStep(Direction.OUT, Seq("placed")).edgesFor(pg)
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("a"))
      all.join(urgent, Seq("id"), "left")
        .select(col("id"), coalesce(col("u"), lit(0L)).as("n_urgent"), col("a").as("n_all"))
        .orderBy(col("n_all").desc, col("id").asc).limit(20)
    },

    q("q_gremlin_select",
      // mid-traversal step labeling from script text (reference select-step
      // tests ProcessBasicSuite.java:104-196): as('c') binds each customer,
      // as('o') its orders, the filter cuts on the order, select().by()
      // projects the binding map — lowered onto rider columns + the
      // MatchResult property joins
      """SELECT c.c_name AS c, o.o_totalprice AS o
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice > 100000""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').as('c').out('placed').as('o')" +
          ".has('totalprice', gt(100000))" +
          ".select('c', 'o').by('name').by('totalprice')")
    },

    q("q_gremlin_backstep",
      // select(one) is the BACK-STEP: suppliers step to their nation, the
      // filter cuts on the nation, select('s') repositions the traverser
      // at the supplier and the traversal CONTINUES (values terminal)
      """SELECT s.s_name AS name
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name = 'NATION_3'""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('supplier').as('s').out('in_nation')" +
          ".has('name', 'NATION_3').select('s').values('name')")
    },

    q("q_gremlin_project",
      // project(k…).by(prop) — per-element named projections of the
      // current position (TinkerPop map step)
      """SELECT p_name AS pname, CAST(p_size AS INT) AS psize,
        |       p_retailprice AS pprice
        |FROM part WHERE p_size < 3""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('part').has('size', lt(3))" +
          ".project('pname', 'psize', 'pprice').by('name').by('size').by('retailprice')")
    },

    q("q_gremlin_repeat_emit",
      // repeat(out()).emit().times(2): every intermediate layer emitted
      // with walk multiplicity (the kout-ALL shape from script text)
      s"""WITH edges AS ($edgesSql),
         |l1 AS (SELECT dst FROM edges WHERE src = 'customer:1'),
         |l2 AS (SELECT e.dst FROM l1 JOIN edges e ON e.src = l1.dst),
         |lays AS (SELECT dst FROM l1 UNION ALL SELECT dst FROM l2)
         |SELECT split_part(dst, ':', 1) AS label, CAST(count(*) AS BIGINT) AS n
         |FROM lays GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').repeat(out()).emit().times(2).groupCount('label')")
    },

    q("q_gremlin_until",
      // repeat(out()).until(hasLabel('region')): predicate-exit repetition
      // (TinkerPop until-after-repeat) — each traverser exits the loop the
      // FIRST time it reaches a region: depth 2 via its nation, depth 5 via
      // order→part→supplier→nation (walk multiplicity preserved; the
      // until-check keeps every non-region looping, frontier drains at
      // round 5). Oracle = the two exit depths unrolled as join chains.
      """SELECT name, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT r.r_name AS name
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE c.c_custkey IN (1, 2, 3)
        |  UNION ALL
        |  SELECT r.r_name
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
        |  JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l2.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE c.c_custkey IN (1, 2, 3)) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1','customer:2','customer:3')" +
          ".repeat(out()).until(hasLabel('region')).groupCount('name')")
    },

    q("q_gremlin_emit_first",
      // emit().repeat(out()).times(2): the EMIT-FIRST form — layer 0 (the
      // start vertex itself) is emitted alongside layers 1..2 (TinkerPop
      // emit-before-repeat)
      s"""WITH edges AS ($edgesSql),
         |l1 AS (SELECT dst FROM edges WHERE src = 'customer:1'),
         |l2 AS (SELECT e.dst FROM l1 JOIN edges e ON e.src = l1.dst),
         |lays AS (SELECT 'customer:1' AS dst
         |  UNION ALL SELECT dst FROM l1
         |  UNION ALL SELECT dst FROM l2)
         |SELECT split_part(dst, ':', 1) AS label, CAST(count(*) AS BIGINT) AS n
         |FROM lays GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').emit().repeat(out()).times(2).groupCount('label')")
    },

    q("q_gremlin_repeat_body",
      // multi-step repeat BODY from script text: each round is the full
      // co-part closure step supplier→part with in-round dedups (the body
      // is any sub-traversal chain, not just one hop) — two rounds from
      // part:1 = parts sharing a supplier at distance ≤2 in the co-supply
      // graph
      """WITH s1 AS (SELECT DISTINCT l_suppkey AS k FROM lineitem WHERE l_partkey = 1),
        |p1 AS (SELECT DISTINCT l.l_partkey AS k FROM lineitem l JOIN s1 ON s1.k = l.l_suppkey),
        |s2 AS (SELECT DISTINCT l.l_suppkey AS k FROM lineitem l JOIN p1 ON p1.k = l.l_partkey),
        |p2 AS (SELECT DISTINCT l.l_partkey AS k FROM lineitem l JOIN s2 ON s2.k = l.l_suppkey)
        |SELECT 'part:' || CAST(k AS VARCHAR) AS id FROM p2""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('part:1').repeat(out('supplied_by').dedup().in('supplied_by').dedup())" +
          ".times(2).id()")
    },

    q("q_gremlin_group_agg",
      // group().by(key).by(sum(prop)): grouped scalar aggregation via the
      // TinkerPop modulator form (integral int sums — exact on both
      // engines; Spark sum(int) = long, DuckDB HUGEINT → BIGINT)
      """SELECT p_brand AS brand, CAST(sum(p_size) AS BIGINT) AS value
        |FROM part GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('part').group().by('brand').by(sum('size'))")
    },

    q("q_gremlin_groupcount_by",
      // groupCount().by(key): the modulator twin of groupCount(key)
      """SELECT c_mktsegment AS mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').groupCount().by('mktsegment')")
    },

    q("q_gremlin_group_fold",
      // group().by(key) with no value by(): collect the element ids per
      // key (sorted for determinism; serialized to csv — arrays don't
      // survive the driver's pandas comparator)
      """SELECT CAST(p_size AS INT) AS size,
        |       array_to_string(list_sort(list('part:' || CAST(p_partkey AS VARCHAR))), ',') AS members
        |FROM part WHERE p_size < 6
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('part').has('size', lt(6)).group().by('size')")
        .select(col("size"), array_join(col("values"), ",").as("members"))
    },

    q("q_gremlin_textp",
      // TinkerPop TextP predicates from script text: plain prefix/suffix/
      // substring (NOT the tokenized textContains) + the negated form
      """SELECT p_name AS name FROM part
        |WHERE p_name LIKE '%bolt' AND p_type LIKE '%OM%'
        |  AND p_name NOT LIKE 'blue%'""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('part').has('name', endingWith('bolt'))" +
          ".has('type', containing('OM'))" +
          ".has('name', notStartingWith('blue')).values('name')")
    },

    q("q_gremlin_numeric_p",
      // inside/outside numeric P predicates (exclusive bounds) per the
      // TinkerPop P contract
      """SELECT CAST(p_size AS INT) AS size, CAST(count(*) AS BIGINT) AS n
        |FROM part
        |WHERE p_size > 3 AND p_size < 7
        |  AND (p_retailprice < 1200 OR p_retailprice > 1800)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('part').has('size', inside(3, 7))" +
          ".has('retailprice', outside(1200, 1800)).groupCount('size')")
    },

    q("q_gremlin_bothe",
      // bothE().otherV(): incident edges in BOTH orientations from the
      // reversed view (storage never duplicated), each continued at the
      // far endpoint — nation:3's customers + suppliers (IN) + region (OUT)
      """SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'customer' AS label FROM customer WHERE c_nationkey = 3
        |  UNION ALL SELECT 'supplier' FROM supplier WHERE s_nationkey = 3
        |  UNION ALL SELECT 'region' FROM nation WHERE n_nationkey = 3) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('nation:3').bothE().otherV().groupCount('label')")
    },

    q("q_gremlin_bothv",
      // E(label).bothV(): both endpoints of each edge (two traversers per
      // edge, multiplicity preserved)
      """SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'nation' AS label FROM nation
        |  UNION ALL SELECT 'region' FROM nation) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.E('in_region').bothV().groupCount('label')")
    },

    q("q_gremlin_union",
      // union(subA, subB): every branch starts from the same incoming
      // traversers; multiplicity preserved (TinkerPop branch step)
      """SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'customer' AS label FROM customer
        |  UNION ALL SELECT 'supplier' FROM supplier
        |  UNION ALL SELECT 'region' FROM nation) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('nation')" +
          ".union(in('in_nation'), out('in_region')).groupCount('label')")
    },

    q("q_gremlin_where_binding",
      // where(neq('p')): compare the current element to a step-label
      // binding — the classic co-occurrence-excluding-self idiom
      """SELECT DISTINCT 'part:' || CAST(l2.l_partkey AS VARCHAR) AS id
        |FROM lineitem l1 JOIN lineitem l2 ON l2.l_suppkey = l1.l_suppkey
        |WHERE l1.l_partkey = 1 AND l2.l_partkey <> 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('part:1').as('p').out('supplied_by').in('supplied_by')" +
          ".where(neq('p')).dedup().id()")
    },

    q("q_cypher_edgeprops",
      // relationship variable binding edge properties (reference serves
      // full openCypher via CypherAPI.java:49-95; edge-prop predicates per
      // the EdgeCoreTest.java sort-key/edge-prop families): r binds the
      // contains edge, WHERE filters r.quantity, RETURN projects
      // r.discount — the oracle is the plain lineitem 3-table join
      """SELECT o.o_orderpriority AS pri, l.l_discount AS disc, p.p_name AS part_name
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity > 45 AND p.p_size >= 25""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (o:order)-[r:contains]->(p:part) " +
          "WHERE r.quantity > 45 AND p.size >= 25 " +
          "RETURN o.orderpriority AS pri, r.discount AS disc, p.name AS part_name")
    },

    q("q_cypher_where_or",
      // WHERE boolean grammar: parenthesized OR disjunction AND a NOT —
      // top-decile Cypher idioms, lowered onto the Catalyst boolean tree
      """SELECT c.c_name AS cust, n.n_name AS nation
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE (n.n_name = 'NATION_2' OR n.n_name = 'NATION_5')
        |  AND NOT (c.c_acctbal < 0)""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) " +
          "WHERE (n.name = 'NATION_2' OR n.name = 'NATION_5') " +
          "AND NOT c.acctbal < 0 " +
          "RETURN c.name AS cust, n.name AS nation")
    },

    q("q_cypher_pattern_semi",
      // WHERE pattern predicate (openCypher existential): customers in the
      // BUILDING segment who placed at least one order — lowered onto a
      // LEFT SEMI join of the binding table against the pattern chain
      // (never a row-multiplying join; oracle = EXISTS)
      """SELECT c_name AS cust FROM customer c
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) " +
          "WHERE (c)-[:placed]->(:order) AND c.mktsegment = 'BUILDING' " +
          "RETURN c.name AS cust")
    },

    q("q_cypher_pattern_anti",
      // negated pattern predicate over a BOUND PAIR: for every
      // (customer, nation) pair, keep those NOT joined by an in_nation
      // edge — WHERE NOT (c)-[:in_nation]->(n) is a LEFT ANTI join of the
      // binding table on BOTH endpoints (oracle = NOT EXISTS = the <>
      // join), re-aggregated per nation
      """SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_foreign
        |FROM customer c JOIN nation n ON c.c_nationkey <> n.n_nationkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) MATCH (n:nation) " +
          "WHERE NOT (c)-[:in_nation]->(n) " +
          "RETURN n.name AS nation, count(*) AS n_foreign")
    },

    q("q_cypher_pipeline",
      // MATCH after WITH — the openCypher pipeline: aggregate per customer,
      // filter on the aggregate (HAVING), then a SECOND pattern block joins
      // the surviving bindings to their nation and RETURN re-aggregates
      """WITH heavy AS (
        |  SELECT o_custkey AS ck, count(*) AS n_orders
        |  FROM orders GROUP BY 1 HAVING count(*) >= 10)
        |SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_heavy,
        |       CAST(max(h.n_orders) AS BIGINT) AS max_orders
        |FROM heavy h
        |JOIN customer c ON c.c_custkey = h.ck
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c, count(*) AS n_orders WHERE n_orders >= 10 " +
          "MATCH (c)-[:in_nation]->(n:nation) " +
          "RETURN n.name AS nation, count(*) AS n_heavy, " +
          "max(n_orders) AS max_orders")
    },

    q("q_cypher_shortestpath",
      // MATCH p = shortestPath((c)-[*..3]-(s:supplier)): layered
      // first-seen BFS over the UNLABELED BOTH view, min hop count per
      // reached supplier, WHERE equality pushed into the source set —
      // len 2 = same-nation suppliers (c-n-s), len 3 = co-trade suppliers
      // (c-o-p-s); oracle = the recursive-CTE BFS with min(d)
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS ($bothEdgesSql),
         |bfs(x, d) AS (
         |  SELECT 'customer:1', 0
         |  UNION
         |  SELECT a.dst, b.d + 1 FROM bfs b JOIN adj a ON a.src = b.x
         |  WHERE b.d < 3),
         |md AS (SELECT x, min(d) AS len FROM bfs GROUP BY 1),
         |hits AS (SELECT len FROM md
         |  JOIN supplier s ON md.x = 'supplier:' || CAST(s_suppkey AS VARCHAR))
         |SELECT CAST(len AS BIGINT) AS len, CAST(count(*) AS BIGINT) AS n_sup
         |FROM hits GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH p = shortestPath((c:customer)-[*..3]-(s:supplier)) " +
          "WHERE c.name = 'Customer#000000001' " +
          "RETURN length(p) AS len, count(*) AS n_sup")
    },

    q("q_cypher_unwind",
      // leading UNWIND (parameter fan-out): the literal list seeds the
      // frontier, MATCH joins via the guarded broadcast cross, WHERE
      // equality cuts the product
      """SELECT nm, CAST(count(*) AS BIGINT) AS n_sup
        |FROM (VALUES ('NATION_1'), ('NATION_5'), ('NATION_9')) t(nm)
        |JOIN nation n ON n.n_name = nm
        |JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "UNWIND ['NATION_1', 'NATION_5', 'NATION_9'] AS nm " +
          "MATCH (s:supplier)-[:in_nation]->(n:nation) WHERE n.name = nm " +
          "RETURN nm, count(*) AS n_sup")
    },

    q("q_cypher_collect_unwind",
      // collect() through WITH then UNWIND back to rows with a post-unwind
      // WHERE — the round-trip equals the direct filter (the oracle)
      """SELECT c.c_name AS cust, CAST(count(*) AS BIGINT) AS n_big
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 200000
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c, collect(o.totalprice) AS ps UNWIND ps AS p " +
          "WHERE p > 200000 " +
          "RETURN c.name AS cust, count(*) AS n_big")
    },

    q("q_cypher_where_expr",
      // WHERE expression comparisons: arithmetic over an edge prop on the
      // lhs, modulo on a node prop — the general CmpE fallback beyond the
      // pushable ref-vs-literal form
      """SELECT p.p_name AS pname, l.l_quantity AS qty,
        |       CAST(l.l_linenumber AS INT) AS ln
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity * (10 - l.l_linenumber) > 300
        |  AND p.p_size % 5 = 0""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (o:order)-[r:contains]->(p:part) " +
          "WHERE r.quantity * (10 - r.linenumber) > 300 AND p.size % 5 = 0 " +
          "RETURN p.name AS pname, r.quantity AS qty, r.linenumber AS ln")
    },

    q("q_cypher_multistage",
      // chained WITH stages (the openCypher pipeline): orders per customer,
      // then the DISTRIBUTION of those counts — aggregate of an aggregate
      """SELECT n, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |      FROM orders GROUP BY 1) z
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c, count(*) AS n " +
          "WITH n, count(*) AS n_customers " +
          "RETURN n, n_customers")
    },

    q("q_cypher_with_topk",
      // WITH … ORDER BY … LIMIT (top-k-then-expand): top-3 customers by
      // order count (id tiebreak — both engines must pick the same rows),
      // then the second block expands the survivors to their nation
      """WITH top AS (
        |  SELECT o_custkey AS ck, count(*) AS n FROM orders GROUP BY 1
        |  ORDER BY n DESC, 'customer:' || CAST(o_custkey AS VARCHAR) ASC
        |  LIMIT 3)
        |SELECT c.c_name AS cust, CAST(t.n AS BIGINT) AS n, nn.n_name AS nation
        |FROM top t
        |JOIN customer c ON c.c_custkey = t.ck
        |JOIN nation nn ON nn.n_nationkey = c.c_nationkey""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c, count(*) AS n ORDER BY n DESC, c ASC LIMIT 3 " +
          "MATCH (c)-[:in_nation]->(nt:nation) " +
          "RETURN c.name AS cust, n, nt.name AS nation")
    },

    q("q_cypher_case",
      // generic CASE WHEN bucketing under implicit grouping — conditions
      // reuse the WHERE boolean grammar, branches evaluate in order
      """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) RETURN " +
          "CASE WHEN c.acctbal < 0 THEN 'neg' WHEN c.acctbal < 5000 " +
          "THEN 'mid' ELSE 'high' END AS bucket, count(*) AS n")
    },

    q("q_cypher_expr_scalar",
      // RETURN value expressions: scalar functions (toUpper, size) and
      // arithmetic over properties — per-row, no aggregation
      """SELECT c_name AS cust, upper(n_name) AS nat,
        |       CAST(length(c_name) AS BIGINT) AS name_len,
        |       c_acctbal - 5000 AS rebal
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c_acctbal >= 9000""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) WHERE c.acctbal >= 9000 " +
          "RETURN c.name AS cust, toUpper(n.name) AS nat, " +
          "size(c.name) AS name_len, c.acctbal - 5000 AS rebal")
    },

    q("q_cypher_expr_agg",
      // aggregates over expressions with an EXPRESSION group key —
      // sum(r.quantity * (10 - r.linenumber)) mixes an edge prop with
      // arithmetic (quantity is integral, so the double sum is exact on
      // both engines); the key p.size % 3 groups computed values
      """SELECT CAST(p_size % 3 AS INT) AS szmod,
        |       sum(l_quantity * (10 - l_linenumber)) AS wq,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p_size <= 20
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (o:order)-[r:contains]->(p:part) WHERE p.size <= 20 " +
          "RETURN p.size % 3 AS szmod, " +
          "sum(r.quantity * (10 - r.linenumber)) AS wq, count(*) AS n")
    },

    q("q_cypher_agg",
      // RETURN aggregations with openCypher implicit grouping: the
      // non-aggregated item (s.name) is the group key; count/sum/min over
      // node props and max over the bound relationship's edge prop. sum of
      // INTs stays integer-exact on both engines (DuckDB sums to HUGEINT →
      // cast BIGINT to match Spark's LongType)
      """SELECT s.s_name AS sup, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(p.p_size) AS BIGINT) AS total_size,
        |       min(p.p_retailprice) AS cheapest, max(l.l_quantity) AS maxq
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_size <= 10
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part)-[r:supplied_by]->(s:supplier) WHERE p.size <= 10 " +
          "RETURN s.name AS sup, count(*) AS n, sum(p.size) AS total_size, " +
          "min(p.retailprice) AS cheapest, max(r.quantity) AS maxq")
    },

    q("q_cypher_with",
      // the aggregate-then-filter idiom (openCypher WITH … WHERE — SQL's
      // HAVING): nations with under 3 suppliers, via OPTIONAL MATCH +
      // count(bare var) so zero-supplier nations survive with n_sup = 0
      """SELECT n.n_name AS nation, CAST(count(s.s_suppkey) AS BIGINT) AS n_sup
        |FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1 HAVING count(s.s_suppkey) < 3""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (n:nation) OPTIONAL MATCH (s:supplier)-[:in_nation]->(n) " +
          "WITH n, count(s) AS n_sup WHERE n_sup < 3 " +
          "RETURN n.name AS nation, n_sup")
    },

    q("q_cypher_string_preds",
      // STARTS WITH / ENDS WITH / CONTAINS with boolean-grammar precedence
      """SELECT p_name AS pname, p_type AS ptype FROM part
        |WHERE (p_name LIKE 'large%' OR p_name LIKE '%bolt')
        |  AND p_type LIKE '%ECO%'""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part) " +
          "WHERE (p.name STARTS WITH 'large' OR p.name ENDS WITH 'bolt') " +
          "AND p.type CONTAINS 'ECO' " +
          "RETURN p.name AS pname, p.type AS ptype")
    },

    q("q_cypher_prop_compare",
      // property-to-property comparison across variables (the rhs is a
      // column reference, not a literal)
      """SELECT p.p_name AS pname, s.s_name AS sname
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_retailprice > s.s_acctbal AND p.p_size = 2""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part)-[:supplied_by]->(s:supplier) " +
          "WHERE p.retailprice > s.acctbal AND p.size = 2 " +
          "RETURN p.name AS pname, s.name AS sname")
    },

    q("q_cypher_distinct_agg",
      // DISTINCT inside aggregates under implicit grouping: count (r12) +
      // the r15 sum/avg(DISTINCT) forms (aggregate the distinct value
      // SET; avg = exact sum/count over it; rounded — distinct-set
      // accumulation order is engine-specific in the last bits)
      """SELECT o.o_orderpriority AS pri,
        |       CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS nseg,
        |       round(sum(DISTINCT c.c_acctbal), 2) AS sbal,
        |       round(sum(DISTINCT c.c_acctbal) / count(DISTINCT c.c_acctbal), 4) AS abal
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "RETURN o.orderpriority AS pri, " +
          "count(DISTINCT c.mktsegment) AS nseg, " +
          "round(sum(DISTINCT c.acctbal), 2) AS sbal, " +
          "round(avg(DISTINCT c.acctbal), 4) AS abal")
    },

    q("q_cypher_return_distinct",
      // RETURN DISTINCT over a many-to-one pattern
      """SELECT DISTINCT n.n_name AS nation
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.c_acctbal >= 0""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) " +
          "WHERE NOT c.acctbal < 0 " +
          "RETURN DISTINCT n.name AS nation")
    },

    q("q_cypher_varlen_edgefilter",
      // variable-length + edge-property predicate interaction: the rel-var
      // conjunct pushes into the edge SCAN before expansion (ALL-hop
      // semantics, openCypher's all(x IN r WHERE …)). count(*) observes
      // multiplicity → the PER-PATH plan fires (r13): the oracle unrolls
      // the 2-hop window over the PRE-FILTERED edge multiset with a
      // content-key inequality enforcing relationship-uniqueness — the
      // same identity rule the engine's keyed edge view applies
      """WITH f AS (SELECT 'part:' || CAST(l_partkey AS VARCHAR) AS src,
        |                  'supplier:' || CAST(l_suppkey AS VARCHAR) AS dst,
        |                  'part:' || CAST(l_partkey AS VARCHAR) || '|' ||
        |                  'supplier:' || CAST(l_suppkey AS VARCHAR) || '|' ||
        |                  CAST(l_quantity AS VARCHAR) AS k
        |           FROM lineitem WHERE l_quantity > 49),
        |bidir AS (SELECT src, dst, k FROM f
        |          UNION ALL SELECT dst, src, k FROM f),
        |l0 AS (SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS a
        |       FROM part WHERE p_size = 1),
        |p1 AS (SELECT l.a, b.dst AS x, b.k AS k1
        |       FROM l0 l JOIN bidir b ON b.src = l.a),
        |p2 AS (SELECT p.a, b.dst AS x
        |       FROM p1 p JOIN bidir b ON b.src = p.x AND b.k <> p.k1),
        |paths AS (SELECT a, x FROM p1 UNION ALL SELECT a, x FROM p2),
        |hits AS (SELECT z.a FROM paths z
        |         JOIN part pp ON z.x = 'part:' || CAST(pp.p_partkey AS VARCHAR))
        |SELECT p.p_name AS pname, CAST(count(*) AS BIGINT) AS n
        |FROM hits h JOIN part p ON h.a = 'part:' || CAST(p.p_partkey AS VARCHAR)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part)-[r:supplied_by*1..2]-(x:part) " +
          "WHERE p.size = 1 AND r.quantity > 49 " +
          "RETURN p.name AS pname, count(*) AS n")
    },

    q("q_cypher_varlen_paths",
      // the r12 verdict's #1 ask: count(*) over a variable-length pattern
      // counts PATHS with relationship-uniqueness (openCypher), not
      // distinct endpoint pairs — exercised over supplied_by's PARALLEL
      // edges (distinct lineitems between one part and one supplier each
      // contribute a path; a 2-hop path may return to the start part
      // through a DIFFERENT parallel edge, never the same one). Oracle =
      // unrolled joins over the edge multiset with the content-key
      // inequality (identical-content parallels share a key on both sides)
      """WITH f AS (SELECT 'part:' || CAST(l_partkey AS VARCHAR) AS src,
        |                  'supplier:' || CAST(l_suppkey AS VARCHAR) AS dst,
        |                  'part:' || CAST(l_partkey AS VARCHAR) || '|' ||
        |                  'supplier:' || CAST(l_suppkey AS VARCHAR) || '|' ||
        |                  CAST(l_quantity AS VARCHAR) AS k
        |           FROM lineitem),
        |bidir AS (SELECT src, dst, k FROM f
        |          UNION ALL SELECT dst, src, k FROM f),
        |l0 AS (SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS a
        |       FROM part WHERE p_size = 1),
        |p1 AS (SELECT l.a, b.dst AS x, b.k AS k1
        |       FROM l0 l JOIN bidir b ON b.src = l.a),
        |p2 AS (SELECT p.a, b.dst AS x
        |       FROM p1 p JOIN bidir b ON b.src = p.x AND b.k <> p.k1),
        |paths AS (SELECT a, x FROM p1 UNION ALL SELECT a, x FROM p2)
        |SELECT p.p_name AS pname, CAST(count(*) AS BIGINT) AS n_paths
        |FROM paths z JOIN part p ON z.a = 'part:' || CAST(p.p_partkey AS VARCHAR)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part)-[:supplied_by*1..2]-(x) WHERE p.size = 1 " +
          "RETURN p.name AS pname, count(*) AS n_paths")
    },

    q("q_cypher_path_nodes",
      // plain NAMED path projection (r12 ask #2): `p =` binds the path,
      // RETURN p renders the vertex sequence, length(p) the hop count —
      // one row per relationship-unique path; oracle = the unrolled path
      // strings over the keyed bidirectional in_nation view
      """WITH edges AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS src,
        |                      'nation:' || CAST(c_nationkey AS VARCHAR) AS dst
        |               FROM customer
        |               UNION ALL
        |               SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
        |                      'nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier),
        |f AS (SELECT src, dst, src || '|' || dst AS k FROM edges),
        |bi AS (SELECT src, dst, k FROM f UNION ALL SELECT dst, src, k FROM f),
        |l0 AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS a
        |       FROM customer WHERE c_name = 'Customer#000000001'),
        |p1 AS (SELECT l.a, b.dst AS x, b.k AS k1, l.a || '->' || b.dst AS path
        |       FROM l0 l JOIN bi b ON b.src = l.a),
        |p2 AS (SELECT p.a, b.dst AS x, p.path || '->' || b.dst AS path
        |       FROM p1 p JOIN bi b ON b.src = p.x AND b.k <> p.k1),
        |paths AS (SELECT x, path, 1 AS len FROM p1
        |          UNION ALL SELECT x, path, 2 FROM p2)
        |SELECT path, CAST(len AS BIGINT) AS len
        |FROM paths JOIN supplier s
        |  ON x = 'supplier:' || CAST(s_suppkey AS VARCHAR)""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH p = (c:customer)-[:in_nation*1..2]-(x:supplier) " +
          "WHERE c.name = 'Customer#000000001' " +
          "RETURN p AS path, length(p) AS len")
    },

    q("q_cypher_allshortest",
      // allShortestPaths() (r12 ask #2): EVERY min-hop path per endpoint
      // pair — len 2 = same-nation suppliers (one path each), len 3 =
      // co-trade suppliers with one path per (order, part) route,
      // multiplicities included. Oracle = the recursive walk CTE: walks at
      // a vertex's min depth ARE exactly its shortest paths (a shorter
      // cut would contradict minimality)
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT src, dst FROM edges
         |        UNION ALL SELECT dst, src FROM edges),
         |w(x, d) AS (
         |  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 0
         |  FROM customer WHERE c_name = 'Customer#000000001'
         |  UNION ALL
         |  SELECT a.dst, w.d + 1 FROM w JOIN adj a ON a.src = w.x
         |  WHERE w.d < 3),
         |md AS (SELECT x, min(d) AS len FROM w GROUP BY 1),
         |sp AS (SELECT w.x, w.d FROM w JOIN md ON md.x = w.x AND md.len = w.d),
         |hits AS (SELECT sp.x AS sup, sp.d AS len FROM sp
         |         JOIN supplier s ON sp.x = 'supplier:' || CAST(s_suppkey AS VARCHAR))
         |SELECT sup, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM hits GROUP BY 1, 2""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH p = allShortestPaths((c:customer)-[*..3]-(s:supplier)) " +
          "WHERE c.name = 'Customer#000000001' " +
          "RETURN s AS sup, length(p) AS len, count(*) AS n_paths")
    },

    q("q_cypher_create",
      // Cypher WRITE surface (r12 ask #6), mutate-then-read: CREATE a node
      // batch (explicit ids — the TPC-H projection's key columns aren't
      // node properties), then read it back through the normal read path.
      // The mutation is an immutable batch union — the cached graph is
      // untouched (no cross-query contamination)
      """SELECT name, bal
        |FROM (VALUES ('CYPHER_A', 12.5), ('CYPHER_B', -3.5)) t(name, bal)""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "CREATE (v:customer {id: 'customer:900001', name: 'CYPHER_A', " +
          "acctbal: 12.5, mktsegment: 'GRAFT_TEST'}), " +
          "(w:customer {id: 'customer:900002', name: 'CYPHER_B', " +
          "acctbal: -3.5, mktsegment: 'GRAFT_TEST'})")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) WHERE c.mktsegment = 'GRAFT_TEST' " +
          "RETURN c.name AS name, c.acctbal AS bal")
    },

    q("q_cypher_merge",
      // MERGE, node form (match-by-id-else-create): merged twice — the
      // second statement re-merges an existing row (no-op) and adds one —
      // so the read-back proves idempotency; oracle = the final VALUES set
      """SELECT name FROM (VALUES ('MERGE_A'), ('MERGE_B')) t(name)""") { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MERGE (v:customer {id: 'customer:910001', name: 'MERGE_A', " +
          "mktsegment: 'GRAFT_MERGE'})")
      val g2 = graft.api.CypherLite.evalWrite(g1,
        "MERGE (v:customer {id: 'customer:910001', name: 'MERGE_A', " +
          "mktsegment: 'GRAFT_MERGE'}), " +
          "(w:customer {id: 'customer:910002', name: 'MERGE_B', " +
          "mktsegment: 'GRAFT_MERGE'})")
      graft.api.CypherLite.eval(g2,
        "MATCH (c:customer) WHERE c.mktsegment = 'GRAFT_MERGE' " +
          "RETURN c.name AS name")
    },

    q("q_cypher_set",
      // MATCH … SET: a column update over the matched id set (one semi
      // join + conditional rewrite, never per-row mutation) — oracled by
      // the CASE twin of the update
      """SELECT CASE WHEN c_acctbal < 0 THEN 'DEBT' ELSE c_mktsegment END AS seg,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (c:customer) WHERE c.acctbal < 0 SET c.mktsegment = 'DEBT'")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) RETURN c.mktsegment AS seg, count(*) AS n")
    },

    q("q_cypher_delete",
      // MATCH … DETACH DELETE: the vertex set and every incident edge go
      // (two anti joins); reading the supplier→nation adjacency afterwards
      // equals the oracle's filtered join
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_sup
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name <> 'NATION_3'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (n:nation) WHERE n.name = 'NATION_3' DETACH DELETE n")
      graft.api.CypherLite.eval(g1,
        "MATCH (s:supplier)-[:in_nation]->(n:nation) " +
          "RETURN n.name AS nation, count(*) AS n_sup")
    },

    q("q_gremlin_sack",
      // sack() from script text (r12 ask #5): per-walk weight accumulation
      // as a carried column — order:1's lineitem quantities plus the
      // supplied_by quantities of each part's suppliers, one sum per
      // 2-hop walk; single additions, so doubles are exact on both sides
      """SELECT CAST(l1.l_quantity + l2.l_quantity AS DOUBLE) AS sack
        |FROM lineitem l1 JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey
        |WHERE l1.l_orderkey = 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.withSack(0).V('order:1').outE('contains').sack(sum).by('quantity')" +
          ".inV().outE('supplied_by').sack(sum).by('quantity').inV().sack()")
    },

    q("q_gremlin_aggregate",
      // aggregate('x') snapshot + cap('x'): the named side-effect
      // collection emitted as ONE sorted list (csv-serialized — arrays
      // don't survive the driver's comparator); the traversal continues
      // past the snapshot (out step) without disturbing it
      """SELECT array_to_string(list_sort(list(n_name)), ',') AS x
        |FROM nation""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('nation').aggregate('x').by('name')" +
          ".out('in_region').cap('x')")
        .select(array_join(col("x"), ",").as("x"))
    },

    q("q_gremlin_tree",
      // tree() from script text: the traversal tree of customer:1's
      // order→part walks, serialized as its path-prefix set (root, each
      // order branch, each order→part leaf — the tree's node set)
      """SELECT 'customer:1' AS branch
        |UNION
        |SELECT DISTINCT 'customer:1->order:' || CAST(o_orderkey AS VARCHAR)
        |FROM orders WHERE o_custkey = 1
        |UNION
        |SELECT DISTINCT 'customer:1->order:' || CAST(l.l_orderkey AS VARCHAR)
        |       || '->part:' || CAST(l.l_partkey AS VARCHAR)
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_custkey = 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.withPath('customer:1').out('placed').out('contains').tree()")
    },

    q("q_cypher_type",
      // type(r) over an UNLABELED relationship variable: the edge label is
      // carried like any edge property (a `<r>_label` rider) and grouped —
      // customers below the balance cut have one in_nation edge each plus
      // one placed edge per order
      """WITH f AS (SELECT c_custkey FROM customer WHERE c_acctbal < 100)
        |SELECT 'in_nation' AS t, CAST(count(*) AS BIGINT) AS n FROM f
        |UNION ALL
        |SELECT 'placed', CAST(count(*) AS BIGINT)
        |FROM orders o JOIN f ON f.c_custkey = o.o_custkey""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[r]->(x) WHERE c.acctbal < 100 " +
          "RETURN type(r) AS t, count(*) AS n")
    },

    q("q_gremlin_emit_until",
      // repeat(out()).emit().until(hasLabel('part')): every traverser is
      // emitted each round it survives, parts exit the loop — from
      // customer:1 that is round 1 (its nation + every placed order) plus
      // round 2 (the nation's region + one part per lineitem, multiplicity
      // preserved); round 3 is empty (region has no out-edges, parts
      // exited) so the loop drains
      """SELECT 'nation:' || CAST(c_nationkey AS VARCHAR) AS id
        |FROM customer WHERE c_custkey = 1
        |UNION ALL
        |SELECT 'order:' || CAST(o_orderkey AS VARCHAR)
        |FROM orders WHERE o_custkey = 1
        |UNION ALL
        |SELECT 'region:' || CAST(n_regionkey AS VARCHAR)
        |FROM nation JOIN customer ON n_nationkey = c_nationkey
        |WHERE c_custkey = 1
        |UNION ALL
        |SELECT 'part:' || CAST(l_partkey AS VARCHAR)
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE o_custkey = 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').repeat(out()).emit().until(hasLabel('part')).id()")
    },

    q("q_cypher_casts",
      // toInteger/toFloat/toString conversions: toInteger truncates toward
      // zero (DuckDB CAST rounds — trunc() on the oracle side keeps the
      // openCypher contract), toString over an integral size is
      // format-stable on both engines
      """SELECT CAST(trunc(c_acctbal) AS BIGINT) AS i,
        |       CAST(length(c_name) AS VARCHAR) AS s,
        |       c_acctbal AS f
        |FROM customer WHERE c_acctbal > 9900""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) WHERE c.acctbal > 9900 " +
          "RETURN toInteger(c.acctbal) AS i, toString(size(c.name)) AS s, " +
          "toFloat(c.acctbal) AS f")
    },

    q("q_cypher_case_simple",
      // the simple CASE <expr> WHEN <val> form (r13) — compiles to
      // subject-equality branches on the generic CASE machinery
      """SELECT CASE n_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one'
        |       ELSE 'rest' END AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM nation GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (n:nation)-[:in_region]->(r:region) " +
          "RETURN CASE r WHEN 'region:0' THEN 'zero' WHEN 'region:1' " +
          "THEN 'one' ELSE 'rest' END AS bucket, count(*) AS n")
    },

    q("q_cypher_labels",
      // labels(n) over an UNLABELED start node: in_nation sources are
      // customers AND suppliers — the label list (a singleton under the
      // closed single-label schema) is the implicit group key,
      // csv-serialized for the comparator
      """SELECT 'customer' AS lbls, CAST(count(*) AS BIGINT) AS n FROM customer
        |UNION ALL
        |SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (a)-[:in_nation]->(n:nation) " +
          "RETURN labels(a) AS lbls, count(*) AS n")
        .select(array_join(col("lbls"), ",").as("lbls"), col("n"))
    },

    q("q_cypher_orderby_expr",
      // ORDER BY value EXPRESSIONS (r12 ask #8): a function key over a
      // non-returned property (size(n.name)) and an arithmetic key
      // (acctbal * -1) — both compiled by the shared value-expression
      // compiler in the ORDER BY position; cust is the unique tiebreak
      """SELECT cust, nation FROM (
        |  SELECT c.c_name AS cust, n.n_name AS nation
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  ORDER BY length(n.n_name) ASC, c.c_acctbal * -1 ASC, cust ASC
        |  LIMIT 25) z""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) " +
          "RETURN c.name AS cust, n.name AS nation " +
          "ORDER BY size(n.name) ASC, c.acctbal * -1 ASC, cust ASC LIMIT 25")
    },

    q("q_cypher_multiseg_unique",
      // cross-segment relationship uniqueness (r13 ask #7): both segments
      // bind in_nation edges, so the threaded used-edge set excludes the
      // out-and-back on one edge — per nation the customer pairs are
      // c·(c−1), not the walk reading's c²
      """SELECT n_name AS nation, CAST(c * (c - 1) AS BIGINT) AS n
        |FROM (SELECT n_name, count(*) AS c
        |      FROM customer JOIN nation ON n_nationkey = c_nationkey
        |      GROUP BY 1) z""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (a:customer)-[:in_nation]->(n:nation)<-[:in_nation]-(b:customer) " +
          "RETURN n.name AS nation, count(*) AS n")
    },

    q("q_cypher_relationships",
      // relationships(p) — the per-hop relationship list rendered from the
      // path plan's vertex array + segment label, csv-serialized for the
      // comparator
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) ||
        |       '-[placed]-order:' || CAST(o_orderkey AS VARCHAR) AS rels
        |FROM orders JOIN customer ON c_custkey = o_custkey
        |WHERE c_name = 'Customer#000000001'""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH p = (c:customer)-[:placed*1..2]->(o) " +
          "WHERE c.name = 'Customer#000000001' " +
          "RETURN relationships(p) AS rels")
        .select(array_join(col("rels"), ",").as("rels"))
    },

    q("q_cypher_union",
      // query-level UNION (r13 ask #4): two complete bodies, set
      // semantics (terminal distinct) — customers and suppliers of one
      // nation as one name column
      """SELECT c_name AS name
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE n.n_name = 'NATION_1'
        |UNION
        |SELECT s_name
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name = 'NATION_1'""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:in_nation]->(n:nation) " +
          "WHERE n.name = 'NATION_1' RETURN c.name AS name " +
          "UNION MATCH (x:supplier)-[:in_nation]->(n:nation) " +
          "WHERE n.name = 'NATION_1' RETURN x.name AS name")
    },

    q("q_cypher_union_all",
      // UNION ALL preserves multiplicity — one row per placed order plus
      // one per supplier, both sides sharing the grouped-count shape
      """SELECT 'order' AS kind, CAST(count(*) AS BIGINT) AS n FROM orders
        |UNION ALL
        |SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o) RETURN 'order' AS kind, " +
          "count(*) AS n " +
          "UNION ALL MATCH (x:supplier)-[:in_nation]->(nn:nation) " +
          "RETURN 'supplier' AS kind, count(*) AS n")
    },

    q("q_gremlin_branch",
      // branch(sel).option(v, sub).option(none, sub) from script text (r13
      // ask #6): NATION_3 hops to its region, every other nation stays —
      // per-element routing on the choose/union machinery
      """SELECT 'region:' || CAST(n_regionkey AS VARCHAR) AS id
        |FROM nation WHERE n_name = 'NATION_3'
        |UNION ALL
        |SELECT 'nation:' || CAST(n_nationkey AS VARCHAR)
        |FROM nation WHERE n_name <> 'NATION_3'""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('nation').branch(values('name'))" +
          ".option('NATION_3', out('in_region')).option(none, identity()).id()")
    },

    q("q_gremlin_local",
      // local(outE.limit(2)) — the per-element window (row_number ≤ 2 per
      // customer over the deterministic content order), NOT a global
      // limit; traversal continues to the order vertex
      """SELECT id FROM (
        |  SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS id,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY 'order:' || CAST(o_orderkey AS VARCHAR)) AS rn
        |  FROM orders) z WHERE rn <= 2""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').local(outE('placed').limit(2)).inV().id()")
    },

    q("q_gremlin_local_count",
      // local(out.count()) — one count per element, zeros included (the
      // local-count contract; a bare count() would collapse to one row)
      """SELECT CAST(coalesce(z.cnt, 0) AS BIGINT) AS n
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) z
        |ON z.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').local(out('placed').count())")
    },

    q("q_gremlin_math",
      // math('a / 2 + b') with round-robin by() modulators over the two
      // bindings — compiled to native Columns by the shared
      // value-expression compiler, one row per placed edge
      """SELECT c_acctbal / 2 + o_totalprice AS value
        |FROM customer JOIN orders ON o_custkey = c_custkey""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').as('a').out('placed').as('b')" +
          ".math('a / 2 + b').by('acctbal').by('totalprice')")
    },

    q("q_cypher_merge_rel",
      // relationship MERGE (r13 ask #2), mutate-then-read idempotency
      // proof: the first merge CREATES the endpoint supplier (node-form
      // MERGE) and the edge with the ON CREATE quantity; the second
      // matches the (src, label, dst) key and ON MATCH re-sets the
      // quantity — one edge row, the matched value
      """SELECT 'part:1' AS pid, CAST(99 AS DOUBLE) AS qty""") { (s, d) =>
      val stmt = "MERGE (p:part {id: 'part:1'})-[r:supplied_by]->" +
        "(s:supplier {id: 'supplier:930001', name: 'MR_S'}) " +
        "ON CREATE SET r.quantity = 77 ON MATCH SET r.quantity = 99"
      val g1 = graft.api.CypherLite.evalWrite(g(s, d), stmt)
      val g2 = graft.api.CypherLite.evalWrite(g1, stmt)
      graft.api.CypherLite.eval(g2,
        "MATCH (p:part)-[r:supplied_by]->(x:supplier) " +
          "WHERE x.name = 'MR_S' RETURN p AS pid, r.quantity AS qty")
    },

    q("q_gremlin_addv",
      // Gremlin write surface (r13 ask #1), mutate-then-read: addV node
      // batch through the script frontend (explicit ids — the TPC-H
      // projection's key columns aren't node properties), read back via a
      // script projection. Immutable batches — the cached graph untouched.
      """SELECT name, bal
        |FROM (VALUES ('GADD_A', 11.5), ('GADD_B', -2.5)) t(name, bal)""".stripMargin) { (s, d) =>
      val g1 = graft.api.GremlinLite.evalWrite(g(s, d),
        "g.addV('customer').property('id', 'customer:920001')" +
          ".property('name', 'GADD_A').property('acctbal', 11.5)" +
          ".property('mktsegment', 'GRAFT_GADD')" +
          ".addV('customer').property('id', 'customer:920002')" +
          ".property('name', 'GADD_B').property('acctbal', -2.5)" +
          ".property('mktsegment', 'GRAFT_GADD')")
      graft.api.GremlinLite.eval(g1,
        "g.V().hasLabel('customer').has('mktsegment', 'GRAFT_GADD')" +
          ".project('name', 'acctbal')")
        .withColumnRenamed("acctbal", "bal")
    },

    q("q_gremlin_adde",
      // addE (single form): a new supplied_by edge with a quantity
      // property appended to part:1's edge list (MULTIPLE frequency),
      // read back as the part's outgoing quantities
      """SELECT l_quantity AS quantity FROM lineitem WHERE l_partkey = 1
        |UNION ALL SELECT CAST(42 AS DOUBLE)""".stripMargin) { (s, d) =>
      val g1 = graft.api.GremlinLite.evalWrite(g(s, d),
        "g.addE('supplied_by').from(V('part:1')).to('supplier:1')" +
          ".property('quantity', 42)")
      graft.api.GremlinLite.eval(g1,
        "g.V('part:1').outE('supplied_by').values('quantity')")
    },

    q("q_gremlin_drop",
      // drop() on a vertex position: DETACH semantics (vertex + incident
      // edges, three anti joins — the q_cypher_delete twin through the
      // Gremlin frontend); reading the supplier→nation adjacency
      // afterwards equals the oracle's filtered join
      """SELECT n_name AS name, CAST(count(*) AS BIGINT) AS n
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name <> 'NATION_3'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val g1 = graft.api.GremlinLite.evalWrite(g(s, d),
        "g.V().hasLabel('nation').has('name', 'NATION_3').drop()")
      graft.api.GremlinLite.eval(g1,
        "g.V().hasLabel('supplier').out('in_nation').groupCount('name')")
    },

    q("q_gremlin_drop_edges",
      // drop() on an edge position (stored orientation): customer:1's
      // placed edges go, the order vertices stay — the remaining placed
      // edge count is every other customer's
      """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        |WHERE o_custkey <> 1""".stripMargin) { (s, d) =>
      val g1 = graft.api.GremlinLite.evalWrite(g(s, d),
        "g.V('customer:1').outE('placed').drop()")
      graft.api.GremlinLite.eval(g1, "g.E('placed').count()")
    },

    q("q_gremlin_path_by",
      // path().by(prop) rendering (TinkerPop path modulator): every
      // supplier's 1-hop path to its nation, rendered by name — one row
      // per traverser, explode+join+regroup (the ~path rider keeps ids
      // for simplePath identity)
      """SELECT s_name || '->' || n_name AS path
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey""".stripMargin) {
      (s, d) =>
        graft.api.GremlinLite.eval(g(s, d),
          "g.withPath().hasLabel('supplier').out('in_nation').path().by('name')")
    },

    q("q_gremlin_is_count",
      // is(P) on a produced value frame + count() tail (TinkerPop IsTest):
      // values(k).is(gt(x)).count()
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE c_acctbal > 9000""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('customer').values('acctbal').is(gt(9000)).count()")
    },

    q("q_gremlin_properties",
      // properties(k…): flattened (id, key, value) rows, absent props
      // dropped — the property-object surface of PropertiesTest
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS id,
        |       'name' AS key, n_name AS value FROM nation""".stripMargin) {
      (s, d) =>
        graft.api.GremlinLite.eval(g(s, d),
          "g.V().hasLabel('nation').properties('name')")
    },

    q("q_gremlin_inject",
      // inject(ids…): literal elements join the stream before the hop
      """SELECT n_name AS name, CAST(count(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_custkey IN (1, 2) GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').inject('customer:2').out('in_nation')" +
          ".groupCount('name')")
    },

    q("q_gremlin_loops",
      // loops() exit counter (TinkerPop loop-counter step): pure
      // until(loops().is(2)) — every traverser exits after round 2, so
      // customer:1's 2-hop walk frontier: nation→region (1) and
      // order→part (one per lineitem of its orders, walk multiplicity)
      """WITH o1 AS (SELECT o_orderkey FROM orders WHERE o_custkey = 1),
        |l1 AS (SELECT l_partkey FROM lineitem JOIN o1 ON l_orderkey = o_orderkey)
        |SELECT 'region' AS label, CAST(1 AS BIGINT) AS n
        |UNION ALL SELECT 'part', count(*) FROM l1""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').repeat(out()).until(loops().is(2)).groupCount('label')")
    },

    q("q_gremlin_loops_or",
      // the escape-hatch idiom until(hasLabel(...).or().loops().is(n)):
      // the region traverser exits at round 2 via the property condition,
      // everything else runs to the loops() cap — parts take one more hop
      // to suppliers (per supplied_by edge, walk multiplicity)
      """WITH o1 AS (SELECT o_orderkey FROM orders WHERE o_custkey = 1),
        |l1 AS (SELECT l_partkey FROM lineitem JOIN o1 ON l_orderkey = o_orderkey),
        |s3 AS (SELECT l2.l_suppkey FROM l1 JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey)
        |SELECT 'region' AS label, CAST(1 AS BIGINT) AS n
        |UNION ALL SELECT 'supplier', count(*) FROM s3""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V('customer:1').repeat(out())" +
          ".until(hasLabel('region').or().loops().is(3)).groupCount('label')")
    },

    q("q_gremlin_elementmap",
      // elementMap(keys…): TinkerPop's id+label+properties projection
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS id,
        |       'nation' AS label, n_name AS name FROM nation""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.V().hasLabel('nation').elementMap('name')")
    },

    q("q_gremlin_property_update",
      // mid-traversal property(k, v) as the UPDATE it is in TinkerPop
      // (Cardinality.single): negative-balance customers get a segment
      // tag and a zeroed balance, one batch column update; read back via
      // the tag
      """SELECT c_name AS name, CAST(0 AS DOUBLE) AS acctbal
        |FROM customer WHERE c_acctbal < 0""".stripMargin) { (s, d) =>
      val g1 = graft.api.GremlinLite.evalWrite(g(s, d),
        "g.V().hasLabel('customer').has('acctbal', lt(0))" +
          ".property('mktsegment', 'DELINQUENT').property('acctbal', 0)")
      graft.api.GremlinLite.eval(g1,
        "g.V().hasLabel('customer').has('mktsegment', 'DELINQUENT')" +
          ".project('name', 'acctbal')")
    },

    q("q_cypher_remove",
      // REMOVE v.prop — openCypher property removal as a batch null-out
      // of the matched rows' cells; read back by IS NULL
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE c_acctbal < 0""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (c:customer) WHERE c.acctbal < 0 REMOVE c.mktsegment")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) WHERE c.mktsegment IS NULL RETURN count(*) AS n")
    },

    q("q_cypher_set_multi",
      // multi-assignment SET with openCypher item sequencing: the second
      // assignment reads the FIRST one's update (name becomes '0.0', the
      // already-zeroed balance), while the match itself never re-runs
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE c_acctbal < 0""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (c:customer) WHERE c.acctbal < 0 " +
          "SET c.acctbal = 0, c.name = toString(c.acctbal)")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) WHERE c.name = '0.0' RETURN count(*) AS n")
    },

    q("q_cypher_string_funcs",
      // openCypher string function surface — substring is 0-BASED (vs
      // DuckDB's 1-based substr), replace is literal; split() is
      // array-valued (driver comparator takes no arrays) so its second
      // element is projected via size()+substring composition in
      // CypherLiteSpec instead
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id,
        |       substr(c_name, 10) AS tail, left(c_name, 8) AS head,
        |       right(c_name, 3) AS sfx, reverse(c_mktsegment) AS rev,
        |       replace(c_name, 'Customer#', 'C') AS cname,
        |       lower(trim(c_mktsegment)) AS seg
        |FROM customer""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) RETURN c AS id, substring(c.name, 9) AS tail, " +
          "left(c.name, 8) AS head, right(c.name, 3) AS sfx, " +
          "reverse(c.mktsegment) AS rev, " +
          "replace(c.name, 'Customer#', 'C') AS cname, " +
          "toLower(trim(c.mktsegment)) AS seg")
    },

    q("q_cypher_exists",
      // EXISTS { MATCH … WHERE … } subquery (modern openCypher
      // existential form) — lowered to the same LEFT SEMI join as a bare
      // pattern predicate, the inner WHERE filtering the chain first;
      // never a row multiplier (a customer with many qualifying orders
      // appears once)
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer
        |WHERE c_acctbal > 9000 AND EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) {
      (s, d) =>
        graft.api.CypherLite.eval(g(s, d),
          "MATCH (c:customer) WHERE c.acctbal > 9000 AND EXISTS " +
            "{ MATCH (c)-[:placed]->(o:order) WHERE o.totalprice > 300000 } " +
            "RETURN c AS id")
    },

    q("q_cypher_not_exists",
      // NOT EXISTS { … } → LEFT ANTI join
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, d) =>
        graft.api.CypherLite.eval(g(s, d),
          "MATCH (c:customer) WHERE NOT EXISTS " +
            "{ MATCH (c)-[:placed]->(:order) } RETURN count(*) AS n")
    },

    q("q_cypher_exists_edgeprop",
      // a relationship variable inside the subquery: the edge-property
      // conjunct rides the chain as `r_quantity` and Catalyst pushes it
      // into the edge scan before the semi join
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n
        |FROM lineitem WHERE l_quantity > 49""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (p:part) WHERE EXISTS " +
          "{ MATCH (p)-[r:supplied_by]->(:supplier) WHERE r.quantity > 49 } " +
          "RETURN count(*) AS n")
    },

    q("q_cypher_count_sub",
      // COUNT { … } subquery conjunct (GQL count subquery): customers
      // with 20+ orders over 100k — groupBy-count + LEFT join (zero
      // counts included) + comparison filter, never a row multiplier
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id
        |FROM customer
        |WHERE 20 <= (SELECT count(*) FROM orders
        |             WHERE o_custkey = c_custkey AND o_totalprice > 100000)""".stripMargin) {
      (s, d) =>
        graft.api.CypherLite.eval(g(s, d),
          "MATCH (c:customer) WHERE " +
            "COUNT { MATCH (c)-[:placed]->(o:order) WHERE o.totalprice > 100000 } >= 20 " +
            "RETURN c AS id")
    },

    q("q_cypher_return_star",
      // RETURN * — expands to the declared node variables in declaration
      // order (rel/path variables have no scalar binding and are omitted)
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS c,
        |       'order:' || CAST(o_orderkey AS VARCHAR) AS o
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_acctbal > 9900""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) WHERE c.acctbal > 9900 " +
          "RETURN *")
    },

    q("q_cypher_regex",
      // `=~` regex operator — openCypher WHOLE-string semantics (DuckDB's
      // regexp_full_match twin); rlike is find(), so the compile anchors
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE regexp_full_match(c_name, 'Customer#0+1[0-9]{2}')""".stripMargin) {
      (s, d) =>
        graft.api.CypherLite.eval(g(s, d),
          "MATCH (c:customer) WHERE c.name =~ 'Customer#0+1[0-9]{2}' " +
            "RETURN count(*) AS n")
    },

    q("q_cypher_in_list",
      // literal-list membership: `ref IN [...]` → scan-pushable isin(),
      // NOT IN via NOT; grouped to keep the row set small
      """SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) WHERE c.mktsegment IN ['BUILDING', 'MACHINERY'] " +
          "AND c.acctbal > 0 RETURN c.mktsegment AS seg, count(*) AS n")
    },

    q("q_cypher_math_funcs",
      // openCypher math function surface — floor/ceil return FLOAT, sign
      // returns INTEGER (both per the openCypher type contracts)
      """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id,
        |       round(sqrt(abs(c_acctbal)), 6) AS sq,
        |       floor(c_acctbal) AS fl, ceil(c_acctbal) AS ce,
        |       CAST(sign(c_acctbal) AS BIGINT) AS sg,
        |       round(exp(c_acctbal / 10000), 6) AS ex,
        |       round(log10(abs(c_acctbal) + 1), 6) AS lg,
        |       round(c_acctbal, 1) AS r1
        |FROM customer""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) RETURN c AS id, " +
          "round(sqrt(abs(c.acctbal)), 6) AS sq, floor(c.acctbal) AS fl, " +
          "ceil(c.acctbal) AS ce, sign(c.acctbal) AS sg, " +
          "round(exp(c.acctbal / 10000), 6) AS ex, " +
          "round(log10(abs(c.acctbal) + 1), 6) AS lg, " +
          "round(c.acctbal, 1) AS r1")
    },

    q("q_cypher_listcomp",
      // list comprehension `[x IN xs WHERE p | e]` over a collect()ed
      // alias → Spark higher-order filter/transform (codegen'd lambdas,
      // no UDF, no explode-regroup shuffle); head() of the filtered
      // SORTED collect = the filtered min (r14 verdict ask #1)
      """SELECT c.c_name AS cust,
        |  CAST(count(*) FILTER (WHERE o.o_totalprice > 150000) AS BIGINT)
        |    AS n_big,
        |  min(o.o_totalprice) FILTER (WHERE o.o_totalprice > 150000)
        |    AS min_big
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c.name AS cust, collect(o.totalprice) AS ps " +
          "RETURN cust, size([p IN ps WHERE p > 150000]) AS n_big, " +
          "head([p IN ps WHERE p > 150000 | p + 0]) AS min_big")
    },

    q("q_cypher_trig_funcs",
      // openCypher trig/conversion surface (r15): sin/atan2/pi/degrees,
      // toBoolean (non-boolean strings → NULL), tail() list length —
      // all codegen'd column expressions, rounded (libm last bits)
      """SELECT n_name AS nm,
        |  round(sin(n_nationkey / 25.0), 6) AS s,
        |  round(degrees(atan2(1.0, n_nationkey + 1.0)), 4) AS dg,
        |  round(pi(), 6) AS p,
        |  CAST(len(string_split(n_name, 'A')) - 1 AS BIGINT) AS nt,
        |  (n_nationkey % 2 = 0) AS tb
        |FROM nation""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (n:nation) RETURN n.name AS nm, " +
          "round(sin(toFloat(last(split(id(n), ':'))) / 25), 6) AS s, " +
          "round(degrees(atan2(1.0, toFloat(last(split(id(n), ':'))) + 1)), 4) AS dg, " +
          "round(pi(), 6) AS p, " +
          "size(tail(split(n.name, 'A'))) AS nt, " +
          "toBoolean(CASE WHEN toInteger(last(split(id(n), ':'))) % 2 = 0 " +
          "THEN 'true' ELSE 'false' END) AS tb")
    },

    q("q_cypher_in_expr",
      // `x IN <list expression>` membership beyond literal lists / bare
      // aliases (r15): range() here — compiles to array_contains over the
      // computed array, evaluated per row in codegen
      """SELECT r_name AS reg, CAST(count(*) AS BIGINT) AS n
        |FROM nation JOIN region ON r_regionkey = n_regionkey
        |WHERE n_nationkey % 4 = 0 GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (n:nation)-[:in_region]->(r:region) " +
          "WHERE toInteger(last(split(id(n), ':'))) IN range(0, 24, 4) " +
          "RETURN r.name AS reg, count(*) AS n")
    },

    q("q_cypher_node_label_alt",
      // (n:a|b) node label alternation (Neo4j 5 syntax): one isin filter
      // on the label column — same scan-filter plan as a single label
      """SELECT lbl, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'customer' AS lbl FROM customer WHERE c_acctbal > 5000
        |  UNION ALL
        |  SELECT 'supplier' AS lbl FROM supplier WHERE s_acctbal > 5000)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (x:customer|supplier) WHERE x.acctbal > 5000 " +
          "RETURN head(labels(x)) AS lbl, count(*) AS n")
    },

    q("q_cypher_label_alt",
      // -[:a|b]-> label alternation (openCypher): one isin-style label
      // filter on the edge scan — the same pushdown plan as a single
      // label; type(r) carries the per-row matched label
      """SELECT label AS lbl, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'in_nation' AS label FROM customer
        |  UNION ALL
        |  SELECT 'placed' AS label FROM orders)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[r:in_nation|placed]->(x) " +
          "RETURN type(r) AS lbl, count(*) AS n")
    },

    q("q_cypher_stats_agg",
      // openCypher statistics aggregates: stDev (sample) / stDevP
      // (population) → codegen'd stddev; percentileCont → Spark's EXACT
      // percentile (sort-based, not the approx sketch); percentileDisc →
      // the element at 1-based rank ceil(p·n) of the sorted values
      // (explicit list construction on BOTH sides — engines' quantile_disc
      // conventions differ). Rounded: deviation/interpolation accumulation
      // order is engine-specific in the last bits.
      """SELECT c_mktsegment AS seg,
        |  round(stddev_samp(c_acctbal), 4) AS sd,
        |  round(stddev_pop(c_acctbal), 4) AS sdp,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
        |  list_sort(list(c_acctbal))[greatest(CAST(ceil(0.9 * count(*)) AS BIGINT), 1)] AS p90d
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) RETURN c.mktsegment AS seg, " +
          "round(stDev(c.acctbal), 4) AS sd, " +
          "round(stDevP(c.acctbal), 4) AS sdp, " +
          "round(percentileCont(c.acctbal, 0.5), 4) AS p50, " +
          "percentileDisc(c.acctbal, 0.9) AS p90d")
    },

    q("q_cypher_quantifiers",
      // any/all/none/single(x IN list WHERE pred) — openCypher quantified
      // list predicates over a collect()ed alias → Spark higher-order
      // exists/forall/filter (codegen'd lambdas, no explode shuffle);
      // also exercised as a standalone WHERE conjunct (the `none` cut)
      """SELECT cust, has_big, all_1k, one_300k FROM (
        |  SELECT c.c_name AS cust,
        |    count(*) FILTER (WHERE o.o_totalprice > 150000) > 0 AS has_big,
        |    count(*) FILTER (WHERE NOT o.o_totalprice > 1000) = 0 AS all_1k,
        |    count(*) FILTER (WHERE o.o_totalprice > 300000) = 1 AS one_300k,
        |    count(*) FILTER (WHERE o.o_totalprice > 400000) = 0 AS none_huge
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1) WHERE none_huge""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c.name AS cust, collect(o.totalprice) AS ps " +
          "WHERE none(x IN ps WHERE x > 400000) " +
          "RETURN cust, any(x IN ps WHERE x > 150000) AS has_big, " +
          "all(x IN ps WHERE x > 1000) AS all_1k, " +
          "single(x IN ps WHERE x > 300000) AS one_300k")
    },

    q("q_cypher_reduce",
      // reduce() left fold → Spark higher-order aggregate; the CASE-max
      // fold is fp-exact (no accumulation), the counter fold is integral
      // (r14 verdict ask #1)
      """SELECT c.c_name AS cust, max(o.o_totalprice) AS max_p,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c.name AS cust, collect(o.totalprice) AS ps " +
          "RETURN cust, " +
          "reduce(m = 0.0, p IN ps | CASE WHEN p > m THEN p ELSE m END) " +
          "AS max_p, reduce(c = 0, p IN ps | c + 1) AS n_orders")
    },

    q("q_cypher_range",
      // range(start, end[, step]) → guarded sequence(): INCLUSIVE end,
      // EMPTY when unreachable (nationkey 0 → range(1, 0) → []); the
      // triangular-number fold checks the data-dependent end bound
      """SELECT n_name AS nm,
        |  CAST(n_nationkey * (n_nationkey + 1) / 2 AS BIGINT) AS tri,
        |  CAST(7 AS BIGINT) AS n7
        |FROM nation""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (n:nation) RETURN n.name AS nm, " +
          "reduce(s = 0, x IN range(1, toInteger(last(split(id(n), ':')))) " +
          "| s + x) AS tri, size(range(0, 20, 3)) AS n7")
    },

    q("q_cypher_call_subquery",
      // CALL { WITH c MATCH … RETURN aggs } — the returning subquery
      // (r14 verdict ask #7): evaluated ONCE as a set grouped by the
      // import, LEFT-joined back (count 0 / max NULL on empty groups —
      // openCypher's empty-aggregation row), never per-row invocation
      """SELECT c.c_name AS cust,
        |  CAST(coalesce(z.n, 0) AS BIGINT) AS n_orders,
        |  z.mx AS max_p
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n, max(o_totalprice) AS mx
        |  FROM orders GROUP BY 1) z ON z.o_custkey = c.c_custkey"""
        .stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer) " +
          "CALL { WITH c MATCH (c)-[:placed]->(o:order) " +
          "RETURN count(*) AS n_orders, max(o.totalprice) AS max_p } " +
          "RETURN c.name AS cust, n_orders, max_p")
    },

    q("q_cypher_with_star",
      // WITH * (carry every visible binding) + a further MATCH block —
      // the star expands to the stage's bindings at parse time, so the
      // plan is identical to the explicit listing (r14 verdict ask #9)
      """SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_big
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_totalprice > 300000
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH * WHERE o.totalprice > 300000 " +
          "MATCH (c)-[:in_nation]->(n:nation) " +
          "RETURN n.name AS nation, count(*) AS n_big")
    },

    q("q_gremlin_subgraph",
      // subgraph('k') script step (reference ProcessBasicSuite.java:177):
      // the edge-filtered traversal's edges collect into the named graph;
      // cap emits the induced edge list — filter pushed to the edge scan
      """SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
        |       'contains' AS label,
        |       'part:' || CAST(l_partkey AS VARCHAR) AS dst
        |FROM lineitem WHERE l_quantity > 45""".stripMargin) { (s, d) =>
      graft.api.GremlinLite.eval(g(s, d),
        "g.E('contains').has('quantity', gt(45)).subgraph('sg').cap('sg')")
    },

    q("q_cypher_merge_oncreate",
      // node-form MERGE with ON CREATE SET / ON MATCH SET (r14 verdict
      // ask #3): merged twice — the first creates (ON CREATE path), the
      // second matches (ON MATCH path); the read-back proves both setter
      // paths landed
      """SELECT name, seg FROM (VALUES ('OC_A', 'OC_MATCHED')) t(name, seg)""") {
      (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MERGE (v:customer {id: 'customer:920001', name: 'OC_A'}) " +
          "ON CREATE SET v.mktsegment = 'OC_CREATED' " +
          "ON MATCH SET v.mktsegment = 'OC_WRONG'")
      val g2 = graft.api.CypherLite.evalWrite(g1,
        "MERGE (v:customer {id: 'customer:920001', name: 'OC_A'}) " +
          "ON CREATE SET v.mktsegment = 'OC_WRONG' " +
          "ON MATCH SET v.mktsegment = 'OC_MATCHED'")
      graft.api.CypherLite.eval(g2,
        "MATCH (c:customer) WHERE c.name = 'OC_A' " +
          "RETURN c.name AS name, c.mktsegment AS seg")
    },

    q("q_cypher_set_map",
      // SET v += {map} — openCypher map-merge update lowered onto the
      // multi-assignment column update (r14 verdict ask #4); oracle = the
      // CASE twin of the update
      """SELECT CASE WHEN c_acctbal < 0 THEN 'DEBT2' ELSE c_mktsegment END
        |         AS seg,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END) AS mn
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (c:customer) WHERE c.acctbal < 0 " +
          "SET c += {mktsegment: 'DEBT2', acctbal: 0}")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) RETURN c.mktsegment AS seg, count(*) AS n, " +
          "min(c.acctbal) AS mn")
    },

    q("q_cypher_foreach",
      // FOREACH (x IN <collected alias> | SET …) — explode the alias back
      // to rows + ONE batch column update (r14 verdict ask #4), never a
      // per-element loop; oracle = the direct filter twin
      """SELECT CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 300000""".stripMargin) { (s, d) =>
      val g1 = graft.api.CypherLite.evalWrite(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WHERE o.totalprice > 300000 WITH collect(c) AS heavy " +
          "FOREACH (x IN heavy | SET x.mktsegment = 'WHALE')")
      graft.api.CypherLite.eval(g1,
        "MATCH (c:customer) WHERE c.mktsegment = 'WHALE' " +
          "RETURN count(*) AS n")
    },

    q("q_cypher_in_alias",
      // `'lit' IN alias` — membership in a collect()ed list via
      // array_contains (r14 verdict ask #1: IN over a collected alias;
      // the literal-list form stays the pushable isin)
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_f
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE o.o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      graft.api.CypherLite.eval(g(s, d),
        "MATCH (c:customer)-[:placed]->(o:order) " +
          "WITH c, collect(o.orderstatus) AS sts WHERE 'F' IN sts " +
          "RETURN count(*) AS n_f")
    })
}
