package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.olap.{Algorithms, Centrality, Louvain}
import graft.traverse.PathTraversals
import graft.traverse.PathTraversals.TemplateStep
import QueryDef._
import GraphSql._

/** OLAP completion: betweenness/stress (Brandes sweep), Louvain, subgraph
  * stats, customized crosspoints, weighted s→t distance. */
object OlapQueries2 {

  private def g(s: SparkSession, d: String) = TpchGraph.cached(s, d)

  private def nationRegionVerts(s: SparkSession, d: String): DataFrame =
    g(s, d).vertices.filter(col("label").isin("nation", "region")).select(col("id"))
  private def nationRegionEdges(s: SparkSession, d: String): DataFrame =
    g(s, d).outEdges.filter(col("label") === "in_region").select(col("src"), col("dst"))

  /** Full SQL restatement of olap.Louvain (same recurrence, same gating,
    * same double arithmetic — gains are bit-equal so tie-breaks agree). */
  def louvainSql(rounds: Int, passes: Int): String = {
    def passSql(p: Int): String = {
      val roundsSql = (0 until rounds).map { r =>
        val gate = if (r % 2 == 0) "v.nc < o.lbl" else "v.nc > o.lbl"
        s"""tot_${p}_$r AS MATERIALIZED (
           |  SELECT c.lbl, sum(k.k) AS tot FROM c_${p}_$r c JOIN k_$p k ON k.id = c.id GROUP BY c.lbl),
           |v2c_${p}_$r AS MATERIALIZED (
           |  SELECT a.src AS id, c.lbl AS nc, sum(a.w) AS w_vc
           |  FROM adj_$p a JOIN c_${p}_$r c ON c.id = a.dst GROUP BY a.src, c.lbl),
           |cand_${p}_$r AS (
           |  SELECT v.id, v.nc,
           |         v.w_vc - k.k * (CASE WHEN v.nc = o.lbl THEN t.tot - k.k ELSE t.tot END) / m.m2 AS gain
           |  FROM v2c_${p}_$r v
           |  JOIN c_${p}_$r o ON o.id = v.id
           |  JOIN k_$p k ON k.id = v.id
           |  JOIN tot_${p}_$r t ON t.lbl = v.nc
           |  CROSS JOIN m2_$p m
           |  WHERE v.nc = o.lbl OR $gate),
           |c_${p}_${r + 1} AS MATERIALIZED (
           |  SELECT id, nc AS lbl FROM (
           |    SELECT id, nc, row_number() OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
           |    FROM cand_${p}_$r)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      // zero-weight self-loops mirror Louvain.localMoves: every vertex keeps
      // its own community as a candidate (isolated vertex = singleton)
      s"""adj_$p AS MATERIALIZED (SELECT src, dst, w FROM e_$p UNION ALL SELECT dst, src, w FROM e_$p
         |  UNION ALL SELECT id, id, CAST(0.0 AS DOUBLE) FROM verts_$p),
         |k_$p AS MATERIALIZED (SELECT src AS id, sum(w) AS k FROM adj_$p GROUP BY src),
         |m2_$p AS (SELECT 2.0 * sum(w) AS m2 FROM e_$p),
         |c_${p}_0 AS (SELECT id, id AS lbl FROM verts_$p),
         |$roundsSql""".stripMargin
    }
    val coarsenSql = (1 until passes).map { p =>
      s"""e_$p AS MATERIALIZED (
         |  SELECT least(ca.lbl, cb.lbl) AS src, greatest(ca.lbl, cb.lbl) AS dst, sum(e.w) AS w
         |  FROM e_${p - 1} e JOIN c_${p - 1}_$rounds ca ON ca.id = e.src
         |  JOIN c_${p - 1}_$rounds cb ON cb.id = e.dst GROUP BY 1, 2),
         |verts_$p AS (SELECT DISTINCT lbl AS id FROM c_${p - 1}_$rounds),
         |${passSql(p)}""".stripMargin
    }.mkString(",\n")
    val mappingJoins = (1 until passes).map(p =>
      s"JOIN c_${p}_$rounds m$p ON m$p.id = m${p - 1}.lbl").mkString(" ")
    s"""WITH pairs AS MATERIALIZED (${OlapQueries.coSupplierSql}),
       |e_0 AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM pairs),
       |verts_0 AS (SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) AS id FROM supplier),
       |${passSql(0)},
       |$coarsenSql
       |SELECT m0.id, m${passes - 1}.lbl AS community
       |FROM c_0_$rounds m0 $mappingJoins""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    q("q_betweenness_stress",
      // nation–region forest: shortest paths are the unique simple paths, so
      // betweenness == stress == #pairs whose path passes through v
      """WITH RECURSIVE e2 AS (
        |  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS src,
        |         'region:' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation),
        |adj AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
        |verts AS (SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS id FROM nation
        |          UNION ALL SELECT 'region:' || CAST(r_regionkey AS VARCHAR) FROM region),
        |p(root, id, path) AS (
        |  SELECT id, id, [id] FROM verts
        |  UNION ALL
        |  SELECT p.root, a.dst, p.path || [a.dst] FROM p JOIN adj a ON a.src = p.id
        |  WHERE NOT list_contains(p.path, a.dst)),
        |pairs AS (SELECT path FROM p WHERE root < id),
        |interior AS (SELECT unnest(list_slice(path, 2, len(path) - 1)) AS id FROM pairs),
        |counts AS (SELECT id, count(*) AS c FROM interior GROUP BY id)
        |SELECT v.id, round(CAST(coalesce(c.c, 0) AS DOUBLE), 9) AS betweenness,
        |       CAST(coalesce(c.c, 0) AS BIGINT) AS stress
        |FROM verts v LEFT JOIN counts c ON c.id = v.id""".stripMargin) { (s, d) =>
      Centrality.betweennessStress(nationRegionVerts(s, d), nationRegionEdges(s, d),
        maxDepth = 6)
    },

    q("q_louvain", louvainSql(rounds = 4, passes = 2)) { (s, d) =>
      // deterministic synchronous Louvain (directional gating) — exactly
      // reproducible, so even this gets a full SQL oracle; clique-fixture
      // semantics in CentralitySpec
      // same pinned co-purchase projection as the lpa/kcore/eigenvector
      // family — one shared derived graph, not a per-query rebuild
      val edges = OlapQueries.coSupplierEdges(s, d)
      val verts = Tables.supplier(s, d)
        .select(concat(lit("supplier:"), col("s_suppkey").cast("string")).as("id"))
      Louvain.louvain(verts, edges, localRounds = 4, passes = 2)
    },

    q("q_subgraph_stat",
      """WITH RECURSIVE e2 AS (
        |  SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS src,
        |         'nation:' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
        |  UNION ALL
        |  SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
        |         'nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier
        |  UNION ALL
        |  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR),
        |         'region:' || CAST(n_regionkey AS VARCHAR) FROM nation),
        |verts AS (SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS id FROM region
        |  UNION ALL SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
        |  UNION ALL SELECT 'customer:' || CAST(c_custkey AS VARCHAR) FROM customer
        |  UNION ALL SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) FROM supplier),
        |adj AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
        |reach(a, b) AS (
        |  SELECT id, id FROM verts
        |  UNION
        |  SELECT r.a, adj.dst FROM reach r JOIN adj ON adj.src = r.b),
        |comp AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a),
        |deg AS (SELECT src AS id, count(*) AS dg FROM adj GROUP BY src)
        |SELECT CAST((SELECT count(*) FROM verts) AS BIGINT) AS n_vertices,
        |       CAST((SELECT count(*) FROM e2) AS BIGINT) AS n_edges,
        |       CAST((SELECT count(DISTINCT component) FROM comp) AS BIGINT) AS n_components,
        |       CAST((SELECT max(dg) FROM deg) AS BIGINT) AS max_degree""".stripMargin) { (s, d) =>
      // stats bundle over a subgraph (reference SubgraphStatAlgorithm)
      val graph = g(s, d)
      val verts = graph.vertices
        .filter(col("label").isin("region", "nation", "customer", "supplier"))
        .select(col("id")).localCheckpoint(true)
      val edges = graph.outEdges
        .filter(col("label").isin("in_nation", "in_region"))
        .select(col("src"), col("dst")).localCheckpoint(true)
      val nV = verts.count(); val nE = edges.count()
      val nC = Algorithms.wcc(verts, edges).agg(countDistinct(col("component"))).head().getLong(0)
      val maxDeg = edges.select(col("src")).union(edges.select(col("dst")))
        .groupBy(col("src")).agg(count(lit(1)).as("dg"))
        .agg(max(col("dg"))).head().getLong(0)
      val spark = s; import spark.implicits._
      Seq((nV, nE, nC, maxDeg)).toDF("n_vertices", "n_edges", "n_components", "max_degree")
    },

    q("q_customized_crosspoints",
      // customers 0 and 3 share ≥1 part at every SF (1/2 never do), so the
      // intersection gate carries real rows
      """SELECT id FROM (
        |  SELECT DISTINCT 'part:' || CAST(l.l_partkey AS VARCHAR) AS id
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey = 0
        |  INTERSECT
        |  SELECT DISTINCT 'part:' || CAST(l.l_partkey AS VARCHAR)
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey = 3)""".stripMargin) { (s, d) =>
      // crosspoints over multiple path patterns (reference
      // CustomizedCrosspointsTraverser): terminal-id intersection of the
      // per-pattern template walks
      val steps = Seq(
        TemplateStep(EdgeStep(Direction.OUT, Seq("placed"))),
        TemplateStep(EdgeStep(Direction.OUT, Seq("contains"))))
      def terminals(src: String): DataFrame =
        PathTraversals.templatePaths(g(s, d), Seq(src), steps)
          .select(element_at(split(col("path"), "->"), -1).as("id")).distinct()
      terminals("customer:0").intersect(terminals("customer:3"))
    },

    q("q_weighted_path",
      s"""SELECT dist FROM (${GraphQueries2.weightedSsspSql(4)}) WHERE id = 'supplier:3'""") { (s, d) =>
      // weighted s→t distance (reference weightedShortestPath) — the SSSP
      // frontier filtered at the target
      PathTraversals.weightedSssp(g(s, d), "customer:1", Direction.BOTH, Nil,
        weightCol = "quantity", rounds = 4)
        .filter(col("id") === "supplier:3").select(col("dist"))
    },

    q("q_weighted_path_pruned",
      // BIT-EQUAL to q_weighted_path by contract: the landmark upper bound
      // only prunes vertices provably off every shorter s→t path (ALT-style
      // goal bounding over the warmup-built weighted landmark index)
      s"""SELECT dist FROM (${GraphQueries2.weightedSsspSql(4)}) WHERE id = 'supplier:3'""") { (s, d) =>
      PathTraversals.weightedPathPruned(g(s, d), "customer:1", "supplier:3",
        Direction.BOTH, Nil, weightCol = "quantity", rounds = 4,
        landmarks = Seq("nation:1", "nation:7", "nation:13"))
    },

    q("q_seeded_lpa",
      {
        val rounds = (0 until 3).map { r =>
          s"""freq$r AS MATERIALIZED (
             |  SELECT a.dst AS id, l.lbl, count(*) AS n
             |  FROM l$r l JOIN adj a ON a.src = l.id
             |  WHERE l.lbl IS NOT NULL GROUP BY a.dst, l.lbl),
             |pick$r AS (SELECT id, lbl FROM (
             |  SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY n DESC, lbl ASC) AS rn
             |  FROM freq$r) z$r WHERE rn = 1),
             |l${r + 1} AS MATERIALIZED (
             |  SELECT v.id, coalesce(s.lbl, p.lbl, l.lbl) AS lbl
             |  FROM verts v LEFT JOIN seeds s ON s.id = v.id
             |               LEFT JOIN pick$r p ON p.id = v.id
             |               LEFT JOIN l$r l ON l.id = v.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS MATERIALIZED ($edgesSql),
           |adj AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
           |seeds AS (SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS id,
           |                 'region:' || CAST(r_regionkey AS VARCHAR) AS lbl FROM region),
           |verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM adj
           |                       UNION SELECT id FROM seeds),
           |l0 AS (SELECT v.id, s.lbl FROM verts v LEFT JOIN seeds s ON s.id = v.id),
           |$rounds
           |SELECT id, lbl FROM l3 WHERE lbl IS NOT NULL""".stripMargin
      }) { (s, d) =>
      // semi-supervised label spreading: region ids are the clamped seed
      // classes; 3 rounds classify everything within 3 hops of a region
      val graph = g(s, d)
      val seeds = graph.verticesOf("region")
        .select(col("id"), col("id").as("lbl"))
      Algorithms.seededLpa(graph.vertices.select(col("id")),
        graft.traverse.Traversals.multiplicityView(graph, EdgeStep(Direction.BOTH)),
        seeds, iterations = 3)
    },

    q("q_influence_spread",
      {
        def d4(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5(src || '>' || dst), $i, 1)) - 1)"
        val h16 = s"(${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})"
        s"""WITH RECURSIVE edges AS ($edgesSql),
           |adj AS (SELECT DISTINCT src, dst FROM edges),
           |live AS (SELECT src, dst FROM adj WHERE $h16 < 19660),
           |bfs(id, dist) AS (
           |  SELECT v, CAST(0 AS BIGINT)
           |  FROM (VALUES ('customer:1'), ('customer:2'), ('customer:3'),
           |               ('customer:4'), ('customer:5')) s(v)
           |  UNION
           |  SELECT l.dst, b.dist + 1 FROM bfs b JOIN live l ON l.src = b.id
           |  WHERE b.dist < 4)
           |SELECT id, CAST(min(dist) AS BIGINT) AS dist
           |FROM bfs GROUP BY id""".stripMargin
      }) { (s, d) =>
      // independent-cascade influence spread (Kempe-Kleinberg-Tardos 2003)
      // with a DETERMINISTIC md5 coin per edge (p ≈ 0.3): each edge is
      // live iff its 16-bit hash clears the threshold — the same
      // seeded-choice contract as guidedWalks, so the cascade reproduces
      // exactly in the oracle and across runs. One BFS over the live
      // subgraph; the coin filter is a narrow codegen'd predicate on the
      // session-pinned adjacency.
      import s.implicits._
      val live = graft.traverse.Traversals.adjacencyView(g(s, d), Direction.OUT)
        .filter(graft.ops.Packing.hash16(
          concat(col("src"), lit(">"), col("dst"))) < 19660)
      val seeds = (1 to 5).map(i => s"customer:$i").toDF("id")
      Algorithms.multiSourceBfsAdj(seeds, live, maxDepth = 4)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
    },

    q("q_degree_histogram",
      // log2-binned degree distribution — the subgraph_stat degree summary
      // at publication shape. Bin = ⌊log2 deg⌋ computed from the BINARY
      // STRING length (integer-exact; fp log2 of a power of two rounds
      // differently across engines)
      s"""WITH edges AS ($edgesSql),
         |be AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
         |deg AS (SELECT src AS id, count(*) AS deg FROM be GROUP BY src)
         |SELECT CAST(length(printf('%b', deg)) - 1 AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n_vertices,
         |       CAST(min(deg) AS BIGINT) AS min_deg,
         |       CAST(max(deg) AS BIGINT) AS max_deg
         |FROM deg GROUP BY bin""".stripMargin) { (s, d) =>
      g(s, d).degrees(Direction.BOTH)
        .groupBy((length(bin(col("degree"))) - 1).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_vertices"),
          min(col("degree")).as("min_deg"), max(col("degree")).as("max_deg"))
    },

    q("q_hits",
      {
        val iters = (1 to 2).map { i =>
          s"""as$i AS MATERIALIZED (SELECT a.dst AS id, sum(h.h) AS s
             |  FROM h${i - 1} h JOIN adj a ON a.src = h.id GROUP BY a.dst),
             |a$i AS MATERIALIZED (SELECT v.id, coalesce(s.s, 0) AS a
             |  FROM verts v LEFT JOIN as$i s ON s.id = v.id),
             |hs$i AS MATERIALIZED (SELECT a.src AS id, sum(x.a) AS s
             |  FROM a$i x JOIN adj a ON a.dst = x.id GROUP BY a.src),
             |h$i AS MATERIALIZED (SELECT v.id, coalesce(s.s, 0) AS h
             |  FROM verts v LEFT JOIN hs$i s ON s.id = v.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS MATERIALIZED ($edgesSql),
           |adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
           |verts AS MATERIALIZED (SELECT DISTINCT id FROM
           |  (SELECT src AS id FROM adj UNION ALL SELECT dst FROM adj) z),
           |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM verts),
           |$iters
           |SELECT h2.id, round(h2.h / (SELECT sum(h) FROM h2), 9) AS hub,
           |       round(a2.a / (SELECT sum(a) FROM a2), 9) AS auth
           |FROM h2 JOIN a2 ON a2.id = h2.id""".stripMargin
      }) { (s, d) =>
      // HITS over the directed TPC-H graph (customers/orders hub toward
      // part/supplier authorities); the adjacency is the warmup-pinned
      // distinct OUT view, vertices = its endpoints (both sides identical)
      val adj = graft.traverse.Traversals.adjacencyView(g(s, d), Direction.OUT)
      val verts = adj.select(col("src").as("id"))
        .union(adj.select(col("dst").as("id"))).distinct()
      Algorithms.hits(verts, adj, iterations = 2)
    },

    q("q_eccentricity",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) z),
         |bfs(root, id, dist) AS (
         |  SELECT v, v, CAST(0 AS BIGINT)
         |  FROM (VALUES ('customer:1'), ('supplier:3'), ('part:7')) s(v)
         |  UNION
         |  SELECT b.root, a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
         |  WHERE b.dist < 5),
         |d AS (SELECT root, id, min(dist) AS dist FROM bfs GROUP BY root, id)
         |SELECT root AS id, CAST(max(dist) AS BIGINT) AS ecc,
         |       CAST(count(*) - 1 AS BIGINT) AS n_reached
         |FROM d GROUP BY root""".stripMargin) { (s, d) =>
      // sampled eccentricity / diameter lower bound from 3 probe vertices
      // over the session-pinned BOTH adjacency
      import s.implicits._
      Algorithms.eccentricity(
        Seq("customer:1", "supplier:3", "part:7").toDF("id"),
        graft.traverse.Traversals.adjacencyView(g(s, d), Direction.BOTH),
        maxDepth = 5)
    },

    // landmark distance index (Potamias et al. 2009): one bitmask BFS wave
    // from 3 landmarks builds the distance vectors; each queried pair then
    // costs two lookups + a 3-term min — no per-query traversal
    q("q_landmark_distance",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) z),
         |bfs(root, id, dist) AS (
         |  SELECT v, v, CAST(0 AS BIGINT)
         |  FROM (VALUES ('nation:1'), ('nation:7'), ('nation:13')) s(v)
         |  UNION
         |  SELECT b.root, a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
         |  WHERE b.dist < 4),
         |d AS (SELECT root AS landmark, id, min(dist) AS dist
         |      FROM bfs GROUP BY root, id),
         |pairs AS (SELECT 'customer:' || CAST(c AS VARCHAR) AS a,
         |                 'supplier:' || CAST(s AS VARCHAR) AS b
         |          FROM (VALUES (1), (2), (3)) x(c), (VALUES (1), (2), (3)) y(s))
         |SELECT p.a, p.b, CAST(min(da.dist + db.dist) AS BIGINT) AS dist_ub
         |FROM pairs p
         |JOIN d da ON da.id = p.a JOIN d db ON db.landmark = da.landmark AND db.id = p.b
         |GROUP BY p.a, p.b""".stripMargin,
      bench = true) { (s, d) =>
      import s.implicits._
      val pairs = (for (c <- 1 to 3; su <- 1 to 3)
        yield (s"customer:$c", s"supplier:$su")).toDF("a", "b")
      Algorithms.landmarkDistances(pairs,
        Seq("nation:1", "nation:7", "nation:13"),
        graft.traverse.Traversals.adjacencyView(g(s, d), Direction.BOTH),
        maxDepth = 4)
    },

    q("q_landmark_weighted", {
      // weighted landmark index: 4 delta-relaxation rounds (distributed
      // Bellman-Ford, all 3 landmarks in one wave) over the same weighted
      // edge view the SSSP point queries plan against; pair queries probe
      // two index rows per landmark and take the triangle-inequality min
      val iters = (0 until 4).map { i =>
        s"""d${i + 1} AS MATERIALIZED (
           |  SELECT landmark, id, min(dist) AS dist FROM (
           |    SELECT landmark, id, dist FROM d$i
           |    UNION ALL
           |    SELECT d.landmark, w.dst AS id, d.dist + w.w AS dist
           |    FROM d$i d JOIN wedges w ON w.src = d.id) GROUP BY landmark, id)"""
          .stripMargin
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
         |d0 AS (SELECT v AS landmark, v AS id, CAST(0.0 AS DOUBLE) AS dist
         |       FROM (VALUES ('nation:1'), ('nation:7'), ('nation:13')) s(v)),
         |$iters,
         |idx AS (SELECT landmark, id, round(dist, 6) AS dist FROM d4),
         |pairs AS (SELECT 'customer:' || CAST(c AS VARCHAR) AS a,
         |                 'supplier:' || CAST(s AS VARCHAR) AS b
         |          FROM (VALUES (1), (2), (3)) x(c), (VALUES (1), (2), (3)) y(s))
         |SELECT p.a, p.b, min(da.dist + db.dist) AS dist_ub
         |FROM pairs p
         |JOIN idx da ON da.id = p.a
         |JOIN idx db ON db.landmark = da.landmark AND db.id = p.b
         |GROUP BY p.a, p.b""".stripMargin
    }, bench = true) { (s, d) =>
      import s.implicits._
      val pairs = (for (c <- 1 to 3; su <- 1 to 3)
        yield (s"customer:$c", s"supplier:$su")).toDF("a", "b")
      Algorithms.weightedLandmarkDistances(pairs,
        Seq("nation:1", "nation:7", "nation:13"),
        graft.traverse.PathTraversals.weightedEdgeView(
          g(s, d), graft.core.Direction.BOTH, Nil, "quantity"),
        rounds = 4)
    },

    q("q_item_cf",
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |freq AS (SELECT i, count(*) AS n FROM bi GROUP BY i),
        |pairs AS (SELECT l.i AS ia, r.i AS ib, count(*) AS n_ab
        |          FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i GROUP BY 1, 2),
        |sym AS (SELECT ia, ib, n_ab FROM pairs
        |        UNION ALL SELECT ib, ia, n_ab FROM pairs),
        |sc AS (SELECT sym.ia, sym.ib, n_ab, fa.n AS na, fb.n AS nb,
        |       n_ab / sqrt(CAST(fa.n AS DOUBLE) * fb.n) AS cos
        |       FROM sym JOIN freq fa ON fa.i = sym.ia JOIN freq fb ON fb.i = sym.ib)
        |SELECT ia, ib, CAST(n_ab AS BIGINT) AS n_ab, CAST(na AS BIGINT) AS na,
        |       CAST(nb AS BIGINT) AS nb, round(cos, 6) AS cos,
        |       CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY ia ORDER BY cos DESC, ib ASC) AS rank
        |      FROM sc) z
        |WHERE rank <= 5""".stripMargin, bench = true) { (s, d) =>
      // item-item co-purchase recommender over (order, part) baskets
      graft.ops.Search.itemItemCf(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", k = 5)
    },

    q("q_assortativity",
      s"""WITH edges AS ($edgesSql),
         |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
         |deg AS (SELECT src AS id, count(*) AS deg FROM sym GROUP BY src),
         |pairs AS (SELECT dx.deg AS dx, dy.deg AS dy
         |          FROM sym JOIN deg dx ON dx.id = sym.src
         |                   JOIN deg dy ON dy.id = sym.dst),
         |t AS (SELECT count(*) AS m,
         |  CAST(sum(CAST(dx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(dx * dy AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         |  CAST(sum(CAST(dx * dx AS DECIMAL(38,0))) AS DOUBLE) AS sxx
         |  FROM pairs)
         |-- the (u,v)/(v,u) pair stream is symmetric, so Σdy = Σdx and
         |-- Σdy² = Σdx²: Pearson reduces to (m·Σdxdy − (Σdx)²)/(m·Σdx² − (Σdx)²)
         |SELECT m, round((m * sxy - sx * sx) /
         |  (m * sxx - sx * sx), 6) + 0 AS assortativity
         |FROM t""".stripMargin) { (s, d) =>
      // Degree-mixing coefficient over the undirected view — the
      // subgraph_stat companion statistic (Newman 2002); exact decimal
      // sums make the Pearson double bit-identical to the oracle. The
      // symmetrized view is the warmup-pinned multiplicity adjacency.
      Algorithms.degreeAssortativity(
        graft.traverse.Traversals.multiplicityView(g(s, d), EdgeStep(Direction.BOTH)))
    })
}
