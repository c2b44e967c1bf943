package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.olap.Algorithms
import QueryDef._
import GraphSql._

/** SURVEY §2.13 OLAP job algorithms with DuckDB oracles. Iterative
  * algorithms are verified by unrolling the exact recurrence in SQL; floats
  * round to 9 decimals on both sides. */
object OlapQueries {

  private def g(s: SparkSession, d: String) = TpchGraph.cached(s, d)

  val vertsSql: String =
    """SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS id FROM region
      |UNION ALL SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
      |UNION ALL SELECT 'customer:' || CAST(c_custkey AS VARCHAR) FROM customer
      |UNION ALL SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) FROM supplier
      |UNION ALL SELECT 'part:' || CAST(p_partkey AS VARCHAR) FROM part
      |UNION ALL SELECT 'order:' || CAST(o_orderkey AS VARCHAR) FROM orders""".stripMargin

  /** Undirected supplier co-purchase graph: suppliers linked when they supply
    * a common part (restricted to p_partkey < 100 so the pair-join stays
    * bounded and the graph non-complete at bench SF — co-occurrence graphs
    * are quadratic in supplies per part). */
  val coSupplierSql: String =
    """SELECT DISTINCT
      |  least('supplier:' || CAST(a.l_suppkey AS VARCHAR), 'supplier:' || CAST(b.l_suppkey AS VARCHAR)) AS src,
      |  greatest('supplier:' || CAST(a.l_suppkey AS VARCHAR), 'supplier:' || CAST(b.l_suppkey AS VARCHAR)) AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
      |WHERE a.l_partkey < 100 AND b.l_partkey < 100""".stripMargin

  /** The co-purchase graph is DERIVED data shared by 8+ OLAP queries
    * (triangle/kcore/lpa/eigenvector/cluster-coefficient/louvain/
    * betweenness-family) — a deployment materializes it once beside the
    * source tables, so it goes through [[graft.core.Pin.pinDerived]]: the
    * quadratic pair-join runs once per session (in the Bench load phase)
    * and every consumer projects from the cached columnar frame. */
  private[graft] def coSupplierEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_partkey") < 100)
      .select(col("l_partkey"),
        concat(lit("supplier:"), col("l_suppkey").cast("string")).as("sup"))
    val a = li.withColumnRenamed("sup", "sa")
    val b = li.withColumnRenamed("sup", "sb")
    graft.core.Pin.pinDerived(Algorithms.canonical(
      a.join(b, Seq("l_partkey")).filter(col("sa") =!= col("sb"))
        .select(col("sa").as("src"), col("sb").as("dst"))))
  }

  private def supplierVerts(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .select(concat(lit("supplier:"), col("s_suppkey").cast("string")).as("id"))

  // ---------------------------------------------------------- SQL generators
  def pagerankSql(iters: Int, alpha: Double): String = {
    val a = java.lang.Double.toString(alpha)
    val oneMinus = java.lang.Double.toString(1.0 - alpha)
    val itersSql = (0 until iters).map { i =>
      s"""r${i + 1} AS (
         |  SELECT v.id, ($oneMinus / n.n) + $a * coalesce(c.s, 0) AS rank
         |  FROM verts v CROSS JOIN n LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.rank / o.deg) AS s
         |    FROM r$i r JOIN outdeg o ON o.id = r.id JOIN edges e ON e.src = r.id
         |    GROUP BY e.dst) c ON c.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |verts AS ($vertsSql),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
       |outdeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT id, 1.0 / n.n AS rank FROM verts CROSS JOIN n),
       |$itersSql
       |SELECT id, round(rank, 9) AS rank FROM r$iters""".stripMargin
  }

  def eigenvectorSql(iters: Int): String = {
    // normalization deferred to the end, mirroring Algorithms.eigenvector:
    // xₖ = Aᵏx₀ / ‖Aᵏx₀‖₁ — identical to per-round normalization, and the
    // pre-division values stay integer-valued doubles (exact) on both engines
    val itersSql = (0 until iters).map { i =>
      s"""s$i AS (SELECT a.dst AS id, sum(x.x) AS s FROM x$i x JOIN adj a ON a.src = x.id GROUP BY a.dst),
         |x${i + 1} AS (SELECT v.id, coalesce(s.s, 0) AS x
         |              FROM verts v LEFT JOIN s$i s ON s.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($coSupplierSql),
       |adj AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |verts AS (SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) AS id FROM supplier),
       |x0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS x FROM verts),
       |$itersSql
       |SELECT id, round(x / (SELECT sum(x) FROM x$iters), 9) AS x FROM x$iters""".stripMargin
  }

  def lpaSql(rounds: Int): String = {
    val itersSql = (0 until rounds).map { i =>
      s"""freq$i AS MATERIALIZED (
         |  SELECT a.dst AS id, l.lbl, count(*) AS n
         |  FROM l$i l JOIN adj a ON a.src = l.id GROUP BY a.dst, l.lbl),
         |pick$i AS (SELECT id, lbl FROM (
         |  SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY n DESC, lbl ASC) AS rn
         |  FROM freq$i) WHERE rn = 1),
         |l${i + 1} AS MATERIALIZED (
         |  SELECT v.id, coalesce(p.lbl, v.id) AS lbl
         |  FROM verts v LEFT JOIN pick$i p ON p.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED ($coSupplierSql),
       |adj AS MATERIALIZED (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |verts AS (SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) AS id FROM supplier),
       |l0 AS (SELECT id, id AS lbl FROM verts),
       |$itersSql
       |SELECT id, lbl FROM l$rounds""".stripMargin
  }

  def kcoreSql(k: Int, rounds: Int): String = {
    // every CTE MATERIALIZED: each round references the previous one twice —
    // inlined expansion would be exponential in `rounds`
    val itersSql = (0 until rounds).map { i =>
      s"""keep$i AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM e$i UNION ALL SELECT dst FROM e$i)
         |           GROUP BY id HAVING count(*) >= $k),
         |e${i + 1} AS MATERIALIZED (SELECT src, dst FROM e$i
         |              WHERE src IN (SELECT id FROM keep$i) AND dst IN (SELECT id FROM keep$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($coSupplierSql),
       |$itersSql
       |SELECT id, CAST(count(*) AS BIGINT) AS deg
       |FROM (SELECT src AS id FROM e$rounds UNION ALL SELECT dst FROM e$rounds)
       |GROUP BY id""".stripMargin
  }

  /** Coreness-tier oracle: max surviving probe per vertex, each probe an
    * independent unrolled peeling chain (results identical to the engine's
    * incremental nesting-based chain). */
  def corenessSql(ks: Seq[Int], rounds: Int): String =
    s"""SELECT id, CAST(max(tier) AS BIGINT) AS tier FROM (
       |${ks.map(k => s"SELECT DISTINCT id, $k AS tier FROM (${kcoreSql(k, rounds)}) zz$k")
            .mkString("\nUNION ALL\n")}
       |) u GROUP BY id""".stripMargin

  // ----------------------------------------------------------------- queries
  val defs: Seq[QueryDef] = Seq(

    q("q_degree_centrality",
      s"""WITH edges AS ($edgesSql),
         |be AS ($bothEdgesSql)
         |SELECT src AS id, CAST(count(*) AS BIGINT) AS degree FROM be GROUP BY src""".stripMargin,
      bench = true) { (s, d) =>
      Algorithms.degreeCentrality(g(s, d), Direction.BOTH)
    },

    q("q_count_vertex",
      """SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'region' AS label FROM region
        |  UNION ALL SELECT 'nation' FROM nation
        |  UNION ALL SELECT 'customer' FROM customer
        |  UNION ALL SELECT 'supplier' FROM supplier
        |  UNION ALL SELECT 'part' FROM part
        |  UNION ALL SELECT 'order' FROM orders) GROUP BY label""".stripMargin) { (s, d) =>
      Algorithms.countVertex(g(s, d))
    },

    q("q_count_edge",
      s"""WITH edges AS ($edgesSql)
         |SELECT label, CAST(count(*) AS BIGINT) AS n FROM edges GROUP BY label""".stripMargin) { (s, d) =>
      Algorithms.countEdge(g(s, d))
    },

    q("q_algorithm_pool",
      // §2.11 named algorithm dispatch (reference AlgorithmPool.java:42-73
      // / Algorithm.call): three algorithms looked up by job name and run
      // with string-keyed parameter maps, unioned into one (algo, key, n)
      // result — certifies the dispatch surface returns the same relations
      // as the direct calls the other oracle rows verify
      s"""WITH edges AS ($edgesSql)
         |SELECT 'count_vertex' AS algo, label AS key, CAST(n AS BIGINT) AS n FROM (
         |  SELECT label, count(*) AS n FROM (
         |    SELECT 'region' AS label FROM region
         |    UNION ALL SELECT 'nation' FROM nation
         |    UNION ALL SELECT 'customer' FROM customer
         |    UNION ALL SELECT 'supplier' FROM supplier
         |    UNION ALL SELECT 'part' FROM part
         |    UNION ALL SELECT 'order' FROM orders) GROUP BY label) cv
         |UNION ALL
         |SELECT 'count_edge', label, CAST(count(*) AS BIGINT) FROM edges GROUP BY label
         |UNION ALL
         |SELECT 'degree_centrality', src, CAST(count(*) AS BIGINT)
         |FROM edges GROUP BY src""".stripMargin) { (s, d) =>
      import graft.olap.AlgorithmPool
      val graph = g(s, d)
      AlgorithmPool.call("count_vertex", graph)
        .select(lit("count_vertex").as("algo"), col("label").as("key"), col("n"))
        .unionByName(AlgorithmPool.call("count_edge", graph)
          .select(lit("count_edge").as("algo"), col("label").as("key"), col("n")))
        .unionByName(AlgorithmPool
          .call("degree_centrality", graph, Map("direction" -> "OUT"))
          .select(lit("degree_centrality").as("algo"), col("id").as("key"),
            col("degree").as("n")))
    },

    q("q_pagerank", pagerankSql(3, 0.85), bench = true) { (s, d) =>
      Algorithms.pageRank(g(s, d), alpha = 0.85, iterations = 3)
    },

    q("q_wcc",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |e2 AS (SELECT src, dst FROM edges WHERE label IN ('in_nation', 'in_region')),
         |adj AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
         |verts AS (
         |  SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         |  UNION ALL SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
         |  UNION ALL SELECT 'customer:' || CAST(c_custkey AS VARCHAR) FROM customer
         |  UNION ALL SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) FROM supplier),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, adj.dst FROM reach r JOIN adj ON adj.src = r.b)
         |SELECT a AS id, min(b) AS component FROM reach GROUP BY a""".stripMargin,
      bench = true) { (s, d) =>
      val graph = g(s, d)
      val verts = graph.vertices
        .filter(col("label").isin("region", "nation", "customer", "supplier"))
        .select(col("id"))
      val edges = graph.outEdges
        .filter(col("label").isin("in_nation", "in_region"))
        .select(col("src"), col("dst"))
      Algorithms.wcc(verts, edges)
    },

    q("q_graphx_cc",
      // computer delegation (reference hugegraph-computer handoff): the
      // SAME component partition as q_wcc, computed by the GraphX Pregel
      // backend instead of the DataFrame loop. GraphX's representative is
      // the min INTERNAL vid (partition-order-dependent), so components
      // are relabeled with their min string id — the deterministic label
      // the oracle publishes.
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |e2 AS (SELECT src, dst FROM edges WHERE label IN ('in_nation', 'in_region')),
         |adj AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
         |verts AS (
         |  SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         |  UNION ALL SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
         |  UNION ALL SELECT 'customer:' || CAST(c_custkey AS VARCHAR) FROM customer
         |  UNION ALL SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) FROM supplier),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, adj.dst FROM reach r JOIN adj ON adj.src = r.b)
         |SELECT a AS id, min(b) AS component FROM reach GROUP BY a""".stripMargin) { (s, d) =>
      val sub = g(s, d).subgraph(col("label").isin("in_nation", "in_region"))
      val cc = graft.core.GraphXBridge.connectedComponents(sub)
        .filter(col("id").rlike("^(region|nation|customer|supplier):"))
      cc.join(
        cc.groupBy(col("component_rep")).agg(min(col("id")).as("component")),
        Seq("component_rep"))
        .select(col("id"), col("component"))
    },

    q("q_triangle_count",
      s"""WITH pairs AS ($coSupplierSql),
         |tri AS (
         |  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
         |  FROM pairs ab JOIN pairs bc ON ab.dst = bc.src
         |  JOIN pairs ac ON ac.src = ab.src AND ac.dst = bc.dst)
         |SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
         |GROUP BY id""".stripMargin,
      bench = true) { (s, d) =>
      Algorithms.triangleCount(coSupplierEdges(s, d))
    },

    // k-truss (k=32, 3 peel rounds) over the co-supplier graph: at sf0.1
    // the support spread (17..143) drives a real peeling cascade; at the
    // smaller SFs the graph is near-complete and survives intact — parity
    // still exercises the full enumerate→count→filter chain per round
    q("q_ktruss",
      {
        val rounds = (1 to 3).map { r =>
          s"""tri$r AS (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
             |  FROM e${r - 1} ab JOIN e${r - 1} bc ON ab.dst = bc.src
             |  JOIN e${r - 1} ac ON ac.src = ab.src AND ac.dst = bc.dst),
             |sup$r AS (SELECT src, dst, count(*) AS s FROM (
             |  SELECT a AS src, b AS dst FROM tri$r
             |  UNION ALL SELECT a, c FROM tri$r
             |  UNION ALL SELECT b, c FROM tri$r) z$r GROUP BY 1, 2),
             |e$r AS MATERIALIZED (
             |  SELECT e.src, e.dst, coalesce(s.s, 0) AS support
             |  FROM e${r - 1} e LEFT JOIN sup$r s USING (src, dst)
             |  WHERE coalesce(s.s, 0) >= 30)""".stripMargin
        }.mkString(",\n")
        s"""WITH pairs AS ($coSupplierSql),
           |e0 AS MATERIALIZED (SELECT src, dst FROM pairs),
           |$rounds
           |SELECT src, dst, CAST(support AS BIGINT) AS support FROM e3""".stripMargin
      },
      bench = true) { (s, d) =>
      Algorithms.kTruss(coSupplierEdges(s, d), k = 32, rounds = 3)
    },

    q("q_cluster_coefficient",
      s"""WITH pairs AS ($coSupplierSql),
         |deg AS (SELECT id, CAST(count(*) AS DOUBLE) AS deg FROM (
         |  SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs) GROUP BY id),
         |tri AS (
         |  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
         |  FROM pairs ab JOIN pairs bc ON ab.dst = bc.src
         |  JOIN pairs ac ON ac.src = ab.src AND ac.dst = bc.dst),
         |tc AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
         |  GROUP BY id)
         |SELECT d.id, round(CASE WHEN d.deg > 1
         |  THEN 2.0 * coalesce(t.triangles, 0) / (d.deg * (d.deg - 1.0)) ELSE 0.0 END, 9) AS cc
         |FROM deg d LEFT JOIN tc t ON t.id = d.id""".stripMargin) { (s, d) =>
      Algorithms.clusterCoefficient(coSupplierEdges(s, d))
    },

    q("q_kcore", kcoreSql(k = 10, rounds = 8)) { (s, d) =>
      Algorithms.kcore(coSupplierEdges(s, d), k = 10)
    },

    // coreness decomposition on a bounded probe ladder — each probe peels
    // the previous probe's surviving edges (core nesting), so the ladder
    // costs barely more than its largest single probe
    q("q_coreness", corenessSql(Seq(5, 10, 15), rounds = 10)) { (s, d) =>
      Algorithms.corenessTiers(coSupplierEdges(s, d), Seq(5, 10, 15))
    },

    q("q_closeness_centrality",
      """WITH RECURSIVE e2 AS (
        |  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS src,
        |         'region:' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation),
        |adj AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
        |verts AS (SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS id FROM nation
        |          UNION ALL SELECT 'region:' || CAST(r_regionkey AS VARCHAR) FROM region),
        |bfs(root, id, dist) AS (
        |  SELECT id, id, CAST(0 AS BIGINT) FROM verts
        |  UNION
        |  SELECT b.root, a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
        |  WHERE b.dist < 6),
        |d AS (SELECT root, id, min(dist) AS dist FROM bfs GROUP BY root, id)
        |SELECT root AS id, round(sum(1.0 / dist), 9) AS closeness
        |FROM d WHERE dist > 0 GROUP BY root""".stripMargin) { (s, d) =>
      val graph = g(s, d)
      val verts = graph.vertices.filter(col("label").isin("nation", "region")).select(col("id"))
      val edges = graph.outEdges.filter(col("label") === "in_region")
        .select(col("src"), col("dst"))
      Algorithms.closenessCentrality(verts, edges, maxDepth = 6)
    },

    q("q_eigenvector_centrality", eigenvectorSql(5)) { (s, d) =>
      Algorithms.eigenvector(supplierVerts(s, d), coSupplierEdges(s, d), iterations = 5)
    },

    q("q_olap_writeback",
      """SELECT 'customer:' || CAST(c.c_custkey AS VARCHAR) AS id, c.c_acctbal,
        |       CAST(1 + coalesce(o.cnt, 0) AS BIGINT) AS degree
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
        |  ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      // OLAP write-back (writeType OLAP_*, reference GraphReadMode.ALL):
      // algorithm output joined onto the vertex table as a property column.
      val graph = g(s, d)
      val deg = Algorithms.degreeCentrality(graph, Direction.BOTH)
      graph.verticesOf("customer")
        .join(deg, Seq("id"), "left")
        .select(col("id"), col("acctbal").as("c_acctbal"),
          coalesce(col("degree"), lit(0L)).as("degree"))
    },

    q("q_lpa", lpaSql(3)) { (s, d) =>
      // deterministic min-label LPA (the reference breaks ties randomly; our
      // deterministic variant IS SQL-expressible, so it gets a full oracle)
      val verts = supplierVerts(s, d)
      Algorithms.lpa(verts, coSupplierEdges(s, d), iterations = 3)
    })
}
