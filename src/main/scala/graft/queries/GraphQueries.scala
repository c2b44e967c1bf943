package graft.queries

import org.apache.spark.sql.functions._
import graft.core._
import graft.traverse.Traversals
import QueryDef._
import GraphSql._

/** SURVEY §2.12 OLTP traverser operators over the TPC-H graph projection,
  * each checked against a DuckDB recursive-CTE/join oracle restated on the
  * raw tables. Literals are chosen to be non-trivial at sf0.01 (the
  * correctness SF); results at other SFs may legitimately differ in size. */
object GraphQueries {

  private def g(s: org.apache.spark.sql.SparkSession, d: String) = TpchGraph.cached(s, d)

  val defs: Seq[QueryDef] = Seq(

    q("q_kneighbor",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT src, dst FROM edges),
         |${bfsSql("customer:1", 3)}
         |SELECT DISTINCT id FROM bfs WHERE id <> 'customer:1'""".stripMargin,
      bench = true) { (s, d) =>
      Traversals.kneighbor(g(s, d), "customer:1", Direction.OUT, Nil, maxDepth = 3)
    },

    q("q_kout_nearest",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT src, dst FROM edges),
         |${bfsSql("customer:1", 2)}
         |SELECT id FROM (SELECT id, min(dist) AS md FROM bfs GROUP BY id) WHERE md = 2""".stripMargin) { (s, d) =>
      Traversals.koutNearest(g(s, d), "customer:1", Direction.OUT, Nil, depth = 2)
    },

    q("q_kout_all",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT src, dst FROM edges),
         |${bfsSql("customer:1", 2)}
         |SELECT DISTINCT id FROM bfs WHERE dist = 2 AND id <> 'customer:1'""".stripMargin) { (s, d) =>
      Traversals.koutAll(g(s, d), "customer:1", Direction.OUT, Nil, depth = 2)
    },

    // DFS kout over the deterministic degree-truncated adjacency (degree=3
    // keeps the 3 smallest (label, dst) neighbors per vertex — the
    // order-canonical version of the reference's storage-order truncation)
    q("q_kout_dfs",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst,
         |         row_number() OVER (PARTITION BY src ORDER BY label, dst) AS rn
         |  FROM edges) t WHERE rn <= 3),
         |${bfsSql("customer:1", 2)}
         |SELECT DISTINCT id FROM bfs WHERE dist = 2 AND id <> 'customer:1'""".stripMargin) { (s, d) =>
      Traversals.koutDfs(g(s, d), "customer:1", Direction.OUT, Nil,
        depth = 2, nearest = false, degree = 3)
    },

    // customizedKout (reference KoutTraverser.customizedKout — Steps-driven
    // expansion): two hops with DIFFERENT labels and a per-edge property
    // filter on hop 2, inexpressible by the single (dir, labels) kout
    q("q_kout_steps",
      """SELECT DISTINCT 'part:' || CAST(l.l_partkey AS VARCHAR) AS id
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey = 1 AND l.l_quantity > 25""".stripMargin) { (s, d) =>
      Traversals.customizedKout(g(s, d), "customer:1", Seq(
        EdgeStep(Direction.OUT, Seq("placed")),
        EdgeStep(Direction.OUT, Seq("contains"), Some(Cond.gt("quantity", 25.0)))))
    },

    // customizedKneighbor (reference KneighborTraverser.customizedKneighbor
    // — the SAME Steps bundle repeated per layer): everything within 2
    // property-filtered BOTH hops of an order — co-ordered parts through
    // heavy (quantity > 30) lineitems
    q("q_kneighbor_steps",
      """WITH RECURSIVE e AS (
        |  SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
        |         'part:' || CAST(l_partkey AS VARCHAR) AS dst
        |  FROM lineitem WHERE l_quantity > 30),
        |adj AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |bfs(id, dist) AS (
        |  SELECT 'order:3', CAST(0 AS BIGINT)
        |  UNION
        |  SELECT a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
        |  WHERE b.dist < 2)
        |SELECT DISTINCT id FROM bfs WHERE id <> 'order:3'""".stripMargin) { (s, d) =>
      Traversals.customizedKneighbor(g(s, d), "order:3",
        EdgeStep(Direction.BOTH, Seq("contains"), Some(Cond.gt("quantity", 30.0))),
        maxDepth = 2)
    },

    q("q_same_neighbors",
      """SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 3
        |INTERSECT
        |SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem WHERE l_orderkey = 6771""".stripMargin) { (s, d) =>
      Traversals.sameNeighbors(g(s, d), "order:3", "order:6771", Direction.OUT, Seq("contains"))
    },

    q("q_same_neighbors_batch",
      """SELECT t AS id FROM (
        |  SELECT 'part:' || CAST(l_partkey AS VARCHAR) AS t,
        |         count(DISTINCT l_suppkey) AS n
        |  FROM lineitem WHERE l_suppkey IN (1, 2, 3)
        |  GROUP BY 1) z
        |WHERE n = 3""".stripMargin) { (s, d) =>
      // N-vertex variant (reference SameNeighborTraverser:68): parts every
      // one of the three suppliers supplies
      Traversals.sameNeighborsBatch(g(s, d),
        Seq("supplier:1", "supplier:2", "supplier:3"),
        Direction.IN, Seq("supplied_by"))
    },

    q("q_shortest_path_trace",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS ($bothEdgesSql),
         |p(id, path, d) AS (
         |  SELECT 'customer:1', ['customer:1'], 0
         |  UNION ALL
         |  SELECT a.dst, p.path || [a.dst], p.d + 1
         |  FROM p JOIN adj a ON a.src = p.id
         |  WHERE p.d < 3 AND NOT list_contains(p.path, a.dst)),
         |hits AS (SELECT * FROM p WHERE id = 'supplier:3')
         |SELECT array_to_string(path, '->') AS path FROM hits
         |WHERE d = (SELECT min(d) FROM hits)
         |ORDER BY array_to_string(list_reverse(path), '->') LIMIT 1""".stripMargin) { (s, d) =>
      // path reconstruction via layered min-parent pointers == the shortest
      // path with lexicographically-smallest REVERSED id sequence
      Traversals.shortestPathTrace(g(s, d), "customer:1", "supplier:3",
        Direction.BOTH, Nil, maxDepth = 3)
    },

    q("q_jaccard_similarity",
      """WITH na AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 3),
        |nb AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 6771),
        |i AS (SELECT CAST(count(*) AS DOUBLE) n FROM (SELECT id FROM na INTERSECT SELECT id FROM nb)),
        |u AS (SELECT CAST(count(*) AS DOUBLE) n FROM (SELECT id FROM na UNION SELECT id FROM nb))
        |SELECT round(CASE WHEN u.n = 0 THEN 0 ELSE i.n / u.n END, 9) AS similarity FROM i, u""".stripMargin) { (s, d) =>
      Traversals.jaccardSimilarity(g(s, d), "order:3", "order:6771", Direction.OUT, Seq("contains"))
    },

    q("q_adamic_adar",
      """WITH na AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 3),
        |nb AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 6771),
        |common AS (SELECT id FROM na INTERSECT SELECT id FROM nb),
        |deg AS (SELECT 'part:' || CAST(l_partkey AS VARCHAR) AS id, CAST(count(*) AS DOUBLE) AS deg
        |        FROM lineitem GROUP BY 1)
        |SELECT round(coalesce(sum(1.0 / ln(deg)), 0), 9) AS score
        |FROM common JOIN deg USING (id)""".stripMargin) { (s, d) =>
      Traversals.adamicAdar(g(s, d), "order:3", "order:6771", Direction.OUT, Seq("contains"))
    },

    q("q_resource_allocation",
      """WITH na AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 3),
        |nb AS (SELECT DISTINCT 'part:' || CAST(l_partkey AS VARCHAR) AS id FROM lineitem WHERE l_orderkey = 6771),
        |common AS (SELECT id FROM na INTERSECT SELECT id FROM nb),
        |deg AS (SELECT 'part:' || CAST(l_partkey AS VARCHAR) AS id, CAST(count(*) AS DOUBLE) AS deg
        |        FROM lineitem GROUP BY 1)
        |SELECT round(coalesce(sum(1.0 / deg), 0), 9) AS score
        |FROM common JOIN deg USING (id)""".stripMargin) { (s, d) =>
      Traversals.resourceAllocation(g(s, d), "order:3", "order:6771", Direction.OUT, Seq("contains"))
    },

    q("q_shortest_path",
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |adj AS ($bothEdgesSql),
         |${bfsSql("customer:1", 4)}
         |SELECT CAST(min(dist) AS BIGINT) AS dist FROM bfs
         |WHERE id = 'supplier:3' HAVING min(dist) IS NOT NULL""".stripMargin,
      bench = true) { (s, d) =>
      Traversals.shortestPathDist(g(s, d), "customer:1", "supplier:3",
        Direction.BOTH, Nil, maxDepth = 4)
    },

    q("q_paths",
      """SELECT DISTINCT 'customer:1->order:' || CAST(o_orderkey AS VARCHAR) ||
        |       '->part:32' AS path
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey = 1 AND l_partkey = 32""".stripMargin) { (s, d) =>
      // all simple vertex-paths customer:1 → part:32 within 3 hops; with OUT
      // direction the only shape is customer→order→part
      Traversals.paths(g(s, d), "customer:1", "part:32", Direction.OUT, Nil, maxDepth = 3)
    },

    q("q_count_walks",
      """SELECT CAST(count(*) AS BIGINT) AS n
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey = 1""".stripMargin) { (s, d) =>
      // 2-step reachability count without dedup (CountTraverser dedup=false):
      // one count per edge walk customer:1 -placed→ order -contains→ part
      Traversals.countWalks(g(s, d), "customer:1", Seq(
        EdgeStep(Direction.OUT, Seq("placed")),
        EdgeStep(Direction.OUT, Seq("contains"))))
    },

    q("q_edge_existence",
      """SELECT 'order:359' AS src, 'part:1787' AS dst, 'contains' AS label,
        |       CAST(l_linenumber AS VARCHAR) AS sort_values
        |FROM lineitem WHERE l_orderkey = 359 AND l_partkey = 1787""".stripMargin) { (s, d) =>
      Traversals.edgeExistence(g(s, d), "order:359", "part:1787", Some("contains"))
    },

    q("q_personal_rank", personalRankSql(2, ""), bench = true) { (s, d) =>
      Traversals.personalRank(g(s, d), "order:42", "contains", alpha = 0.85, maxDepth = 2)
    },

    // WithLabel result slices (reference PersonalRankTraverser.java:81-86):
    // root order:42's side = orders, so SAME_LABEL keeps order:* rows and
    // OTHER_LABEL keeps part:* rows — the recommendation shape (rank the
    // other side of the bipartite graph, drop same-side companions). Depth
    // 3 so the OTHER slice is non-empty: new parts first appear at
    // order→part→order'→part' (depth-1 parts are rootAdjacencies, removed)
    q("q_personal_rank_other", personalRankSql(3, " AND id LIKE 'part:%'")) { (s, d) =>
      Traversals.personalRank(g(s, d), "order:42", "contains", alpha = 0.85,
        maxDepth = 3, withLabel = Traversals.WithLabel.OtherLabel)
    },

    q("q_personal_rank_same", personalRankSql(3, " AND id LIKE 'order:%'")) { (s, d) =>
      Traversals.personalRank(g(s, d), "order:42", "contains", alpha = 0.85,
        maxDepth = 3, withLabel = Traversals.WithLabel.SameLabel)
    })

  /** The hand-unrolled `rounds`-round PersonalRank recurrence; `sliceFilter`
    * is the WithLabel twin — the fixture's ids embed the vertex label, so
    * the side filter is an id-prefix predicate in SQL. */
  private def personalRankSql(rounds: Int, sliceFilter: String): String = {
    val rs = (1 to rounds).map { r =>
      s"""r$r AS (
         |  SELECT id, sum(rank) AS rank FROM (
         |    SELECT w.dst AS id, r.rank * 0.85 / dg.deg AS rank
         |    FROM r${r - 1} r JOIN deg dg ON dg.id = r.id JOIN walk w ON w.src = r.id
         |    UNION ALL SELECT 'order:42', 0.15
         |  ) GROUP BY id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH walk AS (
       |  SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
       |         'part:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem
       |  UNION ALL
       |  SELECT 'part:' || CAST(l_partkey AS VARCHAR),
       |         'order:' || CAST(l_orderkey AS VARCHAR) FROM lineitem
       |), deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg FROM walk GROUP BY src),
       |r0(id, rank) AS (SELECT 'order:42', CAST(1.0 AS DOUBLE)),
       |$rs
       |SELECT id, round(rank, 9) AS rank FROM r$rounds
       |WHERE id NOT IN (SELECT id FROM r1)$sliceFilter""".stripMargin
  }
}
