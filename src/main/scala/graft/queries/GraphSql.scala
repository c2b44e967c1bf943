package graft.queries

/** Shared DuckDB SQL fragments that re-state the TPC-H→property-graph
  * projection (FIXTURES.md §2) for oracle queries. Must stay in lockstep
  * with [[graft.core.TpchGraph]]. */
object GraphSql {

  /** All directed edges (src, dst, label) — mirrors TpchGraph.edges. */
  val edgesSql: String =
    """SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS src,
      |       'nation:' || CAST(c_nationkey AS VARCHAR) AS dst, 'in_nation' AS label FROM customer
      |UNION ALL
      |SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
      |       'nation:' || CAST(s_nationkey AS VARCHAR), 'in_nation' FROM supplier
      |UNION ALL
      |SELECT 'nation:' || CAST(n_nationkey AS VARCHAR),
      |       'region:' || CAST(n_regionkey AS VARCHAR), 'in_region' FROM nation
      |UNION ALL
      |SELECT 'customer:' || CAST(o_custkey AS VARCHAR),
      |       'order:' || CAST(o_orderkey AS VARCHAR), 'placed' FROM orders
      |UNION ALL
      |SELECT 'order:' || CAST(l_orderkey AS VARCHAR),
      |       'part:' || CAST(l_partkey AS VARCHAR), 'contains' FROM lineitem
      |UNION ALL
      |SELECT 'part:' || CAST(l_partkey AS VARCHAR),
      |       'supplier:' || CAST(l_suppkey AS VARCHAR), 'supplied_by' FROM lineitem""".stripMargin

  val bothEdgesSql: String =
    s"""SELECT src, dst, label FROM edges
       |UNION ALL SELECT dst AS src, src AS dst, label FROM edges""".stripMargin

  /** Bounded-BFS recursive CTE over a previously-defined `adj(src,dst)`
    * relation; produces (id, dist) pairs deduped by UNION. */
  def bfsSql(source: String, maxDepth: Int): String =
    s"""bfs(id, dist) AS (
       |  SELECT '$source', CAST(0 AS BIGINT)
       |  UNION
       |  SELECT a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id
       |  WHERE b.dist < $maxDepth
       |)""".stripMargin
}
