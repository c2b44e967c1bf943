package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

/** A directed, labeled, schema-full property graph over two DataFrames.
  *
  * Design (SURVEY §1.5): edges are stored ONCE (src→dst); the IN adjacency is
  * a zero-cost reversed projection — unlike the reference, which physically
  * duplicates every edge as an OUT row and an IN row
  * (`.../type/HugeType.java:53-55` EDGE_OUT/EDGE_IN) because its KV layout
  * needs both directions to be sequential scans. A columnar scan + shuffle
  * join does not: at 100 TB this halves edge storage and write throughput
  * cost for free.
  */
final case class PropertyGraph(
    vertices: DataFrame,
    edges: DataFrame,
    schema: GraphSchema) {

  /** OUT adjacency: (id → nbr) pairs plus edge props. */
  def outEdges: DataFrame = edges
  /** IN adjacency: reversed view — no duplicated storage. */
  def inEdges: DataFrame =
    edges.withColumnRenamed("src", "__t").withColumnRenamed("dst", "src")
      .withColumnRenamed("__t", "dst")
  def bothEdges: DataFrame = outEdges.unionByName(inEdges)

  /** Directed adjacency restricted to labels; the core input of every
    * traverser. Schema-link pruning: labels that cannot exist are dropped at
    * plan time (reference `GraphTransaction.optimizeQuery:1560-1589`). */
  def adjacency(dir: Direction.Value, labels: Seq[String] = Nil): DataFrame = {
    val base = dir match {
      case Direction.OUT  => outEdges
      case Direction.IN   => inEdges
      case Direction.BOTH => bothEdges
    }
    // schema-routed label restriction: a SUB edge label is stored under its
    // father's `label` with a `sub_label` discriminator, so the filter
    // rewrites to (label = father AND sub_label = sub) — reference
    // `GraphTransaction.optimizeQuery:1607-1656`. Plain labels (and frames
    // without the sub_label column) keep simple label equality.
    if (labels.isEmpty) base
    else base.filter(schema.edgeLabelCond(labels, base.columns.contains("sub_label")))
  }

  /** Per-vertex degree (reference `cent/DegreeCentralityAlgorithm.java:48`). */
  def degrees(dir: Direction.Value = Direction.BOTH): DataFrame =
    adjacency(dir).groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  def verticesOf(label: String): DataFrame = vertices.filter(col("label") === label)

  /** Gremlin `subgraph` step: the edge-induced subgraph — edges matching the
    * predicate plus the vertices they touch (reference TinkerPop subgraph
    * side-effect; SubgraphStrategy's filtered-view semantics). */
  def subgraph(edgePredicate: org.apache.spark.sql.Column): PropertyGraph = {
    val keptEdges = edges.filter(edgePredicate)
    val touched = keptEdges.select(col("src").as("id"))
      .union(keptEdges.select(col("dst").as("id"))).distinct()
    copy(vertices = vertices.join(touched, Seq("id"), "left_semi"),
      edges = keptEdges)
  }

  /** OLAP read mode (reference `GraphReadMode.ALL` / writeType OLAP_*,
    * SURVEY §1.2): algorithm outputs live in a separate olap_props table and
    * are joined onto the vertices at read time. `olapProps` columns: id +
    * one column per OLAP property. */
  def withOlapProps(olapProps: DataFrame): PropertyGraph =
    copy(vertices = vertices.join(olapProps, Seq("id"), "left"))

  /** TTL view — elements past their expiry are invisible at read, mirroring
    * `Query.showExpired` (reference `.../backend/query/Query.java:70`). */
  def liveVertices(nowMillis: Long): DataFrame =
    if (!vertices.columns.contains("~ttl_expiry")) vertices
    else vertices.filter(col("~ttl_expiry").isNull || col("~ttl_expiry") > lit(nowMillis))

  /** Register the graph as Spark SQL temp views — the third text frontend
    * beside GremlinLite/CypherLite (SURVEY §7.1 item 6 "optional SQL
    * views"): `<prefix>_vertices` / `<prefix>_edges`, so `spark.sql` joins
    * the graph like any table and the full Catalyst surface (pushdown,
    * AQE, broadcast) applies unchanged. Views are lazy plan aliases — no
    * materialization, no extra scan. */
  def registerViews(prefix: String = "g"): Unit = {
    vertices.createOrReplaceTempView(s"${prefix}_vertices")
    edges.createOrReplaceTempView(s"${prefix}_edges")
  }
}

/** Graph projection of the driver's TPC-H-ish tables (FIXTURES.md §2).
  *
  * Vertex ids are PRIMARY_KEY-spliced strings `label:key`; this matches the
  * DuckDB oracle expression `'label:' || key` exactly, so graph results are
  * hash-comparable.
  */
object TpchGraph {
  import IdSplicer.spliceId

  val schema: GraphSchema = GraphSchema(
    propertyKeys = Seq(
      PropertyKeyDef("name", GraphDataType.TEXT),
      PropertyKeyDef("mktsegment", GraphDataType.TEXT),
      PropertyKeyDef("acctbal", GraphDataType.DOUBLE),
      PropertyKeyDef("brand", GraphDataType.TEXT),
      PropertyKeyDef("type", GraphDataType.TEXT),
      PropertyKeyDef("size", GraphDataType.INT),
      PropertyKeyDef("retailprice", GraphDataType.DOUBLE),
      PropertyKeyDef("orderstatus", GraphDataType.TEXT),
      PropertyKeyDef("totalprice", GraphDataType.DOUBLE),
      PropertyKeyDef("orderpriority", GraphDataType.TEXT),
      PropertyKeyDef("quantity", GraphDataType.DOUBLE),
      PropertyKeyDef("extendedprice", GraphDataType.DOUBLE),
      PropertyKeyDef("discount", GraphDataType.DOUBLE),
      PropertyKeyDef("linenumber", GraphDataType.INT)),
    vertexLabels = Seq(
      VertexLabelDef("region", Seq("name"), primaryKeys = Seq("r_regionkey")),
      VertexLabelDef("nation", Seq("name"), primaryKeys = Seq("n_nationkey")),
      VertexLabelDef("customer", Seq("name", "mktsegment", "acctbal"), primaryKeys = Seq("c_custkey")),
      VertexLabelDef("supplier", Seq("name", "acctbal"), primaryKeys = Seq("s_suppkey")),
      VertexLabelDef("part", Seq("name", "brand", "type", "size", "retailprice"), primaryKeys = Seq("p_partkey")),
      VertexLabelDef("order", Seq("orderstatus", "totalprice", "orderpriority"), primaryKeys = Seq("o_orderkey"))),
    edgeLabels = Seq(
      EdgeLabelDef("in_nation", "customer", "nation"),
      EdgeLabelDef("in_nation", "supplier", "nation"),
      EdgeLabelDef("in_region", "nation", "region"),
      EdgeLabelDef("placed", "customer", "order"),
      EdgeLabelDef("contains", "order", "part",
        properties = Seq("quantity", "extendedprice", "discount", "linenumber"),
        multiple = true, sortKeys = Seq("linenumber")),
      EdgeLabelDef("supplied_by", "part", "supplier",
        properties = Seq("quantity"), multiple = true)))

  private def pad(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    // Null-pad to the union schema: id, label, then the given props.
    val all = Seq("name", "mktsegment", "acctbal", "brand", "type", "size",
      "retailprice", "orderstatus", "totalprice", "orderpriority")
    val m = cols.toMap
    df.select(
      (col("id") +: col("label") +: all.map(c =>
        m.get(c).map(src => col(src).as(c)).getOrElse(lit(null).as(c)))): _*)
  }

  def vertices(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
      .select(spliceId("region", col("r_regionkey")).as("id"), lit("region").as("label"), col("r_name"))
    val n = Tables.nation(spark, dir)
      .select(spliceId("nation", col("n_nationkey")).as("id"), lit("nation").as("label"), col("n_name"))
    val c = Tables.customer(spark, dir)
      .select(spliceId("customer", col("c_custkey")).as("id"), lit("customer").as("label"),
        col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val s = Tables.supplier(spark, dir)
      .select(spliceId("supplier", col("s_suppkey")).as("id"), lit("supplier").as("label"),
        col("s_name"), col("s_acctbal"))
    val p = Tables.part(spark, dir)
      .select(spliceId("part", col("p_partkey")).as("id"), lit("part").as("label"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    val o = Tables.orders(spark, dir)
      .select(spliceId("order", col("o_orderkey")).as("id"), lit("order").as("label"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
    pad(r, Seq("name" -> "r_name"))
      .unionByName(pad(n, Seq("name" -> "n_name")))
      .unionByName(pad(c, Seq("name" -> "c_name", "mktsegment" -> "c_mktsegment", "acctbal" -> "c_acctbal")))
      .unionByName(pad(s, Seq("name" -> "s_name", "acctbal" -> "s_acctbal")))
      .unionByName(pad(p, Seq("name" -> "p_name", "brand" -> "p_brand", "type" -> "p_type",
        "size" -> "p_size", "retailprice" -> "p_retailprice")))
      .unionByName(pad(o, Seq("orderstatus" -> "o_orderstatus", "totalprice" -> "o_totalprice",
        "orderpriority" -> "o_orderpriority")))
  }

  /** Edge table: src, dst, label, sort_values, quantity, extendedprice,
    * discount, linenumber. Stored once; IN direction is a reversed view. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    def noprops(df: DataFrame): DataFrame = df
      .withColumn("sort_values", lit(null).cast("string"))
      .withColumn("quantity", lit(null).cast("double"))
      .withColumn("extendedprice", lit(null).cast("double"))
      .withColumn("discount", lit(null).cast("double"))
      .withColumn("linenumber", lit(null).cast("int"))
    val custNation = noprops(Tables.customer(spark, dir).select(
      spliceId("customer", col("c_custkey")).as("src"),
      spliceId("nation", col("c_nationkey")).as("dst"),
      lit("in_nation").as("label")))
    val suppNation = noprops(Tables.supplier(spark, dir).select(
      spliceId("supplier", col("s_suppkey")).as("src"),
      spliceId("nation", col("s_nationkey")).as("dst"),
      lit("in_nation").as("label")))
    val nationRegion = noprops(Tables.nation(spark, dir).select(
      spliceId("nation", col("n_nationkey")).as("src"),
      spliceId("region", col("n_regionkey")).as("dst"),
      lit("in_region").as("label")))
    val placed = noprops(Tables.orders(spark, dir).select(
      spliceId("customer", col("o_custkey")).as("src"),
      spliceId("order", col("o_orderkey")).as("dst"),
      lit("placed").as("label")))
    val li = Tables.lineitem(spark, dir)
    val contains = li.select(
      spliceId("order", col("l_orderkey")).as("src"),
      spliceId("part", col("l_partkey")).as("dst"),
      lit("contains").as("label"),
      col("l_linenumber").cast("string").as("sort_values"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("extendedprice"),
      col("l_discount").as("discount"),
      col("l_linenumber").as("linenumber"))
    val suppliedBy = li.select(
      spliceId("part", col("l_partkey")).as("src"),
      spliceId("supplier", col("l_suppkey")).as("dst"),
      lit("supplied_by").as("label"),
      lit(null).cast("string").as("sort_values"),
      col("l_quantity").as("quantity"),
      lit(null).cast("double").as("extendedprice"),
      lit(null).cast("double").as("discount"),
      lit(null).cast("int").as("linenumber"))
    custNation.unionByName(suppNation).unionByName(nationRegion)
      .unionByName(placed).unionByName(contains).unionByName(suppliedBy)
  }

  def build(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(vertices(spark, dir), edges(spark, dir), schema)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), PropertyGraph]()

  /** Memoized, materialized projection — the deployment shape: the graph
    * tables are loaded/cached once per session and every query plans against
    * the pinned view instead of re-reading the 6-table union. On a cluster
    * this is the `persist(MEMORY_AND_DISK)` (or bucketed-table) load step.
    *
    * SPARK_GRAFT_BUCKETED=1 switches to the store-resident configuration:
    * edges come from a `bucketBy(src)` catalog table (built once per
    * session — the load phase) and Pin is pass-through, so every frontier
    * join re-reads the store but finds the edge side already partitioned on
    * the join key. This is the layout a 100 TB deployment runs, where the
    * edge table cannot be a session checkpoint. */
  def cached(spark: SparkSession, dir: String): PropertyGraph =
    cache.computeIfAbsent((System.identityHashCode(spark), dir), _ => {
      val g = build(spark, dir)
      if (sys.env.get("SPARK_GRAFT_BUCKETED").contains("1")) {
        val tbl = "graft_edges_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        // orphan-dir cleanup under the CONFIGURED warehouse (a hard-coded
        // relative spark-warehouse/ would miss — or hit an unrelated dir —
        // when spark.sql.warehouse.dir points elsewhere)
        val orphan = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")), tbl)
        orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(orphan, true)
        graft.sources.GraphStore.saveBucketedEdges(g.edges, tbl, buckets)
        PropertyGraph(g.vertices.localCheckpoint(eager = true),
          spark.table(tbl), g.schema)
      } else PropertyGraph(
        g.vertices.localCheckpoint(eager = true),
        g.edges.localCheckpoint(eager = true),
        g.schema)
    })
}
