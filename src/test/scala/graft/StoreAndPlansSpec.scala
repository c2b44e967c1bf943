package graft

import graft.core.ModernGraph
import graft.plans.{GraftExtensions, SchemaLinkPruning}
import graft.sources.GraphStore
import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

class StoreAndPlansSpec extends SparkSpec {

  lazy val g = ModernGraph.build(spark)

  test("graph store round-trips through label-partitioned parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    GraphStore.save(g, dir)
    val loaded = GraphStore.load(spark, dir, ModernGraph.schema)
    assert(loaded.vertices.count() === 6L)
    assert(loaded.edges.count() === 6L)
    // label partition pruning: a label filter reads only that directory
    val plan = loaded.edges.filter(col("label") === "knows")
      .queryExecution.executedPlan.toString
    assert(loaded.edges.filter(col("label") === "knows").count() === 2L)
    // schema document rides along
    val json = spark.read.json(s"$dir/schema").head().getAs[String]("schema_json")
    assert(json.contains("\"sortKeys\":[\"date\"]"))
  }

  test("schema-link pruning replaces impossible-label scans with empty relations") {
    GraftExtensions.installSchema(ModernGraph.schema)
    try {
      // analyzed plans: the optimizer would eagerly fold in-memory relations
      val impossible = g.edges.filter(col("label") === "no_such_label")
      val pruned = SchemaLinkPruning(impossible.queryExecution.analyzed)
      assert(pruned.isInstanceOf[LocalRelation]) // no scan survives
      val possible = g.edges.filter(col("label") === "knows")
      val kept = SchemaLinkPruning(possible.queryExecution.analyzed)
      assert(!kept.isInstanceOf[LocalRelation])
      // a COMPUTED left side can match rows the bare column never would —
      // `upper(label) = 'KNOWS'` must not prune even though 'KNOWS' is
      // undeclared (ADVICE r4: refName over arbitrary expressions pruned it)
      val computed = g.edges.filter(upper(col("label")) === "KNOWS")
      assert(!SchemaLinkPruning(computed.queryExecution.analyzed)
        .isInstanceOf[LocalRelation])
      // sub_label pruning is inert when the installed schema declares no
      // father/sub hierarchy (ad-hoc graphs keep their sub_label filters)
      val adhoc = g.edges.withColumn("sub_label", lit("wire"))
        .filter(col("sub_label") === "wire")
      assert(!SchemaLinkPruning(adhoc.queryExecution.analyzed)
        .isInstanceOf[LocalRelation])
    } finally GraftExtensions.clearSchema()
  }

  test("bucketed edge table joins a frontier with zero shuffle on the edge side") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bucketed_edges_spec")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "bucketed_edges_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    GraphStore.saveBucketedEdges(g.edges.select(col("src"), col("dst")),
      "bucketed_edges_spec", buckets = 4)
    val edges = GraphStore.loadBucketedEdges(spark, "bucketed_edges_spec")
    val frontier = Seq("person:marko", "person:josh").toDF("src")
    // force a non-broadcast join so the exchange structure is observable
    val joined = spark.sessionState.conf
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = edges.join(frontier, Seq("src"))
      val plan = df.queryExecution.executedPlan.toString
      // exactly one Exchange — the frontier side; the bucketed edge scan
      // must NOT re-shuffle
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected 1 exchange (frontier only), plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"edge scan not bucketed:\n$plan")
      assert(df.count() === 5L) // marko: 2 knows + 1 created; josh: 2 created
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native expressions callable from SQL after registration") {
    VectorFunctions.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
