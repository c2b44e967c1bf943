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
    } finally GraftExtensions.clearSchema()
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
