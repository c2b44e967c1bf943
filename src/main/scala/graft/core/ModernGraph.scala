package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TinkerPop "modern" graph — the reference's canonical test fixture
  * (reference `hugegraph-test/.../api/BaseApiTest.java:122-280`; FIXTURES.md
  * §1): marko/vadas/josh/peter (person), lop/ripple (software), knows/created
  * edges. Ids use the PRIMARY_KEY splice `label:name`. */
object ModernGraph {

  val schema: GraphSchema = GraphSchema(
    propertyKeys = Seq(
      PropertyKeyDef("name", GraphDataType.TEXT),
      PropertyKeyDef("age", GraphDataType.INT),
      PropertyKeyDef("city", GraphDataType.TEXT),
      PropertyKeyDef("lang", GraphDataType.TEXT),
      PropertyKeyDef("price", GraphDataType.INT),
      PropertyKeyDef("date", GraphDataType.TEXT),
      PropertyKeyDef("weight", GraphDataType.DOUBLE)),
    vertexLabels = Seq(
      VertexLabelDef("person", Seq("name", "age", "city"), primaryKeys = Seq("name")),
      VertexLabelDef("software", Seq("name", "lang", "price"), primaryKeys = Seq("name"))),
    edgeLabels = Seq(
      EdgeLabelDef("knows", "person", "person", Seq("date", "weight"),
        multiple = true, sortKeys = Seq("date")),
      EdgeLabelDef("created", "person", "software", Seq("date", "weight"))))

  def build(spark: SparkSession): PropertyGraph = {
    import spark.implicits._
    val people = Seq(
      ("marko", 29, "Beijing"), ("vadas", 27, "Hongkong"),
      ("josh", 32, "Beijing"), ("peter", 35, "Shanghai"))
      .toDF("name", "age", "city")
      .select(concat(lit("person:"), col("name")).as("id"), lit("person").as("label"),
        col("name"), col("age"), col("city"),
        lit(null).cast("string").as("lang"), lit(null).cast("int").as("price"))
    val software = Seq(("lop", "java", 328), ("ripple", "java", 199))
      .toDF("name", "lang", "price")
      .select(concat(lit("software:"), col("name")).as("id"), lit("software").as("label"),
        col("name"), lit(null).cast("int").as("age"), lit(null).cast("string").as("city"),
        col("lang"), col("price"))
    val vertices = people.unionByName(software)

    val edges = Seq(
      ("person:marko", "person:vadas", "knows", "20160110", 0.5),
      ("person:marko", "person:josh", "knows", "20130220", 1.0),
      ("person:marko", "software:lop", "created", "20171210", 0.4),
      ("person:josh", "software:lop", "created", "20091111", 0.4),
      ("person:josh", "software:ripple", "created", "20171210", 1.0),
      ("person:peter", "software:lop", "created", "20170324", 0.2))
      .toDF("src", "dst", "label", "date", "weight")
      .withColumn("sort_values",
        when(col("label") === "knows", col("date")).otherwise(lit(null).cast("string")))
      .select(col("src"), col("dst"), col("label"), col("sort_values"),
        col("date"), col("weight"))

    PropertyGraph(vertices, edges, schema)
  }
}
