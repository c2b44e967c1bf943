package graft

import graft.core._
import org.apache.spark.sql.functions._

/** Merge-on-write aggregate property + mutation semantics — the
  * PropertyCoreTest family of the reference (SURVEY §5). */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  val schema = GraphSchema(
    propertyKeys = Seq(
      PropertyKeyDef("peak", GraphDataType.INT, aggregateType = AggregateType.MAX),
      PropertyKeyDef("floor", GraphDataType.INT, aggregateType = AggregateType.MIN),
      PropertyKeyDef("total", GraphDataType.LONG, aggregateType = AggregateType.SUM),
      PropertyKeyDef("origin", GraphDataType.TEXT, aggregateType = AggregateType.OLD),
      PropertyKeyDef("tags", GraphDataType.TEXT, cardinality = Cardinality.SET,
        aggregateType = AggregateType.SET),
      PropertyKeyDef("log", GraphDataType.TEXT, cardinality = Cardinality.LIST,
        aggregateType = AggregateType.LIST),
      PropertyKeyDef("plain", GraphDataType.TEXT)),
    vertexLabels = Seq(VertexLabelDef("m",
      Seq("peak", "floor", "total", "origin", "tags", "log", "plain"))),
    edgeLabels = Nil)

  val props = Seq("peak", "floor", "total", "origin", "tags", "log", "plain")

  def row(id: String, peak: Int, floor: Int, total: Long, origin: String,
          tags: Seq[String], log: Seq[String], plain: String) =
    (id, "m", peak, floor, total, origin, tags, log, plain)

  test("aggregate-type merge on re-write (MAX/MIN/SUM/OLD/SET/LIST/overwrite)") {
    val v0 = Seq(row("x", 10, 10, 100L, "first", Seq("a"), Seq("l1"), "p1"))
      .toDF("id", "label", "peak", "floor", "total", "origin", "tags", "log", "plain")
    val v1 = Seq(row("x", 5, 5, 50L, "second", Seq("b", "a"), Seq("l2"), "p2"))
      .toDF("id", "label", "peak", "floor", "total", "origin", "tags", "log", "plain")

    val merged = Mutations.upsertVertices(v0, v1, schema, props).head()
    assert(merged.getAs[Int]("peak") === 10)       // MAX keeps 10
    assert(merged.getAs[Int]("floor") === 5)       // MIN takes 5
    assert(merged.getAs[Long]("total") === 150L)   // SUM accumulates
    assert(merged.getAs[String]("origin") === "first")  // OLD keeps first write
    assert(merged.getSeq[String](merged.fieldIndex("tags")) === Seq("a", "b")) // SET distinct
    assert(merged.getSeq[String](merged.fieldIndex("log")) === Seq("l1", "l2")) // LIST append
    assert(merged.getAs[String]("plain") === "p2") // NONE overwrites
  }

  test("upsert inserts brand-new ids") {
    val v0 = Seq(row("x", 1, 1, 1L, "o", Seq("t"), Seq("l"), "p"))
      .toDF("id", "label", "peak", "floor", "total", "origin", "tags", "log", "plain")
    val v1 = Seq(row("y", 2, 2, 2L, "o2", Seq("t2"), Seq("l2"), "p2"))
      .toDF("id", "label", "peak", "floor", "total", "origin", "tags", "log", "plain")
    val out = Mutations.upsertVertices(v0, v1, schema, props)
    assert(out.count() === 2L)
  }

  test("eliminate removes values from a collection property") {
    val df = Seq(("x", Seq("a", "b", "c"))).toDF("id", "tags")
    val out = Mutations.eliminateValues(df, "tags", Seq("b")).head()
    assert(out.getSeq[String](1) === Seq("a", "c"))
  }

  test("delete vertices cascades to their edges") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val left = Mutations.deleteEdgesOf(edges, Seq("b"))
    assert(left.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("c", "d")))
  }

  test("unique constraint check finds duplicate key groups") {
    val df = Seq(("v1", "k1"), ("v2", "k1"), ("v3", "k2")).toDF("id", "key")
    val v = Mutations.uniqueViolations(df, Seq("key")).collect()
    assert(v.length === 1)
    assert(v(0).getAs[String]("key") === "k1")
    assert(v(0).getSeq[String](v(0).fieldIndex("ids")) === Seq("v1", "v2"))
  }

  test("TTL vacuum keeps live and null-ttl rows") {
    val df = Seq(("a", 100L), ("b", 300L)).toDF("id", "~ttl_expiry")
      .union(Seq(("c", null.asInstanceOf[java.lang.Long])).toDF("id", "~ttl_expiry"))
    assert(ids(Mutations.vacuumExpired(df, nowMillis = 200L)) === Set("b", "c"))
  }

  test("variables KV store") {
    var vars = Seq.empty[(String, String)].toDF("key", "value")
    vars = Variables.set(vars, "k", "v1")
    vars = Variables.set(vars, "k", "v2")
    assert(Variables.get(vars, "k") === Some("v2"))
    vars = Variables.remove(vars, "k")
    assert(Variables.get(vars, "k") === None)
  }

  test("schema JSON round-trips the meta-types") {
    val json = schema.toJson
    assert(json.contains("\"aggregateType\":\"MAX\""))
    assert(json.contains("\"cardinality\":\"SET\""))
    assert(ModernGraph.schema.toJson.contains("\"sortKeys\":[\"date\"]"))
    // full parse-back equality (fromJson is the REST-wire inverse)
    assert(GraphSchema.fromJson(json) === schema)
    assert(GraphSchema.fromJson(ModernGraph.schema.toJson) === ModernGraph.schema)
    // ttl + nullableKeys survive the wire (reference schema JSON "ttl")
    val ttlSchema = GraphSchema(Nil,
      Seq(VertexLabelDef("s", Nil, nullableKeys = Seq("nick"), ttlMillis = 86400000L)),
      Seq(EdgeLabelDef("e", "s", "s", ttlMillis = 3600000L)))
    val ttlBack = GraphSchema.fromJson(ttlSchema.toJson)
    assert(ttlBack === ttlSchema)
    assert(ttlBack.vertexLabels.head.ttlMillis === 86400000L)
    assert(ttlBack.edgeLabels.head.ttlMillis === 3600000L)
  }

  val subSchema = GraphSchema(
    propertyKeys = Nil,
    vertexLabels = Seq(VertexLabelDef("person", Nil), VertexLabelDef("acct", Nil)),
    edgeLabels = Seq(
      EdgeLabelDef("transfer", "person", "acct", isParent = true),
      EdgeLabelDef("wire", "person", "acct", father = Some("transfer")),
      EdgeLabelDef("card", "person", "acct", father = Some("transfer")),
      EdgeLabelDef("owns", "person", "acct")))

  test("father/sub edge labels: JSON round-trip carries fatherId + type") {
    val json = subSchema.toJson
    assert(json.contains("\"edgeLabelType\":\"PARENT\""))
    assert(json.contains("\"fatherId\":\"transfer\""))
    val back = GraphSchema.fromJson(json)
    assert(back === subSchema)
    assert(back.edgeLabel("wire").father === Some("transfer"))
    assert(back.edgeLabel("wire").edgeLabelType === "SUB")
    assert(back.edgeLabel("transfer").isParent)
    assert(back.subLabels("transfer").map(_.name) === Seq("wire", "card"))
    assert(back.edgeLabel("wire").storedLabel === "transfer")
    assert(back.edgeLabel("owns").storedLabel === "owns")
  }

  test("father/sub routing: sub label filters (label=father, sub_label=sub); father matches all subs") {
    // edges stored under the FATHER label with sub_label discriminator
    val edges = Seq(
      ("p1", "a1", "transfer", "wire", null.asInstanceOf[String]),
      ("p1", "a2", "transfer", "card", null.asInstanceOf[String]),
      ("p2", "a1", "transfer", "wire", null.asInstanceOf[String]),
      ("p2", "a3", "owns", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("src", "dst", "label", "sub_label", "sort_values")
    val verts = Seq(("p1", "person"), ("p2", "person")).toDF("id", "label")
    val g = PropertyGraph(verts, edges, subSchema)
    def pairs(labels: String*) =
      g.adjacency(Direction.OUT, labels).select("src", "dst")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs("wire") === Set(("p1", "a1"), ("p2", "a1")))
    assert(pairs("card") === Set(("p1", "a2")))
    assert(pairs("transfer") === Set(("p1", "a1"), ("p1", "a2"), ("p2", "a1")))
    assert(pairs("owns") === Set(("p2", "a3")))
    assert(pairs("wire", "owns") === Set(("p1", "a1"), ("p2", "a1"), ("p2", "a3")))
    // schema-link metadata: the father links wherever its subs link
    assert(subSchema.canLink("transfer", "person"))
    assert(subSchema.canLink("wire", "person"))
    assert(!subSchema.canLink("wire", "acct"))
  }

  test("schema-link pruning metadata") {
    val s = ModernGraph.schema
    assert(s.canLink("knows", "person"))
    assert(!s.canLink("knows", "software"))
    assert(s.outEdgeLabels("person").map(_.name).toSet === Set("knows", "created"))
    assert(s.inEdgeLabels("software").map(_.name) === Seq("created"))
  }

  test("CUSTOMIZE_UUID ids are exactly java.util.UUID.nameUUIDFromBytes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val names = Seq("customer:1", "order:42", "图数据库", "", "a|b:c")
    val got = names.toDF("n").select(col("n"), IdSplicer.uuidId(col("n")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (n <- names)
      assert(got(n) ===
        java.util.UUID.nameUUIDFromBytes(n.getBytes("UTF-8")).toString)
  }
}
