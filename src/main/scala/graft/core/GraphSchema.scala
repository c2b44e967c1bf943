package graft.core

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, functions => F}

/** Schema-full property-graph schema system.
  *
  * Mirrors the reference's four explicit meta-types (SchemaManager builders,
  * reference `hugegraph-core/.../schema/SchemaManager.java:53-67`):
  * PropertyKey / VertexLabel / EdgeLabel / IndexLabel — re-expressed as plain
  * Scala case classes compiled down to Spark `StructType`s and `Column`
  * expressions. There is no physical index machinery: columnar scans +
  * Catalyst pushdown replace SECONDARY/RANGE/SHARD indexes (SURVEY §4.1);
  * SEARCH keeps its tokenizer semantics (graft.functions.TextFunctions) and
  * UNIQUE becomes an ingest-time constraint check.
  */
object GraphDataType extends Enumeration {
  /** reference `.../type/define/DataType.java:33-46` */
  val OBJECT, BOOLEAN, BYTE, INT, LONG, FLOAT, DOUBLE, TEXT, BLOB, DATE, UUID = Value

  def toSpark(t: Value): DataType = t match {
    case BOOLEAN => BooleanType
    case BYTE    => ByteType
    case INT     => IntegerType
    case LONG    => LongType
    case FLOAT   => FloatType
    case DOUBLE  => DoubleType
    case TEXT    => StringType
    case BLOB    => BinaryType
    case DATE    => TimestampType
    case UUID    => StringType // canonical hex-with-dashes form
    case OBJECT  => StringType // JSON-encoded opaque payload
  }
}

object Cardinality extends Enumeration {
  /** reference `.../type/define/Cardinality.java:24-40` */
  val SINGLE, LIST, SET = Value
}

object AggregateType extends Enumeration {
  /** Merge-on-write semantics, reference `.../type/define/AggregateType.java:20-28`.
    * Applied at ingest via `groupBy(id).agg(...)` (Mutations.mergeProperties). */
  val NONE, MAX, MIN, SUM, OLD, SET, LIST = Value
}

object IdStrategy extends Enumeration {
  /** reference `.../type/define/IdStrategy.java:20-33` */
  val AUTOMATIC, PRIMARY_KEY, CUSTOMIZE_STRING, CUSTOMIZE_NUMBER, CUSTOMIZE_UUID = Value
}

object IndexType extends Enumeration {
  /** reference `.../type/define/IndexType.java:22-42`; semantics only — no
    * physical index is materialized in the Spark engine. */
  val SECONDARY, RANGE, SEARCH, SHARD, UNIQUE = Value
}

object Direction extends Enumeration {
  /** reference `.../type/define/Directions.java:23-31` */
  val OUT, IN, BOTH = Value
}

final case class PropertyKeyDef(
    name: String,
    dataType: GraphDataType.Value,
    cardinality: Cardinality.Value = Cardinality.SINGLE,
    aggregateType: AggregateType.Value = AggregateType.NONE) {
  def sparkType: DataType = cardinality match {
    case Cardinality.SINGLE => GraphDataType.toSpark(dataType)
    case _                  => ArrayType(GraphDataType.toSpark(dataType))
  }
  def toField: StructField = StructField(name, sparkType, nullable = true)
}

final case class VertexLabelDef(
    name: String,
    properties: Seq[String],
    idStrategy: IdStrategy.Value = IdStrategy.PRIMARY_KEY,
    primaryKeys: Seq[String] = Nil,
    nullableKeys: Seq[String] = Nil,
    ttlMillis: Long = 0L)

final case class EdgeLabelDef(
    name: String,
    sourceLabel: String,
    targetLabel: String,
    properties: Seq[String] = Nil,
    /** SINGLE: at most one edge per (src,label,dst); MULTIPLE: distinguished
      * by sortKeys (reference `.../type/define/Frequency.java:20-28`). */
    multiple: Boolean = false,
    sortKeys: Seq[String] = Nil,
    ttlMillis: Long = 0L,
    /** Father/sub edge-label hierarchy (reference `EdgeLabel.java:44-55`
      * `fatherId`/`edgeLabelType`): a SUB label (`father = Some(...)`) is
      * stored under its father's `label` value with a `sub_label`
      * discriminator column; a PARENT label (`isParent = true`) matches
      * every sub stored beneath it. Query routing mirrors
      * `GraphTransaction.optimizeQuery:1607-1656`: by sub-label →
      * `label = father AND sub_label = sub`; by father → `label = father`. */
    father: Option[String] = None,
    isParent: Boolean = false) {
  /** reference `EdgeLabelType.java`: NORMAL / PARENT / SUB. */
  def edgeLabelType: String =
    if (isParent) "PARENT" else if (father.isDefined) "SUB" else "NORMAL"
  /** The `label` column value edges of this label are stored under. */
  def storedLabel: String = father.getOrElse(name)
}

final case class IndexLabelDef(
    name: String,
    baseLabel: String,
    onVertex: Boolean,
    indexType: IndexType.Value,
    fields: Seq[String])

/** The graph-level schema catalog. JSON round-trip via [[GraphSchema.toJson]]. */
final case class GraphSchema(
    propertyKeys: Seq[PropertyKeyDef],
    vertexLabels: Seq[VertexLabelDef],
    edgeLabels: Seq[EdgeLabelDef],
    indexLabels: Seq[IndexLabelDef] = Nil) {

  private val pkByName = propertyKeys.map(p => p.name -> p).toMap
  def propertyKey(name: String): PropertyKeyDef = pkByName(name)
  def vertexLabel(name: String): VertexLabelDef =
    vertexLabels.find(_.name == name).getOrElse(sys.error(s"no vertex label $name"))
  def edgeLabel(name: String): EdgeLabelDef =
    edgeLabels.find(_.name == name).getOrElse(sys.error(s"no edge label $name"))

  /** Edge labels that can start from a vertex of `vlabel` — the schema-link
    * pruning metadata (reference `GraphTransaction.optimizeQuery:1560-1589`):
    * a traversal step whose edge label cannot link the frontier's vertex
    * label is skipped without touching storage. */
  def outEdgeLabels(vlabel: String): Seq[EdgeLabelDef] =
    edgeLabels.filter(_.sourceLabel == vlabel)
  def inEdgeLabels(vlabel: String): Seq[EdgeLabelDef] =
    edgeLabels.filter(_.targetLabel == vlabel)
  /** A PARENT label links wherever any of its subs links (the reference's
    * father label carries the union of its subs' link pairs). */
  def canLink(edgeLabel: String, srcVertexLabel: String): Boolean =
    edgeLabels.exists(e =>
      (e.name == edgeLabel ||
        (e.father.contains(edgeLabel) &&
          edgeLabels.exists(p => p.name == edgeLabel && p.isParent))) &&
      e.sourceLabel == srcVertexLabel)

  /** Sub-labels declared under a father. */
  def subLabels(father: String): Seq[EdgeLabelDef] =
    edgeLabels.filter(_.father.contains(father))

  /** Compile an edge-label restriction into the routed storage predicate
    * (reference `GraphTransaction.optimizeQuery:1607-1656`): SUB labels
    * filter `label = father AND sub_label = name`; everything else filters
    * `label = name` (a PARENT's stored label matches all its subs).
    * `hasSubCol = false` (no `sub_label` column in the edge frame) falls
    * back to plain label equality — the store-feature-off path. */
  def edgeLabelCond(requested: Seq[String], hasSubCol: Boolean): Column =
    requested.map { l =>
      edgeLabels.find(_.name == l) match {
        case Some(el) if el.father.isDefined && hasSubCol =>
          (F.col("label") === el.storedLabel) && (F.col("sub_label") === l)
        case _ => F.col("label") === l
      }
    }.reduce(_ || _)

  /** Static StructType for the unioned vertices table of this schema. */
  def vertexStruct: StructType = {
    val props = vertexLabels.flatMap(_.properties).distinct.map(p => pkByName(p).toField)
    StructType(
      StructField("id", StringType, nullable = false) +:
      StructField("label", StringType, nullable = false) +: props)
  }

  def edgeStruct: StructType = {
    val props = edgeLabels.flatMap(_.properties).distinct.map(p => pkByName(p).toField)
    StructType(
      StructField("src", StringType, nullable = false) +:
      StructField("dst", StringType, nullable = false) +:
      StructField("label", StringType, nullable = false) +:
      // null for NORMAL-label edges; the sub-label name for edges stored
      // under a father label (EdgeLabelDef.father)
      StructField("sub_label", StringType, nullable = true) +:
      StructField("sort_values", StringType, nullable = true) +: props)
  }

  def toJson: String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    val pks = propertyKeys.map(p =>
      s"""{"name":"${p.name}","dataType":"${p.dataType}","cardinality":"${p.cardinality}","aggregateType":"${p.aggregateType}"}""")
    val vls = vertexLabels.map(v =>
      s"""{"name":"${v.name}","properties":${arr(v.properties)},"idStrategy":"${v.idStrategy}","primaryKeys":${arr(v.primaryKeys)},"nullableKeys":${arr(v.nullableKeys)},"ttl":${v.ttlMillis}}""")
    val els = edgeLabels.map { e =>
      val father = e.father.map(f => s""","fatherId":"$f"""").getOrElse("")
      s"""{"name":"${e.name}","sourceLabel":"${e.sourceLabel}","targetLabel":"${e.targetLabel}","properties":${arr(e.properties)},"multiple":${e.multiple},"sortKeys":${arr(e.sortKeys)},"ttl":${e.ttlMillis},"edgeLabelType":"${e.edgeLabelType}"$father}"""
    }
    val ils = indexLabels.map(i =>
      s"""{"name":"${i.name}","baseLabel":"${i.baseLabel}","onVertex":${i.onVertex},"indexType":"${i.indexType}","fields":${arr(i.fields)}}""")
    s"""{"propertyKeys":[${pks.mkString(",")}],"vertexLabels":[${vls.mkString(",")}],"edgeLabels":[${els.mkString(",")}],"indexLabels":[${ils.mkString(",")}]}"""
  }
}

object GraphSchema {
  /** Parse [[GraphSchema.toJson]] output back into the catalog — the wire
    * round-trip the reference's schema API serializes over REST. Uses the
    * json4s AST Spark already ships; unknown fields are ignored, absent
    * optional fields take the case-class defaults. */
  def fromJson(json: String): GraphSchema = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(json)
    def str(v: JValue): String = v match { case JString(s) => s; case x => x.values.toString }
    def strs(v: JValue): Seq[String] = v match {
      case JArray(xs) => xs.map(str); case _ => Nil
    }
    def objs(v: JValue): Seq[JObject] = v match {
      case JArray(xs) => xs.collect { case o: JObject => o }; case _ => Nil
    }
    def field(o: JObject, n: String): JValue =
      o.obj.find(_._1 == n).map(_._2).getOrElse(JNothing)
    def opt(o: JObject, n: String): Option[String] =
      o.obj.find(_._1 == n).collect { case (_, JString(s)) => s }
    def bool(o: JObject, n: String, dflt: Boolean = false): Boolean =
      field(o, n) match { case JBool(b) => b; case _ => dflt }
    def lng(o: JObject, n: String, dflt: Long = 0L): Long =
      field(o, n) match { case JInt(v) => v.toLong; case JLong(v) => v; case _ => dflt }
    val pks = objs(j \ "propertyKeys").map { o =>
      PropertyKeyDef(str(field(o, "name")),
        GraphDataType.withName(str(field(o, "dataType"))),
        Cardinality.withName(str(field(o, "cardinality"))),
        AggregateType.withName(str(field(o, "aggregateType"))))
    }
    val vls = objs(j \ "vertexLabels").map { o =>
      VertexLabelDef(str(field(o, "name")), strs(field(o, "properties")),
        IdStrategy.withName(str(field(o, "idStrategy"))),
        strs(field(o, "primaryKeys")),
        strs(field(o, "nullableKeys")),
        lng(o, "ttl"))
    }
    val els = objs(j \ "edgeLabels").map { o =>
      EdgeLabelDef(str(field(o, "name")), str(field(o, "sourceLabel")),
        str(field(o, "targetLabel")), strs(field(o, "properties")),
        bool(o, "multiple"), strs(field(o, "sortKeys")),
        ttlMillis = lng(o, "ttl"),
        father = opt(o, "fatherId"),
        isParent = opt(o, "edgeLabelType").contains("PARENT"))
    }
    val ils = objs(j \ "indexLabels").map { o =>
      IndexLabelDef(str(field(o, "name")), str(field(o, "baseLabel")),
        bool(o, "onVertex"), IndexType.withName(str(field(o, "indexType"))),
        strs(field(o, "fields")))
    }
    GraphSchema(pks, vls, els, ils)
  }
}

object IdSplicer {
  /** PRIMARY_KEY id strategy: id spliced from label + primary-key values —
    * mirrors reference `.../backend/id/SplicingIdGenerator.java` with a
    * readable `label:pk1:pk2` canonical form. */
  def spliceId(label: String, pkCols: Column*): Column =
    F.concat_ws(":", (F.lit(label) +: pkCols.map(_.cast(StringType))): _*)

  /** EdgeId — 6-part composite identity mirroring
    * reference `.../backend/id/EdgeId.java:31-43`. */
  def edgeId(src: Column, label: Column, sortValues: Column, dst: Column): Column =
    F.concat_ws("|", src, label, F.coalesce(sortValues, F.lit("")), dst)

  /** CUSTOMIZE_UUID id strategy: deterministic RFC 4122 name-based (v3,
    * md5) UUID in the canonical dashed form the reference's
    * `UuidId.asString` emits (`backend/id/IdGenerator.java:319,346-348`;
    * `StringEncoding.uuid` parses the same form). Bit-identical to
    * `java.util.UUID.nameUUIDFromBytes(name.getBytes)`: version nibble
    * forced to 3, variant nibble to 8-b ((n & 3) | 8) — pure codegen'd
    * string functions over `md5`, reproducible across engines. */
  def uuidId(name: Column): Column = {
    val h = F.md5(name.cast(StringType))
    F.concat(
      F.substring(h, 1, 8), F.lit("-"),
      F.substring(h, 9, 4), F.lit("-3"),
      F.substring(h, 14, 3), F.lit("-"),
      F.translate(F.substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"),
      F.substring(h, 18, 3), F.lit("-"),
      F.substring(h, 21, 12))
  }
}
