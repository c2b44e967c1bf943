package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutation semantics (SURVEY §2.1 sinks): the reference's write path is a
  * transactional KV mutation buffer (`GraphTransaction.addVertex:617`,
  * `Action` enum INSERT/APPEND/ELIMINATE/DELETE, merge-on-write aggregate
  * properties `checkAggregateProperty:345-467`). The columnar equivalent is
  * batch reconciliation: union the incoming batch with the current table and
  * resolve per (id, property) using the schema's aggregate types. Writers
  * append parquet; compaction = this reconciliation job. No locks, no
  * per-row commit — the 500-row COMMIT_BATCH machinery dissolves into batch
  * dataflow.
  *
  * Write-order: every batch carries a monotonically increasing `~seq`
  * column; OLD keeps the value of the smallest, NONE (overwrite) the
  * largest. This replaces the reference's wall-clock write order with an
  * explicit, reproducible one.
  */
object Mutations {

  val SeqCol = "~seq"

  /** Resolve a multi-version vertex/edge table into one row per id,
    * applying each property's AggregateType. `propCols` lists the payload
    * columns (everything except id/label/~seq). */
  def reconcile(versions: DataFrame, schema: GraphSchema,
                idCols: Seq[String], propCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = propCols.map { p =>
      val pk = schema.propertyKeys.find(_.name == p)
      val agg = pk.map(_.aggregateType).getOrElse(AggregateType.NONE)
      val card = pk.map(_.cardinality).getOrElse(Cardinality.SINGLE)
      val c = col(p)
      (agg, card) match {
        case (AggregateType.MAX, _) => max(c).as(p)
        case (AggregateType.MIN, _) => min(c).as(p)
        case (AggregateType.SUM, _) => sum(c).as(p)
        // OLD = first written non-null value
        case (AggregateType.OLD, _) =>
          min_by(c, when(c.isNotNull, col(SeqCol))).as(p)
        // SET cardinality / aggregate: distinct union of all written arrays
        case (AggregateType.SET, _) | (_, Cardinality.SET) =>
          array_sort(array_distinct(flatten(collect_list(c)))).as(p)
        // LIST: concatenation in write order
        case (AggregateType.LIST, _) | (_, Cardinality.LIST) =>
          flatten(array_sort(collect_list(struct(col(SeqCol), c))).getField(p)).as(p)
        // NONE: overwrite — latest non-null write wins
        case _ => max_by(c, when(c.isNotNull, col(SeqCol))).as(p)
      }
    }
    val lbl = max_by(col("label"), col(SeqCol)).as("label")
    versions.groupBy(idCols.map(col): _*).agg(lbl, aggs: _*)
  }

  /** INSERT/APPEND: append a batch (stamped with the next `~seq`) and
    * reconcile. */
  def upsertVertices(current: DataFrame, batch: DataFrame,
                     schema: GraphSchema, propCols: Seq[String]): DataFrame = {
    val cur = if (current.columns.contains(SeqCol)) current
      else current.withColumn(SeqCol, lit(0L))
    val nextSeq = 1L + cur.agg(max(col(SeqCol))).head().getLong(0)
    val stamped = batch.withColumn(SeqCol, lit(nextSeq))
    reconcile(cur.unionByName(stamped), schema, Seq("id"), propCols)
      .withColumn(SeqCol, lit(nextSeq))
  }

  /** ELIMINATE on a collection property: remove the given values (SET/LIST
    * cardinality, reference Action.ELIMINATE). */
  def eliminateValues(df: DataFrame, prop: String, values: Seq[Any]): DataFrame =
    df.withColumn(prop, array_except(col(prop), array(values.map(lit): _*)))

  /** DELETE by id. */
  def deleteVertices(current: DataFrame, ids: Seq[String]): DataFrame =
    current.filter(!col("id").isin(ids: _*))

  /** Delete edges touching the given vertices — the reference deletes a
    * vertex's edge rows with it (`GraphTransaction.removeVertex`). */
  def deleteEdgesOf(edges: DataFrame, vertexIds: Seq[String]): DataFrame =
    edges.filter(!col("src").isin(vertexIds: _*) && !col("dst").isin(vertexIds: _*))

  /** UNIQUE index semantics as an ingest-time constraint check
    * (reference `GraphIndexTransaction.existUniqueValue:330`): returns the
    * violating key groups (empty ⇒ constraint holds). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"),
        array_sort(collect_list(col("id"))).as("ids"))
      .filter(col("n") > 1)

  /** TTL vacuum: drop expired rows given an expiry-millis column
    * (reference SchemaLabel.ttl + Query.showExpired). */
  def vacuumExpired(df: DataFrame, nowMillis: Long, ttlCol: String = "~ttl_expiry"): DataFrame =
    if (!df.columns.contains(ttlCol)) df
    else df.filter(col(ttlCol).isNull || col(ttlCol) > lit(nowMillis))

  // ---- batch write surface shared by the frontends (Cypher CREATE/MERGE,
  // Gremlin addV/addE/drop — reference GraphTransaction.addVertex:617 /
  // addEdge / removeVertex; Action enum) ----

  /** Derive a vertex id: the schema's PRIMARY_KEY splice over the given
    * properties (`label:key[!key…]` — [[IdSplicer]]'s contract), or an
    * explicit `id` property when the label's key columns aren't node
    * properties. */
  def deriveVertexId(schema: GraphSchema, label: String,
                     props: Map[String, Any]): String = {
    val vl = schema.vertexLabels.find(_.name == label).getOrElse(
      sys.error(s"unknown vertex label '$label' (closed schema)"))
    if (vl.primaryKeys.nonEmpty && vl.primaryKeys.forall(props.contains))
      label + ":" + vl.primaryKeys.map(k => props(k).toString).mkString("!")
    else props.getOrElse("id", sys.error(
      s"cannot derive an id for (:$label …): give every primary-key " +
        "property or an explicit id")).toString
  }

  /** Batch NODE insert: build the null-padded batch, detect conflicts with
    * one join, union. `merge = false` (CREATE/addV) rejects ANY id
    * collision; `merge = true` is the MERGE contract — a same-id row whose
    * given properties all agree is a no-op, a disagreeing one is a loud
    * conflict (PRIMARY_KEY ids cannot host a second node), absent ids
    * insert. Batch shapes throughout — one conflict join + one anti join,
    * no per-row probing. Rows are (id, label, props). */
  def insertVertexBatch(g: PropertyGraph,
                        rows: Seq[(String, String, Map[String, Any])],
                        merge: Boolean, kw: String): PropertyGraph = {
    require(rows.map(_._1).distinct.length == rows.length,
      s"$kw batch contains duplicate ids: " +
        rows.map(_._1).diff(rows.map(_._1).distinct).mkString(", "))
    rows.flatMap(_._3.keys).distinct.foreach(k =>
      require(g.vertices.columns.contains(k),
        s"unknown property '$k' (the columnar schema is closed)"))
    val spark = g.vertices.sparkSession
    import spark.implicits._
    var batch = rows.map(r => (r._1, r._2)).toDF("id", "label")
    val propCols = g.vertices.columns.filterNot(Set("id", "label")).toSeq
    propCols.foreach { c =>
      val dt = g.vertices.schema(c).dataType
      val vals = rows.map(_._3.get(c))
      batch = batch.withColumn(c,
        coalesce((rows.map(_._1) zip vals).foldLeft(lit(null).cast(dt)) {
          case (acc, (id, Some(value))) =>
            when(col("id") === id, lit(value).cast(dt)).otherwise(acc)
          case (acc, (_, None)) => acc
        }, lit(null).cast(dt)))
    }
    if (!merge) {
      val clash = batch.join(g.vertices, Seq("id"), "left_semi")
      require(clash.isEmpty,
        s"$kw would collide with existing ids — it never upserts " +
          "(use MERGE, or the Mutations.upsertVertices merge path)")
      g.copy(vertices = g.vertices
        .unionByName(batch.select(g.vertices.columns.map(col): _*)))
    } else {
      val existing = g.vertices.select(
        (col("id") +: col("label").as("__vl") +:
          propCols.map(c => col(c).as(s"__v_$c"))): _*)
      val matched = batch.join(existing, Seq("id"))
      val conflict = (col("label") =!= col("__vl")) +: propCols.map(c =>
        col(c).isNotNull &&
          (col(s"__v_$c").isNull || col(s"__v_$c") =!= col(c)))
      require(matched.filter(conflict.reduce(_ || _)).isEmpty,
        s"$kw conflicts with an existing node: same id, different " +
          "label or property values (PRIMARY_KEY ids cannot host a " +
          "second node — change the properties or use SET)")
      val fresh = batch.join(g.vertices, Seq("id"), "left_anti")
      g.copy(vertices = g.vertices
        .unionByName(fresh.select(g.vertices.columns.map(col): _*)))
    }
  }

  /** Batch EDGE insert (Gremlin addE / Cypher relationship MERGE's create
    * side — reference `GraphTransaction.addEdge`): `pairs` is a (src, dst)
    * frame (one row per new edge), `props` the LITERAL property map shared
    * by the batch. Both endpoints must exist (two anti-join probes — addE
    * never creates vertices); a SINGLE-frequency label rejects a duplicate
    * (src, dst) loudly (reference Frequency.SINGLE), a MULTIPLE label
    * appends (sort-key distinguished). sort_values splices the label's
    * sortKeys from the given props. */
  def insertEdges(g: PropertyGraph, label: String, pairs: DataFrame,
                  props: Map[String, Any]): PropertyGraph = {
    val defs = g.schema.edgeLabels.filter(_.name == label)
    require(defs.nonEmpty, s"unknown edge label '$label' (closed schema)")
    val edgeCols = g.edges.columns.toSeq
    props.keys.foreach(k => require(edgeCols.contains(k),
      s"unknown edge property '$k' (the columnar schema is closed)"))
    val p = pairs.select(col("src"), col("dst"))
    require(p.join(g.vertices.select(col("id").as("src")), Seq("src"),
      "left_anti").isEmpty,
      s"addE('$label'): a source vertex does not exist (addE never " +
        "creates vertices)")
    require(p.join(g.vertices.select(col("id").as("dst")), Seq("dst"),
      "left_anti").isEmpty,
      s"addE('$label'): a target vertex does not exist (addE never " +
        "creates vertices)")
    if (!defs.exists(_.multiple)) {
      require(p.count() == p.distinct().count(),
        s"addE batch contains duplicate (src, dst) pairs for " +
          s"SINGLE-frequency label '$label'")
      val existing = g.edges.filter(col("label") === label)
        .select(col("src"), col("dst"))
      require(p.join(existing, Seq("src", "dst"), "left_semi").isEmpty,
        s"addE would duplicate an existing '$label' edge — the label is " +
          "SINGLE frequency (reference Frequency.SINGLE); drop the old " +
          "edge first or use a MULTIPLE label")
    }
    val sortKeys = defs.flatMap(_.sortKeys).distinct
    val sortVal =
      if (sortKeys.nonEmpty && sortKeys.forall(props.contains))
        lit(sortKeys.map(k => props(k).toString).mkString("!"))
      else lit(null).cast("string")
    var batch = p.withColumn("label", lit(label))
    if (edgeCols.contains("sort_values"))
      batch = batch.withColumn("sort_values", sortVal)
    edgeCols.filterNot(Set("src", "dst", "label", "sort_values")).foreach { c =>
      val dt = g.edges.schema(c).dataType
      batch = batch.withColumn(c,
        props.get(c).map(v => lit(v).cast(dt)).getOrElse(lit(null).cast(dt)))
    }
    g.copy(edges = g.edges.unionByName(batch.select(edgeCols.map(col): _*)))
  }

  /** DETACH-drop a vertex id set: the vertices and every incident edge go
    * (three anti joins — the reference's removeVertex contract). */
  def dropVertices(g: PropertyGraph, ids: DataFrame): PropertyGraph = {
    val d = ids.select(col(ids.columns.head).as("id")).distinct()
    g.copy(
      vertices = g.vertices.join(d, Seq("id"), "left_anti"),
      edges = g.edges
        .join(d.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(d.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti"))
  }

  /** Drop edges by CONTENT KEY (src, dst, label[, sort_values]) — the
    * columns that identify an edge in this store (the reference's EdgeId
    * is the same splice). Null-safe equality so null sort_values matches;
    * content-identical parallel edges drop together (the stated
    * content-identity divergence). `rows` must be in STORED orientation. */
  def dropEdges(g: PropertyGraph, rows: DataFrame): PropertyGraph = {
    val keys = Seq("src", "dst", "label") ++
      (if (g.edges.columns.contains("sort_values")) Seq("sort_values") else Nil)
    val del = rows.select(keys.map(k => col(k).as(s"__d_$k")): _*).distinct()
    g.copy(edges = g.edges.join(del,
      keys.map(k => g.edges(k) <=> del(s"__d_$k")).reduce(_ && _),
      "left_anti"))
  }
}

/** Graph-variables KV store (reference `HugeVariables.java:109-391` — a
  * hidden-vertex KV table). Here: a tiny two-column DataFrame with
  * last-write-wins upsert. */
object Variables {
  def set(vars: DataFrame, key: String, value: String): DataFrame = {
    val spark = vars.sparkSession
    import spark.implicits._
    vars.filter(col("key") =!= key).unionByName(Seq((key, value)).toDF("key", "value"))
  }
  def get(vars: DataFrame, key: String): Option[String] =
    vars.filter(col("key") === key).collect().headOption.map(_.getString(1))
  def remove(vars: DataFrame, key: String): DataFrame =
    vars.filter(col("key") =!= key)
}
