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
