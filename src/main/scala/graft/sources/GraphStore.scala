package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphSchema, PropertyGraph}

/** Parquet-backed graph storage (SURVEY §2.1 sinks / §1.5 layout).
  *
  * Layout decisions, with the 100 TB rationale:
  *  - vertices and edges are parquet datasets PARTITIONED BY `label`: a
  *    label-filtered scan (every traversal step has one) prunes to its
  *    partition directories — the columnar replacement for the reference's
  *    per-label row prefixes;
  *  - edges are additionally REPARTITIONED by `src` within each label so a
  *    frontier join reads co-located adjacency runs (at cluster scale this
  *    becomes `bucketBy(src)` on a catalog table, giving shuffle-free
  *    frontier joins);
  *  - edges are stored ONCE (no IN duplication — PropertyGraph derives the
  *    reversed view);
  *  - the schema document rides along as JSON, so a store is self-describing.
  */
object GraphStore {

  def save(g: PropertyGraph, dir: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    g.vertices.write.mode(mode).partitionBy("label").parquet(s"$dir/vertices")
    g.edges.repartition(col("src")).write.mode(mode)
      .partitionBy("label").parquet(s"$dir/edges")
    val spark = g.vertices.sparkSession
    import spark.implicits._
    Seq(g.schema.toJson).toDF("schema_json").coalesce(1)
      .write.mode(mode).json(s"$dir/schema")
  }

  def load(spark: SparkSession, dir: String, schema: GraphSchema): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(s"$dir/vertices"),
      spark.read.parquet(s"$dir/edges"),
      schema)

  /** Catalog-table edge store bucketed by `src` — the cluster-scale layout:
    * a frontier ⋈ edges join hash-partitions only the (small) frontier side;
    * the edge table's bucketing IS its partitioning, so the big side never
    * shuffles, on any number of frontier joins against it. `sortBy(src)`
    * additionally gives sort-merge joins pre-sorted runs. */
  def saveBucketedEdges(edges: DataFrame, table: String, buckets: Int): Unit =
    edges.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(table)

  def loadBucketedEdges(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Append a mutation batch to the edge log; readers see it immediately,
    * compaction is Mutations.reconcile over the unioned log. */
  def appendEdges(batch: DataFrame, dir: String): Unit =
    batch.write.mode(SaveMode.Append).partitionBy("label").parquet(s"$dir/edges")

  /** CSV/JSON ingestion of external vertex/edge files into the graph layout
    * (the hugegraph-loader role). */
  /** Shard enumeration (reference `backend/store/Shard.java:25,34` — a
    * shard is a `(start, end, length)` token-range slice the scanner
    * hands to parallel workers). Here the token space is the 16-bit
    * md5-derived [[graft.ops.Packing.hash16]] of the element id — a
    * deterministic, engine-portable stand-in for the backends' own id
    * hashing — split into `nShards` equal ranges. Returns one row per
    * non-empty shard: `(shard, start, end, length, min_id, max_id)`; a
    * consumer scans shard s with `hash16(id) BETWEEN start AND end`, the
    * `IdRangeQuery`/SCAN-token surface. One aggregation, no shuffle
    * beyond it. */
  def shardSplits(elements: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val width = 65536L / nShards
    val tok = graft.ops.Packing.hash16(col(idCol))
    elements.select(col(idCol).as("id"), (tok / width).cast("long").as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("length"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .select(col("shard"), (col("shard") * width).as("start"),
        ((col("shard") + 1) * width - 1).as("end"),
        col("length"), col("min_id"), col("max_id"))
  }

  def ingestCsv(spark: SparkSession, path: String, headerTrue: Boolean = true): DataFrame =
    spark.read.option("header", headerTrue.toString).option("inferSchema", "true").csv(path)
  def ingestJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
