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

  // --------------------------------------------------------------------
  // Persisted trained artifacts
  // --------------------------------------------------------------------

  /** Directory of one persisted artifact: `dir/artifacts/<kind>/<h>` with
    * `h` a stable hash of the hyper-parameter map, so the same (kind,
    * params) always resolves to the same path and different params never
    * collide. */
  private def artifactPath(dir: String, kind: String,
                           params: Map[String, String]): String = {
    val canon = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
    val h = md.take(6).map("%02x".format(_)).mkString
    s"$dir/artifacts/$kind/$h"
  }

  /** Persist a TRAINED ARTIFACT — IVF centroids, PQ reconstructions,
    * landmark distance vectors, classifier weights — as self-describing
    * parquet next to the graph/corpus: `data/` holds the rows, `meta/` a
    * one-row JSON sidecar with the kind and full hyper-parameter map. The
    * operational 100 TB story: the index build is the dominant offline
    * cost, so a deployment trains once, saves here, and every later
    * session LOADS and probes instead of retraining (the reference
    * persists algorithm outputs as OLAP properties for exactly this
    * reason — `type/define/WriteType.java:20-35`, `GraphReadMode.java:26`
    * let reads consume stored OLAP results). Consumers seed their session
    * memos through the family-level loaders ([[graft.ops.Ann.loadIndex]],
    * [[graft.olap.Algorithms.loadLandmarkIndexes]],
    * [[graft.ops.Corpus.loadClassifier]]), which are bit-equal to the
    * trained path by construction: the saved rows ARE the trained rows
    * (rounded-6 doubles round-trip parquet exactly). */
  def saveArtifact(df: DataFrame, dir: String, kind: String,
                   params: Map[String, String],
                   info: Map[String, String] = Map.empty): Unit = {
    val path = artifactPath(dir, kind, params)
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    val spark = df.sparkSession
    import spark.implicits._
    // `info` is OBSERVABILITY metadata (training diagnostics like dropped
    // null-vector counts) — recorded, readable via [[artifactInfo]], but
    // never part of the load-time identity check (params are)
    Seq((kind, paramsJson(params), paramsJson(info)))
      .toDF("kind", "params_json", "info_json").coalesce(1)
      .write.mode(SaveMode.Overwrite).json(s"$path/meta")
  }

  private def paramsJson(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  /** DATASET-IDENTITY param every family loader folds into its artifact
    * key: the semantic hash of the input frame's analyzed plan. The same
    * code constructing the same source (same paths, same projections)
    * hashes identically in a later cold session, while a different scale
    * factor / corpus / store mode yields a different hash — so an
    * artifact trained on one dataset can never silently load for another
    * (it re-trains instead). Plan-hash stability is per Spark version:
    * an upgrade re-trains, which is the safe direction. */
  def inputIdentity(df: DataFrame): (String, String) =
    "input_plan" -> df.queryExecution.analyzed.semanticHash().toString

  /** Collision-free param-key encoding of a string list: length-prefixed
    * elements, so `Seq("a,b")` and `Seq("a", "b")` — or ids containing any
    * separator character — can never produce the same key (the md5/param
    * key is the only discriminator between artifacts of one kind). */
  def keyOfList(xs: Seq[String]): String =
    xs.map(x => s"${x.length}:$x").mkString(";")

  /** Load a persisted artifact, or None when (kind, params) was never
    * saved under `dir` — including every recoverable-by-retrain state:
    * a half-written artifact (data without its meta sidecar, or a meta
    * dir whose JSON never committed — a crash between the writes), an
    * unreadable/schema-less meta, or a params_json mismatch (a
    * truncated-hash collision between two param sets of the same kind).
    * In all of those the load DECLINES (with a stderr note) and the
    * caller's build-and-save path repairs the slot. The ONLY loud failure
    * is a KIND mismatch at the path — the path embeds the kind, so that
    * is a hand-moved/foreign directory, and silently retraining over it
    * would destroy someone else's artifact. */
  def loadArtifact(spark: SparkSession, dir: String, kind: String,
                   params: Map[String, String]): Option[DataFrame] = {
    val path = artifactPath(dir, kind, params)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ok(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    if (!ok(s"$path/data") || !ok(s"$path/meta")) None
    else readMeta(spark, path) match {
      case None =>
        System.err.println(s"[artifacts] $path: meta unreadable/empty " +
          "(half-written artifact) — declining load, retrain will repair")
        None
      case Some((k, _, _)) if k != kind =>
        sys.error(s"artifact at $path has kind=$k, expected $kind — " +
          "a foreign/hand-moved directory; refusing to touch it")
      case Some((_, pj, _)) if pj != paramsJson(params) =>
        System.err.println(s"[artifacts] $path: params mismatch (truncated-" +
          s"hash collision): stored $pj, requested ${paramsJson(params)} — " +
          "declining load")
        None
      case _ => Some(spark.read.parquet(s"$path/data"))
    }
  }

  /** The meta row at an artifact path, or None when absent/unreadable:
    * (kind, params_json, info_json). Pre-info artifacts (no info_json
    * column) read as "{}". */
  private def readMeta(spark: SparkSession,
                       path: String): Option[(String, String, String)] =
    try {
      val df = spark.read.json(s"$path/meta")
      val withInfo =
        if (df.columns.contains("info_json")) df
        else df.withColumn("info_json", lit("{}"))
      withInfo.select(col("kind"), col("params_json"), col("info_json"))
        .collect().headOption
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Observability metadata recorded at [[saveArtifact]] time (the
    * unverified `info` map), parsed back; empty when the artifact is
    * missing or carries none. */
  def artifactInfo(spark: SparkSession, dir: String, kind: String,
                   params: Map[String, String]): Map[String, String] = {
    val path = artifactPath(dir, kind, params)
    readMeta(spark, path).map(m => parseFlatJson(m._3)).getOrElse(Map.empty)
  }

  /** Parse the flat {"k":"v",…} JSON [[paramsJson]] emits (escaped quotes/
    * backslashes/control chars per [[esc]]). */
  private def parseFlatJson(j: String): Map[String, String] = {
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        } else { sb += s(i); i += 1 }
      }
      sb.result()
    }
    re.findAllMatchIn(j).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  /** One row of the artifact-store catalog ([[listArtifacts]]). */
  final case class ArtifactEntry(kind: String, hash: String, path: String,
                                 params: Map[String, String],
                                 info: Map[String, String],
                                 dataBytes: Long, modifiedMillis: Long,
                                 complete: Boolean)

  /** Enumerate everything saved under `dir/artifacts` — the admin surface
    * a long-lived deployment needs to SEE what is stored (the reference
    * exposes its OLAP write-backs through schema listings the same way).
    * Half-written slots (data without readable meta) list with
    * `complete = false` so [[gcArtifacts]] can reap them. */
  def listArtifacts(spark: SparkSession, dir: String): Seq[ArtifactEntry] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/artifacts")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    for {
      kindDir <- fs.listStatus(root).toSeq if kindDir.isDirectory
      slot <- fs.listStatus(kindDir.getPath).toSeq if slot.isDirectory
    } yield {
      val p = slot.getPath
      val meta = readMeta(spark, p.toString)
      val dataPath = new org.apache.hadoop.fs.Path(p, "data")
      val bytes =
        if (fs.exists(dataPath)) fs.getContentSummary(dataPath).getLength else 0L
      ArtifactEntry(
        kind = kindDir.getPath.getName, hash = p.getName, path = p.toString,
        params = meta.map(m => parseFlatJson(m._2)).getOrElse(Map.empty),
        info = meta.map(m => parseFlatJson(m._3)).getOrElse(Map.empty),
        dataBytes = bytes,
        modifiedMillis = slot.getModificationTime,
        complete = meta.isDefined && fs.exists(dataPath))
    }
  }

  /** Reap stale artifacts: deletes every slot that is HALF-WRITTEN
    * (unreadable meta or missing data — a crashed save that a later
    * retrain never repaired because the params changed) or older than
    * `olderThanMillis` (by directory mtime, refreshed on every re-save).
    * Returns the deleted paths. `nowMillis` is explicit so callers and
    * tests control the clock. */
  def gcArtifacts(spark: SparkSession, dir: String, olderThanMillis: Long,
                  nowMillis: Long): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    listArtifacts(spark, dir).filter(a =>
      !a.complete || nowMillis - a.modifiedMillis > olderThanMillis)
      .map { a =>
        fs.delete(new org.apache.hadoop.fs.Path(a.path), true)
        a.path
      }
  }

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
