package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Brute force is the exactness baseline: broadcast the (small) query set,
  * score every candidate with the codegen'd [[VectorFunctions.CosineSimExpr]]
  * kernel, per-query top-k via window. Cost is |Q|·|C| — fine for small Q at
  * any C because candidates stream through executors with no shuffle except
  * the final per-query top-k (k rows per partition per query after the
  * window's partial rank).
  *
  * The scale path is SRP/LSH bucketing: candidates shuffle once on a
  * sign-random-projection bucket key; queries probe only their own bucket.
  * Recall < 1 by construction (the IVF/LSH trade) — same shape as a
  * multi-probe IVF index at 100 TB.
  */
object Ann {

  def registerKernels(df: DataFrame): Unit =
    VectorFunctions.register(df.sparkSession)

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = candidates.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** IVF (inverted-file) variant: candidates are partitioned into cells by
    * nearest centroid; a query probes only its `nProbe` closest cells. The
    * coarse quantizer here picks the `nCentroids` lowest-id candidate
    * vectors as centroids — deterministic, so the DuckDB oracle reproduces
    * cell assignment exactly; a production build swaps in k-means centroids
    * without touching the dataflow (assign = argmax-cosine either way).
    * At 100 TB the cell assignment is the partitioning key of the stored
    * index: a probe reads nProbe/nCentroids of the data. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    registerKernels(queries)
    val cands = candidates.select(col("vec_id"), col("embedding"))
    val centroids = cands.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .localCheckpoint(true)
    def nearestCells(df: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("csim", VectorFunctions.cosineSim(col(vecCol), col("ce")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid").asc)
      scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= n)
        .drop("ce", "csim", "crank")
    }
    val assigned = nearestCells(cands, "vec_id", "embedding", 1) // cell per candidate
    val probes = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", nProbe)
    val scored = assigned.join(probes, Seq("cid")) // probe only matching cells
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** LSH-bucketed variant: neighbors are only searched within the query's
    * SRP bucket. Returns the same shape; recall trades against the crossJoin. */
  def srpBucketTopK(queries: DataFrame, candidates: DataFrame,
                    k: Int, bits: Int, dims: Int): DataFrame = {
    registerKernels(queries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("bucket"))
    val c = candidates.select(col("vec_id"), col("embedding"),
      VectorFunctions.srpBucket(col("embedding"), bits, dims).as("bucket"))
    val scored = c.join(q, Seq("bucket")) // shuffle (or broadcast) on bucket key
      .withColumn("sim", VectorFunctions.cosineSim(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }
}
