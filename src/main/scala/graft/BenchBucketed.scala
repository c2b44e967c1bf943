package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev benchmark: measures what the bucketed edge store buys END TO END on
  * the workload it exists for — repeated frontier joins against a stored
  * edge relation that is NOT pinned in memory. This is the 100 TB case: a
  * cluster cannot localCheckpoint a 100 TB edge table, so every BFS hop
  * re-reads the store; with a plain parquet layout each hop must hash-
  * partition the edge side (full shuffle of the big table per query),
  * while a `bucketBy(src)` catalog table is already partitioned on the
  * join key — only the (small) frontier side ever moves.
  *
  * StoreAndPlansSpec proves the one-Exchange plan shape; this main turns
  * it into wall-clock numbers for EXPLAINS.md.
  *
  * Usage: runMain graft.BenchBucketed [sfDir] [hops] [buckets]
  */
object BenchBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val hops = if (args.length > 1) args(1).toInt else 4
    val buckets = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = graft.core.TpchGraph.build(spark, sfDir)
    val edgeCols = g.edges.select(col("src"), col("dst"))

    // store both layouts
    val plainDir = "/tmp/graft_bench_plain_edges"
    edgeCols.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(plainDir)
    spark.sql("DROP TABLE IF EXISTS bench_bucketed_edges")
    // a crashed previous run can leave the managed location behind
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path("spark-warehouse/bench_bucketed_edges"), true)
    graft.sources.GraphStore.saveBucketedEdges(edgeCols, "bench_bucketed_edges", buckets)

    // frontier seeds: every 100th customer
    val seeds = graft.core.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 100 === 0)
      .select(concat(lit("customer:"), col("c_custkey").cast("string")).as("id"))

    def bfs(edges: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      var frontier = seeds
      var n = 0L
      for (_ <- 1 to hops) {
        frontier = frontier.select(col("id").as("src"))
          .join(edges, Seq("src"))
          .select(col("dst").as("id")).distinct()
          .localCheckpoint(true)
        n = frontier.count()
      }
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warm both sources once (footers/codegen), then measure
    spark.read.parquet(plainDir).count()
    spark.table("bench_bucketed_edges").count()
    bfs(spark.read.parquet(plainDir))
    val (tPlain, nPlain) = bfs(spark.read.parquet(plainDir))
    bfs(spark.table("bench_bucketed_edges"))
    val (tBucketed, nBucketed) = bfs(spark.table("bench_bucketed_edges"))
    require(nPlain == nBucketed, s"result mismatch: $nPlain vs $nBucketed")

    println(f"""{"metric":"bucketed_frontier_join","sf":"$sfDir","hops":$hops,""" +
      f""""plain_sec":$tPlain%.2f,"bucketed_sec":$tBucketed%.2f,""" +
      f""""frontier_rows":$nPlain,"speedup":${tPlain / tBucketed}%.2f}""")
    spark.stop()
  }
}
