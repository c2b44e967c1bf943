package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Dev-only profiler: run ONE query N times and print per-job wall-clock so
  * we can see where iterative algorithms spend their time. Not part of the
  * driver contract. Usage: runMain graft.BenchOne <queryName> [sfDir] [reps] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", cpus))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("SPARK_GRAFT_PF", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.env.getOrElse("SPARK_GRAFT_ADV", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = mutable.Map[Int, Long]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Int)]() // id, millis, numStages
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach(t0 => jobs.synchronized {
          jobs += ((j.jobId, j.time - t0, 0))
        })
    })

    // identical warm-up to the driver-facing Bench, so rep-0 here matches
    // the cold state the driver actually measures (SPARK_GRAFT_NOWARM=1
    // skips it, to isolate a query from the shared working set)
    if (!sys.env.get("SPARK_GRAFT_NOWARM").contains("1"))
      Bench.warmup(spark, sfDir)
    else
      spark.range(100000L).selectExpr("sum(id)").collect()
    for (nm <- name.split(',')) {
      val fn = SparkEntry.queries(nm)
      for (r <- 0 until reps) {
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val js = jobs.synchronized(jobs.toList)
        println(f"[benchone] rep=$r $nm rows=$n total=$sec%.2fs jobs=${js.size}")
        js.sortBy(-_._2).take(12).foreach { case (id, ms, _) =>
          println(f"[benchone]   job $id%3d  ${ms / 1000.0}%6.2fs")
        }
      }
    }
    spark.stop()
  }
}
