package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for the named queries to
  * `<outDir>/<name>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/`.
  *
  * Usage: `runMain graft.PlanDump q_a,q_b <outDir> <tag> [sfDir]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
