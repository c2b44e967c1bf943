package graft

/** The automated scale-regression net: every registered query's physical
  * plans — loop-body executions included — must be free of the three
  * structural scale killers (unpartitioned Window sort, non-broadcast
  * cartesian, a source table re-shuffled per loop iteration). Runs the full
  * registry at sf0.001; plan SHAPE is scale-invariant even where AQE's
  * size thresholds are not, and the flagged shapes are size-independent. */
class PlanAuditSpec extends SparkSpec {

  test("all registered queries are red-flag free (plans + loop bodies)") {
    graft.core.Pin.clear() // other suites may have pinned sf-specific views
    val names = SparkEntry.queries.keys.toSeq.sorted
    val audits = PlanAudit.auditAll(spark, "/root/testdata/sf0.001", names)
    val bad = audits.filter(_.flags.nonEmpty)
    assert(bad.isEmpty, "red-flagged plans:\n" +
      bad.map(a => s"  ${a.name}: ${a.flags.mkString(", ")}").mkString("\n"))
    // every query produced at least its final plan
    assert(audits.size == names.size)
  }

  test("smj-broadcastable fires on a tiny side dragging a shuffle, not on co-partitioned chains") {
    import spark.implicits._
    val big = spark.range(0, 100000).select($"id".as("k"), ($"id" * 7).as("v"))
    val small = spark.range(0, 20).select($"id".as("k"), $"id".as("w"))
    // `merge` hint = the defect frozen in place: AQE honors the hint, so the
    // SMJ survives with a materialized tiny side and a fresh Exchange on big
    val bad = big.join(small.hint("merge"), Seq("k"))
    bad.collect() // collect, not count: materialize THIS plan's stages
    val badFlags = PlanAudit.flagsOf(bad.queryExecution.executedPlan, 10L * 1024 * 1024)
    assert(badFlags.contains("smj-broadcastable"), s"expected flag, got $badFlags")
    // broadcast form of the same join must NOT flag
    val good = big.join(org.apache.spark.sql.functions.broadcast(small), Seq("k"))
    good.collect()
    val goodFlags = PlanAudit.flagsOf(good.queryExecution.executedPlan, 10L * 1024 * 1024)
    assert(!goodFlags.contains("smj-broadcastable"), s"unexpected flag: $goodFlags")
  }
}
