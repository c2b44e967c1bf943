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
}
