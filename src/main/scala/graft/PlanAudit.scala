package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ShuffleExchangeLike, ReusedExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.mutable

/** Automated physical-plan red-flag audit over EVERY registered query —
  * the permanent regression net behind the 100×-scale claims (EXPLAINS.md
  * hand-picks evidence; this walks all of them).
  *
  * Flags raised per query:
  *  - `unpartitioned-window`: a WindowExec with an empty partitionSpec — a
  *    global single-partition sort, the classic scale cliff;
  *  - `cartesian`: a CartesianProductExec (a broadcast nested-loop against
  *    a deliberately broadcast side does NOT flag — that's the intended ANN
  *    shape);
  *  - `smj-broadcastable`: a SortMergeJoin that survived to execution with
  *    one side's RUNTIME size under the autoBroadcastJoinThreshold WHILE
  *    the other side pays a fresh shuffle Exchange to meet the join's
  *    distribution — the small side should have been broadcast (hint it),
  *    because the SMJ drags the big side through an Exchange on the join
  *    key (the IVF-probe defect class: a tiny probe table re-shuffling the
  *    full index on cid). A co-partitioned SMJ whose sides arrive WITHOUT
  *    a new Exchange (e.g. the PQ vec_id⋈vec_id reconstruction chain on
  *    the pinned partitioning) is the scale-correct shape and does not
  *    flag — both sides there are O(N) and only small at test SF;
  *  - `loop-reshuffle:<table>`: the same source parquet table observed
  *    under a shuffle exchange in ≥ `loopThreshold` separate executions of
  *    one query — the signature of a big table being re-shuffled inside an
  *    iterative loop body instead of being pinned/pre-partitioned once.
  *
  * Mid-query executions (per-iteration `localCheckpoint`/`count` actions)
  * are captured via a [[QueryExecutionListener]], so loop bodies are
  * audited, not just the final assembled plan. */
object PlanAudit {

  final case class QueryAudit(name: String, exchanges: Int, executions: Int,
                              flags: Seq[String], plans: List[String] = Nil)

  /** Walk an executed plan into its concrete operator list, unrolling AQE
    * final plans, materialized query stages, reused exchanges and subqueries. */
  def operators(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(operators)
  }

  private def tableOf(scan: FileSourceScanExec): Option[String] =
    scan.relation.location.rootPaths.headOption.map { p =>
      val s = p.toString
      val base = s.substring(s.lastIndexOf('/') + 1)
      base.stripSuffix(".parquet")
    }

  /** Source tables that sit under a shuffle exchange in this plan. */
  private def shuffledTables(plan: SparkPlan): Set[String] =
    operators(plan).collect { case e: ShuffleExchangeLike => e }.flatMap { ex =>
      operators(ex).collect {
        case s: FileSourceScanExec => tableOf(s)
      }.flatten
    }.toSet

  private[graft] def flagsOf(plan: SparkPlan, broadcastThreshold: Long): Seq[String] = {
    val ops = operators(plan)
    val win = ops.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => "unpartitioned-window"
    }
    val cart = ops.collect { case _: CartesianProductExec => "cartesian" }
    // a materialized shuffle stage directly under an SMJ side whose runtime
    // bytes fit the broadcast threshold = the join should have been a BHJ
    def sideBytes(side: SparkPlan): Option[BigInt] =
      operators(side).collectFirst {
        case q: QueryStageExec if q.isMaterialized =>
          try Some(q.getRuntimeStatistics.sizeInBytes) catch { case _: Throwable => None }
      }.flatten
    // does this join input pay a NEW shuffle at its entry (peeling only the
    // sort/project/codegen wrappers an SMJ inserts)? A side whose existing
    // partitioning satisfied the join has no entry Exchange.
    @annotation.tailrec
    def entryShuffle(p: SparkPlan): Boolean = p match {
      case q: QueryStageExec        => entryShuffle(q.plan)
      case r: ReusedExchangeExec    => entryShuffle(r.child)
      case _: ShuffleExchangeLike   => true
      case s if s.children.size == 1 && {
        val n = s.getClass.getSimpleName
        n.startsWith("Sort") || n.startsWith("Project") || n.startsWith("Filter") ||
        n.contains("WholeStageCodegen") || n.contains("InputAdapter") ||
        n.contains("AQEShuffleRead") || n.contains("Coalesce")
      } => entryShuffle(s.children.head)
      case _ => false
    }
    // fires only when the side paying the fresh Exchange is materially
    // BIGGER than the broadcastable side (≥8× and ≥1MB): shuffling the
    // tiny side into a co-partitioned big side is the scale-CORRECT shape
    // (a 1-row SSSP frontier exchanged into the pinned edge view must not
    // flag just because the edge view is small at test SF)
    def drags(small: Option[BigInt], other: SparkPlan): Boolean =
      small.exists(s => s < broadcastThreshold && entryShuffle(other) &&
        sideBytes(other).forall(o => o >= (s * 8).max(BigInt(1024 * 1024))))
    val smj = ops.collect {
      case j: SortMergeJoinExec
        if drags(sideBytes(j.left), j.right) || drags(sideBytes(j.right), j.left) =>
        "smj-broadcastable"
    }
    (win ++ cart ++ smj).distinct
  }

  /** Audit one query: build + run it while capturing every execution the
    * construction triggers (iterative queries materialize per round). */
  def audit(spark: SparkSession, sfDir: String, name: String,
            loopThreshold: Int = 3, keepPlans: Boolean = false): QueryAudit = {
    val captured = mutable.ArrayBuffer.empty[QueryExecution]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.synchronized { captured += qe }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      // the listener bus is asynchronous; give in-flight events a beat
      Thread.sleep(200)
      val execs = captured.synchronized(captured.toList)
      val finalPlan = df.queryExecution.executedPlan
      val allPlans = finalPlan :: execs.map(_.executedPlan)
      val bcThreshold =
        try spark.conf.get("spark.sql.autoBroadcastJoinThreshold").stripSuffix("b") match {
          case s if s.endsWith("k") || s.endsWith("K") => s.dropRight(1).toLong * 1024
          case s if s.endsWith("m") || s.endsWith("M") => s.dropRight(1).toLong * 1024 * 1024
          case s if s.endsWith("g") || s.endsWith("G") => s.dropRight(1).toLong * 1024 * 1024 * 1024
          case s => s.toLong
        } catch { case _: Throwable => 10L * 1024 * 1024 }
      val structural = allPlans.flatMap(p =>
        try flagsOf(p, bcThreshold) catch { case _: Throwable => Nil }).distinct
      // loop-reshuffle: same parquet table under an Exchange in many
      // executions of ONE query = re-shuffled per iteration. Captured
      // executions only — the final plan is already among them as the
      // count() action (counting it again would double-book every query's
      // last execution and flag single-pass operators).
      val loopPlans = if (execs.nonEmpty) execs.map(_.executedPlan) else List(finalPlan)
      val perExec = loopPlans.map(p =>
        try shuffledTables(p) catch { case _: Throwable => Set.empty[String] })
      val reshuffled = perExec.flatten.groupBy(identity).collect {
        case (t, occ) if occ.size >= loopThreshold => s"loop-reshuffle:$t"
      }.toSeq.sorted
      val nExchanges =
        try operators(finalPlan).count(_.isInstanceOf[ShuffleExchangeLike])
        catch { case _: Throwable => -1 }
      QueryAudit(name, nExchanges, allPlans.size, structural ++ reshuffled,
        if (keepPlans) allPlans.map(_.toString) else Nil)
    } finally spark.listenerManager.unregister(listener)
  }

  /** Known-intentional exceptions, each with the reason it is sound. */
  val allowed: Map[String, Set[String]] = Map(
    // bounded all-pairs exactness baseline for the LSH path (Dedup.scala),
    // `maxId`-bounded by contract — documented as NOT a pipeline operator
    "q_ngram_jaccard" -> Set("cartesian")
  )

  /** Sweep the whole registry, isolating failures: a query that cannot even
    * build/analyze/run against the testdata is reported as that query's
    * `error:` flag instead of aborting the sweep — 115 clean audits must
    * never hide behind one broken loader. */
  def auditAll(spark: SparkSession, sfDir: String,
               names: Seq[String]): Seq[QueryAudit] =
    names.map { n =>
      try {
        val a = audit(spark, sfDir, n)
        a.copy(flags = a.flags.filterNot(allowed.getOrElse(n, Set.empty)))
      } catch {
        case e: Throwable =>
          QueryAudit(n, -1, 0,
            Seq(s"error:${e.getClass.getSimpleName}:" +
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)))
      }
    }
}
