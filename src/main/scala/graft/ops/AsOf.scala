package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal point-lookup Spark has no
  * native operator for: each left row matches the single right row with the
  * greatest timestamp ≤ its own within the same key. The naive formulation
  * is an inequality join + per-left-row argmax (quadratic per key, and
  * Spark plans non-equi joins as broadcast-nested-loop); the scalable
  * shape used here is the union-and-carry trick from the streams
  * literature: interleave both sides into one stream, sort per key, and
  * let a running `last(ignoreNulls)` carry the latest right row forward
  * into each left row.
  *
  * Scale shape: ONE shuffle (hash on `keyCol`) + a per-key partitioned
  * window sort — no cartesian term, no per-row subquery, skew bounded by
  * the hottest key's event count. Both sides stream through; nothing is
  * collected or broadcast.
  *
  * Determinism: right-side ties on (key, ts) resolve to the greatest
  * `tieCol`; at equal timestamps a right row sorts BEFORE left rows
  * (`l.ts >= r.ts` inclusive-match semantics, DuckDB/pandas `ASOF JOIN`
  * convention). */
object AsOf {

  /** Left-outer as-of join. Returns every `left` row plus `payload(right)`
    * of its match (null when no right row precedes it). `payload` columns
    * must not collide with left's. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(col(keyCol), col(tsCol), col(tieCol).cast("long").as("__tie"),
      struct(payload.map(col): _*).as("__r"), lit(0).as("__side"))
    val l = left.select(col(keyCol), col(tsCol), lit(null).cast("long").as("__tie"),
      lit(null).cast(r.schema("__r").dataType).as("__r"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    val unioned = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      payload.map(c => col("__m").getField(c).as(c))
    carried.select(out: _*)
  }
}
