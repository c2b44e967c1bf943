package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round => sround}

/** Numeric helpers shared by engine queries and their DuckDB oracle twins.
  *
  * The one that matters: IEEE signed-zero normalization after rounding.
  * A signed expression whose rounded magnitude is zero keeps its sign bit in
  * DuckDB (`round(-1e-9, 6)` → `-0.0`) but not in Spark (whose `Round` goes
  * through `BigDecimal`, which has no signed zero, → `+0.0`). The driver's
  * correctness hash is bit-level, so the two sides must agree: every rounded
  * signed-capable output column uses [[zround]] on the engine side and the
  * `round(x, n) + 0` convention ([[zroundSql]]) in the oracle SQL — IEEE
  * `-0.0 + 0.0 = +0.0` under round-to-nearest, all other values unchanged
  * (`NaN` stays `NaN`, `null` stays `null`).
  */
object Num {

  /** `functions.round` to `scale` places with the result cast to double and
    * signed zero normalized to `+0.0`. Use for every rounded output column
    * whose value can be negative; the matching oracle SQL must use
    * [[zroundSql]] / `round(…) + 0`. */
  def zround(c: Column, scale: Int): Column =
    sround(c.cast("double"), scale) + lit(0.0)

  def zround6(c: Column): Column = zround(c, 6)

  def zround9(c: Column): Column = zround(c, 9)

  /** DuckDB twin of [[zround]]: integer `+ 0` keeps the DOUBLE type and
    * normalizes `-0.0` (bare `0.0` literals parse as DECIMAL in DuckDB,
    * which is why the addend is the integer literal). */
  def zroundSql(expr: String, scale: Int): String =
    s"round(CAST(($expr) AS DOUBLE), $scale) + 0"
}
