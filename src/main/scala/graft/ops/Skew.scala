package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §4.2 super-node problem at shuffle
  * scale). AQE's skew-join split handles sort-merge cases adaptively; these
  * are for the shapes AQE can't fix — per-key aggregation hotspots and
  * broadcast-ineligible skewed joins on a known-hot key column.
  */
object Skew {

  /** Salted join: replicate each `small`-side row `salts` times, scatter the
    * big side uniformly with a deterministic per-row salt, join on
    * (key, salt). A hot key's rows land on `salts` reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("~salt",
      pmod(abs(hash(col(key), monotonically_increasing_id())), lit(salts)))
    val smallSalted = small
      .withColumn("~salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("~salt", col("~salt").cast("int"))
    bigSalted.join(smallSalted, Seq(key, "~salt"), joinType).drop("~salt")
  }

  /** Two-phase aggregation for skewed group keys: partial per (key, salt),
    * then final per key — the map-side-combine pattern made explicit for
    * aggregates Spark can't partially combine (e.g. exact collect shapes).
    * Here: skew-safe exact count + sum. */
  def skewSafeCountSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("~salt",
        pmod(abs(hash(col(key), monotonically_increasing_id())), lit(salts)))
      .groupBy(col(key), col("~salt"))
      .agg(count(lit(1)).as("~c"), sum(col(valueCol)).as("~s"))
      .groupBy(col(key))
      .agg(sum(col("~c")).as("n"), sum(col("~s")).as("total"))
}
