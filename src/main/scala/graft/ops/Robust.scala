package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust numeric cleaning — the feature-engineering guards a training
  * pipeline runs over metadata columns (lengths, scores, counts) before
  * they feed curation rules: percentile clipping and median/MAD outlier
  * flags resist the heavy tails that make mean/stddev rules useless.
  *
  * Determinism: the percentile boundaries are rounded-6 (Spark
  * `percentile` ≡ DuckDB `quantile_cont`, the [[Corpus.groupPercentiles]]
  * parity), every downstream comparison and ratio is a fixed-form double
  * expression over identical inputs.
  *
  * Scale shape: boundaries are one row per group and broadcast back; the
  * value side is a zero-shuffle narrow map after its group-keyed
  * aggregation. Exact percentile sorts per group — at 100 TB swap in
  * `approx_percentile` (mergeable t-digest) for the same plan shape. */
object Robust {

  /** Winsorize `valueCol` to its per-group [lo, hi] percentile band.
    * Returns (id, group, v, clipped). */
  def winsorize(df: DataFrame, idCol: String, groupCol: String,
                valueCol: Column, lo: Double, hi: Double): DataFrame = {
    val b = Corpus.groupPercentiles(df, groupCol, valueCol, Seq(lo, hi))
    val loC = col(s"p${math.round(lo * 100)}")
    val hiC = col(s"p${math.round(hi * 100)}")
    df.select(col(idCol), col(groupCol), valueCol.cast("double").as("v"))
      .join(broadcast(b), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("v"),
        round(least(greatest(col("v"), loC), hiC), 6).as("clipped"))
  }

  /** Median/MAD robust z-score outliers: flag rows with
    * |v − median| / (1.4826·MAD) > cutoff per group (1.4826 scales MAD to
    * σ under normality — Hampel's consistency constant). The robust twin
    * of the mean/σ z-score (`q_event_zscore`); a single corrupt mega-value
    * shifts mean AND σ enough to mask itself, but not the medians.
    * Groups with MAD 0 (constant bulk) flag nothing. Returns flagged rows
    * (id, group, v, med, mad, rz). */
  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
                  valueCol: Column, cutoff: Double): DataFrame = {
    val v = df.select(col(idCol), col(groupCol), valueCol.cast("double").as("v"))
    val med = v.groupBy(col(groupCol))
      .agg(round(expr("percentile(v, 0.5)"), 6).as("med"))
    val dev = v.join(broadcast(med), Seq(groupCol))
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(col("mad") > 0)
      .withColumn("rz",
        round((col("v") - col("med")) / (lit(1.4826) * col("mad")), 6))
      .filter(abs(col("rz")) > cutoff)
      .select(col(idCol), col(groupCol), col("v"), col("med"), col("mad"),
        col("rz"))
  }
}
