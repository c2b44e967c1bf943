package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import QueryDef._

/** Event-stream operators in batch form (the reference has NO streaming —
  * SURVEY §2.10 — so these are the extension surface: the same computations
  * run incrementally in graft.streaming.Streams via Structured Streaming;
  * batch mode is what the oracle can check). */
object EventQueries {
  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(

    q("q_event_tumbling",
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      // Hourly tumbling window — in streaming mode this is the watermarked
      // `groupBy(window($"ts","1 hour"))` with identical semantics.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
    },

    q("q_event_sliding",
      """WITH s AS (
        |  SELECT event_type, value,
        |         time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS ws
        |  FROM events, (SELECT unnest(range(0, 4)) AS k) z)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, d) =>
      // Sliding 1-hour window every 15 minutes: each event lands in 4
      // windows (Spark explodes them before the aggregate — the same
      // event-multiplication the oracle does explicitly). Streaming twin:
      // `groupBy(window($"ts", "1 hour", "15 minutes"))` under a watermark.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
    },

    q("q_event_sessionize",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, event_id,
        |        CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM o)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM m GROUP BY user_id""".stripMargin) { (s, d) =>
      // Gap-based sessionization (30-min inactivity). The streaming twin is
      // flatMapGroupsWithState with an event-time timeout.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
    },

    q("q_event_topusers",
      """SELECT user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id
        |ORDER BY spend DESC, user_id LIMIT 10""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast(dec)).cast("double").as("spend"))
        .orderBy(col("spend").desc, col("user_id").asc).limit(10)
    })
}
