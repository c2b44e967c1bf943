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
    },

    q("q_event_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS ts_v FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS ts_c
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.ts_v GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS ts_p
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.ts_c GROUP BY e.user_id)
        |SELECT v.user_id,
        |       CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stage,
        |       strftime(v.ts_v, '%Y-%m-%d %H:%M:%S') AS ts_view,
        |       coalesce(strftime(c.ts_c, '%Y-%m-%d %H:%M:%S'), '') AS ts_click,
        |       coalesce(strftime(p.ts_p, '%Y-%m-%d %H:%M:%S'), '') AS ts_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id""".stripMargin) { (s, d) =>
      // Ordered conversion funnel view → click → purchase: each stage's
      // earliest event AT OR AFTER the previous stage's. Per-stage filtered
      // min-aggregations chained by a user_id-keyed join — at scale every
      // stage shuffles one (user, ts) pair per converted user, never raw
      // events. The streaming twin is per-user state carrying the three
      // earliest-stage timestamps (flatMapGroupsWithState).
      val ev = Tables.events(s, d)
      def fmt(c: org.apache.spark.sql.Column) =
        date_format(c, "yyyy-MM-dd HH:mm:ss")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_v"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") >= col("ts_v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_c"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") >= col("ts_c"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_p"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1L) + col("ts_c").isNotNull.cast("long") +
            col("ts_p").isNotNull.cast("long")).as("stage"),
          fmt(col("ts_v")).as("ts_view"),
          coalesce(fmt(col("ts_c")), lit("")).as("ts_click"),
          coalesce(fmt(col("ts_p")), lit("")).as("ts_purchase"))
    },

    q("q_event_join",
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 15 MINUTE""".stripMargin) { (s, d) =>
      // Interval (event-time range) join: every purchase within 15 minutes
      // of a click by the same user — the batch twin of the stream-stream
      // watermarked interval join (`streaming.Streams.clickPurchaseJoin`,
      // where the same range condition bounds the join state). Equi-key on
      // user_id so the range predicate evaluates inside co-located
      // partitions — never a cartesian.
      val ev = Tables.events(s, d)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
      c.join(p, Seq("user_id"))
        .filter(col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 15 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us"))
    },

    // per-key top-N via the bounded-heap top_k_by aggregate (functions.TopK)
    // — no window sort: per (event_type) group only k pairs cross the wire.
    // The oracle is the row_number window formulation it replaces.
    q("q_topk_per_key",
      """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id,
        |       round(value, 6) AS value
        |FROM (SELECT event_type, event_id, value,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id ASC) AS rnk
        |      FROM events) z WHERE rnk <= 5""".stripMargin,
      bench = true) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.functions.TopK.registerKernels(ev)
      ev.groupBy(col("event_type"))
        .agg(graft.functions.TopK.topKBy(col("value"), col("event_id"), 5).as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.payload").as("event_id"), round(col("col.ord"), 6).as("value"))
    },

    // as-of join: each purchase matched to the LATEST click at-or-before it
    // by the same user (ties on right ts → greatest event_id). The oracle is
    // DuckDB's native ASOF JOIN — an independent implementation of the same
    // semantics; the engine uses the union-and-carry window formulation
    // (ops.AsOf) since Spark would plan the inequality join as a
    // broadcast-nested-loop. Nullable match → -1 so both engines emit
    // non-null BIGINTs (the pandas comparator floats nullable ints).
    q("q_event_asof",
      """WITH c AS (SELECT user_id, ts, arg_max(event_id, event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id,
        |       coalesce(c.click_id, -1) AS click_id,
        |       coalesce(CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT), -1) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
      bench = true) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      graft.ops.AsOf.asOfJoin(p, c, "user_id", "ts", "click_id",
          Seq("click_id", "click_ts"))
        .select(col("user_id"), col("purchase_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"),
          coalesce(unix_micros(col("ts")) - unix_micros(col("click_ts")),
            lit(-1L)).as("gap_us"))
    },

    q("q_event_bigrams",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n DESC, event_type, next_type LIMIT 10""".stripMargin) { (s, d) =>
      // Behavioral sequence mining: consecutive event-type transitions per
      // user (the Markov-transition table clickstream analysis starts
      // from). One user-partitioned window (no global sort), one pair
      // count, TakeOrdered top-k.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type").asc, col("next_type").asc)
        .limit(10)
    },

    q("q_event_zscore",
      """WITH st AS (SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ssv
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - sv / cnt) / sqrt((ssv - sv * sv / cnt) / (cnt - 1)), 6) AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE abs((e.value - sv / cnt) / sqrt((ssv - sv * sv / cnt) / (cnt - 1))) > 2.5""".stripMargin) { (s, d) =>
      // Per-type z-score anomaly flagging. Mean/stddev come from EXACT
      // decimal sums (the money-decimal contract) so the derived doubles —
      // and the |z| > 2.5 inclusion decision — are bit-identical across
      // engines (stddev_samp's streaming update order would not be). Tiny
      // per-type stats broadcast against the unshuffled event scan.
      val dv = col("value").cast(dec)
      val stats = Tables.events(s, d).groupBy(col("event_type")).agg(
        count(lit(1)).as("cnt"),
        sum(dv).cast("double").as("sv"),
        sum(dv * dv).cast("double").as("ssv"))
      val z = (col("value") - col("sv") / col("cnt")) /
        sqrt((col("ssv") - col("sv") * col("sv") / col("cnt")) / (col("cnt") - 1))
      Tables.events(s, d).join(broadcast(stats), Seq("event_type"))
        .withColumn("z", z)
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 6).as("z"))
    },

    // bounded-tap EWMA (α=½, 5 taps): exponential smoothing as a per-row
    // fixed-order expression over user-partitioned lags — dyadic weights
    // are exact doubles, the truncated tail renormalizes at sequence start
    q("q_event_ewma",
      """WITH l AS (SELECT event_id, user_id, CAST(value AS DOUBLE) AS v0,
        |  lag(CAST(value AS DOUBLE), 1) OVER w AS v1,
        |  lag(CAST(value AS DOUBLE), 2) OVER w AS v2,
        |  lag(CAST(value AS DOUBLE), 3) OVER w AS v3,
        |  lag(CAST(value AS DOUBLE), 4) OVER w AS v4
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  round((v0 + CAST(0.5 AS DOUBLE) * coalesce(v1, 0)
        |       + CAST(0.25 AS DOUBLE) * coalesce(v2, 0)
        |       + CAST(0.125 AS DOUBLE) * coalesce(v3, 0)
        |       + CAST(0.0625 AS DOUBLE) * coalesce(v4, 0))
        |      / (CAST(1 AS DOUBLE)
        |       + CASE WHEN v1 IS NULL THEN 0 ELSE CAST(0.5 AS DOUBLE) END
        |       + CASE WHEN v2 IS NULL THEN 0 ELSE CAST(0.25 AS DOUBLE) END
        |       + CASE WHEN v3 IS NULL THEN 0 ELSE CAST(0.125 AS DOUBLE) END
        |       + CASE WHEN v4 IS NULL THEN 0 ELSE CAST(0.0625 AS DOUBLE) END), 6) AS ewma
        |FROM l""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val v = col("value").cast("double")
      def lagd(i: Int) = lag(v, i).over(w)
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), v.as("v0"),
          lagd(1).as("v1"), lagd(2).as("v2"), lagd(3).as("v3"), lagd(4).as("v4"))
      val num = col("v0") +
        lit(0.5) * coalesce(col("v1"), lit(0.0)) +
        lit(0.25) * coalesce(col("v2"), lit(0.0)) +
        lit(0.125) * coalesce(col("v3"), lit(0.0)) +
        lit(0.0625) * coalesce(col("v4"), lit(0.0))
      val den = lit(1.0) +
        when(col("v1").isNull, lit(0.0)).otherwise(lit(0.5)) +
        when(col("v2").isNull, lit(0.0)).otherwise(lit(0.25)) +
        when(col("v3").isNull, lit(0.0)).otherwise(lit(0.125)) +
        when(col("v4").isNull, lit(0.0)).otherwise(lit(0.0625))
      e.select(col("event_id"), col("user_id"), round(num / den, 6).as("ewma"))
    },

    q("q_event_moving_avg",
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         CAST(count(*) AS BIGINT) AS n,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY event_type, day)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  CAST(total AS DOUBLE) AS total,
        |  round(CAST(SUM(total) OVER w AS DOUBLE) / SUM(n) OVER w, 6) AS avg3d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(day) // 86400000000
        |             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      // trailing 3-day moving average per event type — the RANGE-frame
      // analytic window (frames over event-time VALUES, not row offsets,
      // so gap days widen the frame correctly). Frame sums are exact
      // decimals → one deterministic division. Window partitioned by type.
      val day = date_trunc("day", col("ts"))
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), day.as("day"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("total"))
      val dayNum = (unix_micros(col("day")) / 86400000000L).cast("long")
      val w = Window.partitionBy(col("event_type")).orderBy(dayNum)
        .rangeBetween(-2, Window.currentRow)
      daily.select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        col("total").cast("double").as("total"),
        round(sum(col("total")).over(w).cast("double") /
          sum(col("n")).over(w), 6).as("avg3d"))
    },

    q("q_event_retention",
      """WITH c AS (SELECT user_id,
        |  date_trunc('week', min(ts)) AS w0 FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, c.w0,
        |  CAST((epoch_us(date_trunc('week', e.ts)) - epoch_us(c.w0)) / 604800000000 AS BIGINT) AS weeks_since
        |  FROM events e JOIN c USING (user_id))
        |SELECT strftime(w0, '%Y-%m-%d') AS cohort_week, weeks_since,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM a GROUP BY w0, weeks_since""".stripMargin) { (s, d) =>
      // cohort retention: users grouped by first-activity week, counted in
      // every later week they return — the product-analytics staple. All
      // integer epoch math; two user-keyed aggregations plus one
      // (cohort, offset) rollup — no windows, no driver state.
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("w0"))
      ev.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("w0"),
          // both operands are week-truncated epochs, so the quotient is an
          // exact integer — the cast only fixes Spark's always-double `/`
          ((unix_micros(date_trunc("week", col("ts"))) - unix_micros(col("w0")))
            / 604800000000L).cast("long").as("weeks_since"))
        .distinct()
        .groupBy(date_format(col("w0"), "yyyy-MM-dd").as("cohort_week"),
          col("weeks_since"))
        .agg(count(lit(1)).as("n_users"))
    },

    q("q_event_gaps",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(prev_ts) AS BIGINT) AS n_gaps,
        |       CAST(max(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS max_gap_us,
        |       CAST(sum(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS sum_gap_us
        |FROM o GROUP BY user_id""".stripMargin) { (s, d) =>
      // Per-user inter-event gap profile via lag (the §2.5 analytic-window
      // surface beyond ranking: lag/lead over an event-time order). All
      // integer microsecond arithmetic — bit-exact by construction. One
      // user-partitioned window (bounded by the user's event count, never
      // unpartitioned) then one user-keyed aggregation.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count(col("prev_ts")).as("n_gaps"),
          max(gap).as("max_gap_us"),
          sum(gap).as("sum_gap_us"))
    })
}
