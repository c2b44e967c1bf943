package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension surface (the reference has no streaming —
  * SURVEY §2.10 — its nearest analogues are the async task queue and TTL
  * expiry; this module is the engine's forward-looking ingest path).
  *
  * Batch/stream parity: every transform here mirrors a batch query in
  * graft.queries.EventQueries, so the DuckDB-verified batch result is also
  * the specification for the incremental one.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  final case class Click(c_user: Long, click_id: Long, cts: java.sql.Timestamp)
  final case class Purchase(p_user: Long, purchase_id: Long, pts: java.sql.Timestamp)

  private val dec = DecimalType(18, 2)

  /** Watermarked hourly tumbling aggregation — the streaming twin of
    * q_event_tumbling. Late events beyond 2h are dropped at the watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Built-in session windows (gap-based), watermarked. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Custom per-key state: running session counter per user via
    * flatMapGroupsWithState — the `KeyValueGroupedDataset` stateful surface
    * (counts a new session when >30 min passed since the user's last event). */
  def sessionizeStateful(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          var (lastMicros, sessions, total) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val micros = e.ts.getTime * 1000L
            if (lastMicros == Long.MinValue || micros - lastMicros > 1800000000L)
              sessions += 1
            lastMicros = micros
            total += 1
          }
          state.update((lastMicros, sessions, total))
          Iterator(SessionSummary(userId, sessions, total))
      }
  }

  /** Streaming graph ingest: micro-batch append of event-derived edges into
    * a parquet-backed edge table — the Structured Streaming `foreachBatch`
    * ingest path for the property graph (TTL stamped per edge, mirroring
    * reference schema TTL semantics as an event-time filter downstream). */
  def edgeIngest(events: DataFrame, targetDir: String, ttlMillis: Long)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val edges = events.select(
      concat(lit("user:"), col("user_id").cast("string")).as("src"),
      concat(lit("event:"), col("event_id").cast("string")).as("dst"),
      col("event_type").as("label"),
      col("ts"),
      (unix_millis(col("ts")) + ttlMillis).as("~ttl_expiry"))
    edges.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val df = batch.toDF()
        df.write.mode("append").parquet(targetDir)
        onBatch(df, id)
      }
      .start()
  }

  /** Schema for reading the events table as a file stream. */
  def eventSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp").add("user_id", "long")
    .add("event_type", "string").add("value", "double").add("props", "string")

  /** Watermarked stream-stream interval join — the incremental twin of
    * q_event_join: every purchase within `window` of a click by the same
    * user. The range condition (`pts` ∈ [`cts`, `cts` + window]) plus both
    * watermarks lets Structured Streaming BOUND the join state: a buffered
    * click is dropped once the purchase-side watermark passes `cts` +
    * window + delay, so state never grows with stream length — the
    * watermark-for-state-cleanup contract of stream-stream joins. Inputs
    * are pre-filtered event frames with columns
    * (user_id, click_id, cts) / (user_id, purchase_id, pts). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        window: String = "15 minutes",
                        delay: String = "1 hour"): DataFrame =
    clicks.withWatermark("cts", delay)
      .join(purchases.withWatermark("pts", delay),
        expr(s"c_user = p_user AND pts >= cts AND pts <= cts + INTERVAL $window"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us"))

  /** Streaming corpus ingest with in-flight exact dedup + quality gate —
    * the incremental twin of the batch pipeline's first and third stages
    * (`ops.CorpusPipeline`; batch semantics oracled by q_dedup_exact /
    * q_quality_score). A document is dropped if a copy with the same
    * content hash arrived within `dedupWindow` of it
    * (`dropDuplicatesWithinWatermark`: state is BOUNDED by the watermark —
    * the trade every streaming dedup makes vs the batch hash-groupBy; a
    * re-arrival after the window re-enters, exactly like re-running the
    * batch dedup on a later partition of the corpus). Quality filtering is
    * stateless and runs post-dedup: state holds the content hash of every
    * FIRST arrival inside the watermark — including docs the quality gate
    * later drops — so a late duplicate of a quality-rejected doc is still
    * suppressed, which deliberately matches the batch twin (dedup keeps the
    * min-id copy, THEN the gate filters). State size is bounded by the
    * watermark, not by the survivor count. Expects (doc_id, ts, text). */
  def dedupedDocIngest(docs: DataFrame, dedupWindow: String = "1 hour",
                       minTokens: Int = 2, maxStopwordRatio: Double = 0.9): DataFrame = {
    val toks = graft.functions.TextFunctions.tokenize(col("text"))
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", dedupWindow)
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("q", graft.functions.TextFunctions.qualityStructFromToks(col("text"), toks))
      .filter(col("q.n_tokens") >= minTokens && col("q.stopword_ratio") <= maxStopwordRatio)
      .withColumn("lang_pred", graft.functions.TextFunctions.langId(col("text")))
      .drop("q")
  }

  /** Online scoring with offline-trained classifier weights — the
    * train-batch / serve-stream split: [[graft.ops.Corpus.trainedWeights]]
    * ships the dims-element vector as plan literals, and scoring is a pure
    * narrow map (per-token hashed weight lookup folded per row — no state,
    * no shuffle, no watermark), so the SAME transform runs on a batch
    * frame or a `readStream`. z = Σ_tok w[h(tok)%dims] / n_tokens, which
    * equals the training-side Σⱼ wⱼ·xⱼ up to the rounded-9 feature
    * quantization (|Δ| ≤ dims·5e-10 — StreamingSpec bounds it). */
  def scoredDocStream(docs: DataFrame, weights: Array[Double]): DataFrame = {
    val dims = weights.length
    val wLit = array(weights.map(lit(_)): _*)
    val toks = graft.functions.TextFunctions.tokenize(col("text"))
    val z = aggregate(toks, lit(0.0), (acc, t) =>
      acc + element_at(wLit,
        (graft.ops.Sketch.hash60(t) % dims).cast("int") + 1)) / size(toks)
    docs
      // featureless docs (no alphanumeric tokens) are dropped, matching the
      // batch trainer's inner join on the feature table — without this the
      // stream would emit sigma(0)=0.5/pred=1 rows batch never scores
      .filter(size(toks) > 0)
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
  }
}
