package graft

import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured-Streaming extension: incremental results must equal the
  * DuckDB-verified batch semantics. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  private val sample = Seq(
    Event(1, ts(0), 7, "purchase", 10.0, "{}"),
    Event(2, ts(10), 7, "purchase", 5.0, "{}"),
    Event(3, ts(75), 7, "click", 1.0, "{}"),    // new hour, new session (65' gap)
    Event(4, ts(80), 8, "click", 2.0, "{}"))

  test("tumbling window agg over a memory stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.tumblingCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("tumbling").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00", "purchase", 2L),
      ("2024-01-01 01:00:00", "click", 2L)))
  }

  test("watermark drops late data in append mode; in-watermark stragglers survive") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // append mode only emits windows the watermark has CLOSED — the mode
    // where late-drop semantics are observable
    val q = Streams.tumblingCounts(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("late").start()
    // batch 1: events up to t=200' → watermark advances to 200' − 2h = 80':
    // hour 0 (ends 60') is closed, hour 1 (ends 120') still open
    mem.addData(Event(1, ts(0), 7, "purchase", 10.0, "{}"),
      Event(2, ts(10), 7, "purchase", 5.0, "{}"),
      Event(3, ts(200), 7, "click", 1.0, "{}"))
    q.processAllAvailable()
    // batch 2: a straggler INSIDE hour 0 (closed → drop)
    // and one inside hour 1 (still open → kept)
    mem.addData(Event(4, ts(5), 8, "purchase", 99.0, "{}"),
      Event(5, ts(70), 8, "click", 2.0, "{}"))
    q.processAllAvailable()
    // batch 3: push event time far ahead so every window closes and flushes
    mem.addData(Event(6, ts(1000), 9, "view", 0.0, "{}"))
    q.processAllAvailable()
    val rows = spark.table("late")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 00:00:00", "purchase", 2L)))  // late e4 NOT counted
    assert(rows.contains(("2024-01-01 01:00:00", "click", 1L)))     // in-watermark e5 kept
    assert(!rows.exists { case (_, t, n) => t == "purchase" && n == 3L })
  }

  test("top_k_by runs as a streaming aggregate: per-key top-k updates across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val df = mem.toDF()
    graft.functions.TopK.registerKernels(df)
    val q = df.groupBy(col("event_type"))
      .agg(graft.functions.TopK.topKBy(col("value"), col("event_id"), 2).as("tk"))
      .writeStream.outputMode("complete").format("memory").queryName("topk").start()
    mem.addData(sample: _*) // purchases 10.0(id1), 5.0(id2); clicks 1.0(id3), 2.0(id4)
    q.processAllAvailable()
    // a later micro-batch displaces the weakest purchase: the TypedImperative
    // buffer merges incrementally across batches
    mem.addData(Event(9, ts(90), 9, "purchase", 7.5, "{}"))
    q.processAllAvailable()
    val rows = spark.table("topk").collect().map(r => r.getString(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))).toMap
    q.stop()
    assert(rows("purchase") === Seq((10.0, 1L), (7.5, 9L))) // id2's 5.0 displaced
    assert(rows("click") === Seq((2.0, 4L), (1.0, 3L)))
  }

  test("stateful sessionize counts gap-separated sessions per user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionizeStateful(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("sessions").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    val m = spark.table("sessions")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    q.stop()
    assert(m(7L) === (2L, 3L)) // two sessions (65-min gap), three events
    assert(m(8L) === (1L, 1L))
  }

  test("session windows built-in") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionWindows(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sw").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    val rows = spark.table("sw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      (7L, "2024-01-01 00:00:00", 2L),
      (7L, "2024-01-01 01:15:00", 1L),
      (8L, "2024-01-01 01:20:00", 1L)))
  }

  test("streaming edge ingest appends parquet with TTL stamps") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val mem = MemoryStream[Event]
    var batches = 0
    val q = Streams.edgeIngest(mem.toDF(), dir, ttlMillis = 60000L)((_, _) => batches += 1)
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(dir)
    assert(out.count() === 4L)
    assert(out.columns.contains("~ttl_expiry"))
    val r = out.filter(col("dst") === "event:1").head()
    assert(r.getAs[Long]("~ttl_expiry") === 1704067200000L + 60000L)
    assert(batches >= 1)
  }

  test("streaming corpus ingest dedups in-flight and gates on quality") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.dedupedDocIngest(docs, dedupWindow = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("corpus").start()
    val good = "the quick brown fox jumps over the lazy dog"
    mem.addData(
      (1L, ts(0), good),
      (2L, ts(5), good),            // exact dup within the window -> dropped
      (3L, ts(10), "x"),            // fails the min-token quality gate
      (4L, ts(15), "el perro y el gato y la casa son de la familia"))
    q.processAllAvailable()
    // advance the watermark far past the dedup window, then re-send the
    // duplicate: its state has aged out, so it re-enters (the bounded-state
    // trade vs batch dedup, asserted not just documented)
    mem.addData((5L, ts(120), "completely different words arrive here"))
    q.processAllAvailable()
    mem.addData((6L, ts(125), good))
    q.processAllAvailable()
    val out = spark.table("corpus").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_pred"))).toSet
    q.stop()
    assert(out.map(_._1) === Set(1L, 4L, 5L, 6L))
    assert(out.contains((1L, "en")) && out.contains((4L, "es")))
  }

  test("stream-stream interval join matches within the window only") {
    import graft.streaming.Streams.{Click, Purchase}
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.outputMode("append").format("memory").queryName("ij").start()
    clicks.addData(Click(7L, 100L, ts(0)), Click(8L, 101L, ts(0)))
    purchases.addData(
      Purchase(7L, 200L, ts(5)),    // 5 min after click → joins
      Purchase(7L, 201L, ts(30)),   // outside the 15-min window → dropped
      Purchase(9L, 202L, ts(5)))    // no matching click user → dropped
    q.processAllAvailable()
    val out = spark.table("ij").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"), r.getAs[Long]("lag_us"))).toSet
    q.stop()
    assert(out === Set((7L, 100L, 200L, 300000000L)))
  }

  test("offline-trained weights score a doc stream; matches batch training scores") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", 1), (2L, "alpha gamma beta beta", 1),
      (3L, "alpha beta alpha gamma", 1), (4L, "zeta eta theta zeta", 0),
      (5L, "eta theta zeta eta", 0), (6L, "theta zeta eta theta eta", 0))
      .toDF("doc_id", "text", "y0")
    val w = graft.ops.Corpus.trainedWeights(
      docs, "doc_id", "text", col("y0") === 1, dims = 32, rounds = 3)
    assert(w.length === 32 && w.exists(_ != 0.0))
    val batch = graft.ops.Corpus.trainQualityClassifier(
      docs, "doc_id", "text", col("y0") === 1, dims = 32, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Streams.scoredDocStream(mem.toDF().toDF("doc_id", "text"), w)
      .writeStream.outputMode("append").format("memory").queryName("scored")
      .start()
    mem.addData((1L, "alpha beta gamma alpha beta"), (4L, "zeta eta theta zeta"))
    q.processAllAvailable()
    mem.addData((6L, "theta zeta eta theta eta"))   // second micro-batch
    mem.addData((9L, "!!! ??? ..."))  // featureless: no alphanumeric tokens
    q.processAllAvailable()
    val streamed = spark.table("scored").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    q.stop()
    // doc 9 is dropped, matching the batch trainer's inner feature join —
    // the stream never emits a sigma(0)=0.5 row batch would not score
    assert(streamed.keySet === Set(1L, 4L, 6L))
    // per-token fold == training z up to the rounded-9 feature quantization
    streamed.foreach { case (id, s) =>
      assert(math.abs(s - batch(id)) < 1e-5, s"doc $id: $s vs ${batch(id)}")
    }
    graft.core.Pin.clear()
  }
}
