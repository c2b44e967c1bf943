package graft

import graft.ops.{Ann, Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Dedup / ANN / multimodal operator semantics on tiny fixtures. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat today"),   // near dup of 1
    (4L, "completely unrelated text with other words entirely here"))
    .toDF("doc_id", "text")

  test("exact dedup groups") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 1)
    assert(g(0).getAs[Long]("canonical_id") === 1L)
    assert(g(0).getAs[Long]("n_dups") === 2L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      ngram = 2, k = 12, bands = 6, rows = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical → always collides, jaccard 1
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("ngram jaccard: dup pair = 1.0, near pair in (0,1)") {
    val m = Dedup.ngramJaccardPairs(docs, "doc_id", "text", ngram = 2, maxId = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) === 1.0)
    assert(m((1L, 3L)) > 0.4 && m((1L, 3L)) < 1.0)
  }

  test("simhash of exact dups identical") {
    val hs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hs(1L) === hs(2L))
    assert(hs(1L).length === 32)
  }

  test("brute-force ANN ranks the self-similar vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 0),
      vecs.filter(col("vec_id") > 0), k = 2).collect()
    assert(top.map(_.getLong(1)).toSeq === Seq(10L, 11L))
    assert(top(0).getDouble(2) > 0.99)
  }

  test("ANN index build counts null/empty-vector drops and records them in artifact info") {
    import graft.sources.GraphStore
    def vec(seed: Int): Array[Float] =
      Array.tabulate(4)(j => (((seed * 31 + j * 17) % 97) / 97.0f) + 0.01f)
    val real = (1L to 6L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val nulls = Seq((7L, null.asInstanceOf[Array[Float]]),
      (8L, Array.empty[Float])).toDF("vec_id", "embedding")
    val cands = real.unionByName(nulls)
    assert(Ann.nullVectorDrops(cands) === 2L)
    assert(Ann.nullVectorDrops(real) === 0L)
    // saveIndex trains despite the null rows and records the drop count as
    // observability info on BOTH artifacts (not part of the identity check)
    val dir = java.nio.file.Files.createTempDirectory("graft-nulldrop").toString
    Ann.saveIndex(dir, cands, nCentroids = 2, iters = 1, m = 1, ks = 2, dims = 4)
    val kp = Map("nCentroids" -> "2", "iters" -> "1") + GraphStore.inputIdentity(cands)
    assert(GraphStore.artifactInfo(spark, dir, "ann_kmeans_centroids", kp)
      .get("null_vector_drops") === Some("2"))
    val pp = Map("m" -> "1", "ks" -> "2", "dims" -> "4", "iters" -> "1") +
      GraphStore.inputIdentity(cands)
    assert(GraphStore.artifactInfo(spark, dir, "ann_pq_reconstructions", pp)
      .get("null_vector_drops") === Some("2"))
    // the null rows are absent from the index (dropped, not mis-assigned)
    val cells = Ann.cellAssignments(cands, nCentroids = 2, iters = 1)
    assert(cells.filter(col("vec_id") >= 7L).count() === 0L)
    assert(cells.select("vec_id").distinct().count() === 6L)
  }

  test("SRP bucketing puts identical vectors in the same bucket") {
    val vecs = Seq(
      (0L, Array.fill(8)(0.5f)),
      (10L, Array.fill(8)(0.5f)),
      (11L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val top = Ann.srpBucketTopK(vecs.filter(col("vec_id") === 0),
      vecs.filter(col("vec_id") > 0), k = 5, bits = 4, dims = 8).collect()
    assert(top.map(_.getLong(1)).toSet === Set(10L)) // opposite vector: other bucket
  }

  test("embedding-cosine near-dup finds identical vectors, not opposite ones") {
    val vecs = Seq(
      (0L, Array.fill(8)(0.5f)),
      (1L, Array.fill(8)(0.5f)),              // exact duplicate of 0
      (2L, Array.tabulate(8)(i => if (i == 0) 0.51f else 0.5f)), // near-dup
      (3L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")    // opposite
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.9, bits = 4, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.99)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("multimodal decode stub is deterministic and distributed") {
    val assets = Multimodal.fakeAssets(docs)
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.Asset]
    val feats = Multimodal.decodeFeatures(
      assets.select(col("doc_id"), col("bytes")).as[Multimodal.Asset])
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 32)  // doc_id%3==1 → md5 repeated twice
    assert(feats(2L).n_bytes === 48)  // same text, repeated three times
    // same underlying md5: checksums scale with the repeat count
    assert(feats(1L).checksum * 3L === feats(2L).checksum * 2L)
    assert(feats(3L).n_bytes === 16)
  }

  test("real image decode: ImageIO round-trips PNG dims/channels, reads a JPEG, degrades on junk") {
    import java.awt.image.BufferedImage
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.ImageAsset]
    // PNG family via the pngAssets generator (gray/RGB/ARGB by id%3)
    val metas = Multimodal.imageMeta(Multimodal.pngAssets(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val m = metas(id)
      assert(m.getString(1) === "png")
      assert(m.getInt(2) === (16 + id % 48).toInt, s"width of $id")
      assert(m.getInt(3) === (16 + id % 32).toInt, s"height of $id")
      assert(m.getInt(4) === Seq(1, 3, 4)((id % 3).toInt), s"channels of $id")
    }
    // a real JPEG through the same reader registry
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val junk = Array[Byte](1, 2, 3, 4)
    val extra = spark.createDataset(Seq(
      Multimodal.ImageAsset(100L, bos.toByteArray),
      Multimodal.ImageAsset(101L, junk)))
    val em = Multimodal.imageMeta(extra).collect().map(r => r.getLong(0) -> r).toMap
    assert(em(100L).getString(1).startsWith("jp")) // "jpeg"/"jpg" per reader
    assert(em(100L).getInt(2) === 20 && em(100L).getInt(3) === 10)
    assert(em(101L).getString(1) === "unknown" && em(101L).getInt(2) === -1)
  }

  test("real audio decode: javax.sound round-trips WAV rate/channels/frames, degrades on junk") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.AudioAsset]
    val metas = Multimodal.audioMeta(Multimodal.wavAssets(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val m = metas(id)
      assert(m.getString(1) === "pcm_signed", s"encoding of $id")
      assert(m.getInt(2) === Seq(8000, 16000, 44100)((id % 3).toInt), s"rate of $id")
      assert(m.getInt(3) === (1 + id % 2).toInt, s"channels of $id")
      assert(m.getInt(4) === 16, s"bits of $id")
      assert(m.getLong(5) === 100 + id % 400, s"frames of $id")
      val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
      assert(m.getLong(6) === (100 + id % 400) * 1000000L / rate, s"duration of $id")
    }
    val junk = Array[Byte](9, 9, 9, 9)
    val em = Multimodal.audioMeta(spark.createDataset(Seq(
      Multimodal.AudioAsset(200L, junk))))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(em(200L).getString(1) === "unknown" && em(200L).getInt(2) === -1)
  }

  test("real mp4 container decode: ISO-BMFF box walk round-trips brand/timescale/dims/tracks, degrades on junk") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.VideoAsset]
    val metas = Multimodal.mp4Meta(Multimodal.mp4Assets(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val m = metas(id)
      val ts = Seq(600, 1000, 90000)((id % 3).toInt)
      assert(m.getString(1) === "isom", s"brand of $id")
      assert(m.getInt(2) === ts, s"timescale of $id")
      assert(m.getLong(3) === 1000 + id % 9000, s"duration of $id")
      assert(m.getLong(4) === (1000 + id % 9000) * 1000000L / ts, s"duration_us of $id")
      assert(m.getInt(5) === (320 + 16 * (id % 8)).toInt, s"width of $id")
      assert(m.getInt(6) === (240 + 16 * (id % 5)).toInt, s"height of $id")
      assert(m.getInt(7) === (1 + id % 2).toInt, s"tracks of $id")
    }
    val junk = Array[Byte](0, 0, 0, 1, 'j', 'u', 'n', 'k')
    val em = Multimodal.mp4Meta(spark.createDataset(Seq(
      Multimodal.VideoAsset(300L, junk))))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(em(300L).getString(1) === "unknown" && em(300L).getInt(2) === -1)
  }

  test("mp4 frame sampling: stts box walk expands run-length timings, strides, degrades on junk") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.VideoAsset]
    val frames = Multimodal.mp4FrameSamples(Multimodal.mp4Assets(docs), stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val n1 = (8 + id % 8).toInt; val d1 = (100 + id % 100).toInt
      val n2 = (4 + id % 4).toInt; val d2 = (200 + id % 50).toInt
      val tsc = Seq(600, 1000, 90000)((id % 3).toInt)
      val expected = (0 until n1 + n2).filter(_ % 4 == 0)
      assert(frames.keys.count(_._1 == id) === expected.size, s"sample count of $id")
      expected.foreach { i =>
        val u = if (i < n1) i.toLong * d1 else n1.toLong * d1 + (i - n1).toLong * d2
        val f = frames((id, i.toLong))
        assert(f.getLong(2) === u, s"ts_units of $id/$i")
        assert(f.getLong(3) === u * 1000000L / tsc, s"ts_us of $id/$i")
      }
    }
    // junk bytes and stts-less containers yield no rows, not failures
    val junk = spark.createDataset(Seq(
      Multimodal.VideoAsset(300L, Array[Byte](0, 0, 0, 1, 'j', 'u', 'n', 'k'))))
    assert(Multimodal.mp4FrameSamples(junk, 2).count() === 0)
  }

  test("fuzzy decontamination: near-dup of a benchmark doc flagged, unrelated doc clean") {
    // docs 1-2 exact dups, 3 near-dup of 1, 4 unrelated; bench = {1}
    val hits = graft.ops.Decontaminate.contaminatedFuzzy(
      docs, "doc_id", "text", benchPred = col("doc_id") < 2,
      ngram = 3, k = 12, bands = 6, rows = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val flagged = hits.map(_._1).toSet
    assert(flagged.contains(2L)) // exact dup: jaccard 1.0
    assert(hits.find(_._1 == 2L).get._3 === 1.0)
    assert(!flagged.contains(4L)) // unrelated never verifies
    hits.foreach { case (_, b, j) => assert(b == 1L && j >= 0.5) }
  }

  test("oov rate: rare words count against the top-N vocabulary") {
    import spark.implicits._
    // 'zzz' appears once (rare), common words dominate the top-3 vocab
    val fixture = Seq(
      (1L, "a a a b b c"), (2L, "a b c zzz")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.oovRate(fixture, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_oov") === 0L)
    assert(out(2L).getAs[Long]("n_oov") === 1L) // only 'zzz' is OOV
    assert(out(2L).getAs[Double]("oov_rate") === 0.25)
  }

  test("gopher quality rules: word stats and the boolean verdict") {
    import spark.implicits._
    val fixture = Seq(
      // 31 words, varied vocab, has 'the' → passes every gate
      (1L, "the quick brown fox jumps over a lazy dog near the riverbank " +
        "while seven crows watch from tall pines and wind moves dry leaves " +
        "across old stone walls before dusk settles"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // repetitive + short
      (3L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.gopherQuality(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("pass") === 1)
    assert(out(2L).getAs[Int]("pass") === 0) // n_words < 30, topfrac 1.0, ttr 0.1
    assert(out(2L).getAs[Double]("top_word_frac") === 1.0)
    assert(out(3L).getAs[Int]("pass") === 0) // too short
    assert(out(1L).getAs[Long]("stop_hits") >= 2) // 'the' and 'a'
    assert(out(1L).getAs[Long]("n_words") === 31L)
  }

  test("ann recall@k: identity is 1.0, a disjoint probe reports 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 0.9, 1L), (1L, 11L, 0.8, 2L),
      (2L, 12L, 0.9, 1L), (2L, 13L, 0.7, 2L))
      .toDF("query_id", "vec_id", "sim", "rank")
    val hit = Seq((1L, 10L, 0.9, 1L), (1L, 99L, 0.5, 2L))
      .toDF("query_id", "vec_id", "sim", "rank")
    val out = graft.ops.Ann.recallAtK(exact, hit, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("hits") === 1L)
    assert(out(1L).getAs[Double]("recall") === 0.5)
    // query 2 found nothing in the approx side → present with recall 0
    assert(out(2L).getAs[Long]("hits") === 0L)
    assert(out(2L).getAs[Double]("recall") === 0.0)
  }

  test("resize downsamples the byte budget and stamps target metadata") {
    val assets = Multimodal.fakeAssets(docs)
    val small = Multimodal.resize(assets, targetW = 2, targetH = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 2 has 48 original bytes, budget 2*2*channels(2)=8 → every 6th byte
    val r2 = small(2L)
    assert(r2.getAs[Array[Byte]]("bytes").length === 8)
    val meta = r2.getStruct(2)
    assert(meta.getAs[Int]("width") === 2 && meta.getAs[Int]("height") === 2)
    assert(meta.getAs[Int]("orig_bytes") === 48)
    // already-small assets pass through untouched
    val noop = Multimodal.resize(assets, targetW = 64, targetH = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes").length).toMap
    assert(noop(3L) === 16)
  }

  test("frame sampling slices the binary column") {
    val frames = Multimodal.frameSample(Multimodal.fakeAssets(docs), frameSize = 8, stride = 2)
    val f1 = frames.filter(col("doc_id") === 1).collect()
    assert(f1.map(_.getInt(1)).toSeq === Seq(0, 2)) // 32 bytes → frames 0..3, stride 2
    assert(f1.forall(_.getAs[Array[Byte]]("frame").length === 8))
  }

  test("near-dup clusters close transitively over the pair graph") {
    // a~b and b~c overlap heavily pairwise, a~c less so — the chain must
    // still land in ONE cluster labeled by the min id
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val chain = Seq(
      (1L, base),
      (2L, base + " lambda"),
      (3L, "omega " + base.split(' ').drop(1).mkString(" ") + " lambda mu"),
      (10L, "completely unrelated text about graphs and spark and parquet files"),
      (11L, "completely unrelated text about graphs and spark and parquet data"))
      .toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(chain, "doc_id", "text",
        ngram = 2, k = 12, bands = 6, rows = 2, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L && clusters(3L) === 1L)
    assert(clusters.get(10L).forall(_ === 10L)) // separate cluster if paired at all
  }

  test("packBlocks assigns greedy running-sum blocks; mixSample is deterministic") {
    val d = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
      .toDF("doc_id", "text")
    // one bucket, budget 4: token counts 3,2,4,1 → start offsets 0,3,5,9
    // → blocks 0,0,1,2
    val p = graft.ops.Packing.packBlocks(d, "doc_id", "text", budget = 4, buckets = 1)
      .orderBy("doc_id").collect()
    assert(p.map(_.getAs[Long]("block")).toSeq === Seq(0L, 0L, 1L, 2L))
    assert(p.map(_.getAs[Long]("n_tokens")).toSeq === Seq(3L, 2L, 4L, 1L))
    // rate 1.0 keeps everything, default 0.0 drops everything, and the
    // same call yields the same sample (hash, not rng)
    assert(graft.ops.Packing.mixSample(d, "doc_id", lit("x"), Map("x" -> 1.0)).count() === 4)
    assert(graft.ops.Packing.mixSample(d, "doc_id", lit("x"), Map.empty, 0.0).count() === 0)
    val s1 = graft.ops.Packing.mixSample(d, "doc_id", lit("x"), Map("x" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = graft.ops.Packing.mixSample(d, "doc_id", lit("x"), Map("x" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
  }

  test("temperatureMix: alpha=1 reproduces natural rates, alpha→0 flattens, small sources saturate") {
    // two sources, 9:1 char mass split via 10-char rows
    val d = (1L to 100L).map(i =>
      (i, if (i <= 90) "big" else "small", 10L)).toDF("doc_id", "src", "n_chars")
    def rates(alpha: Double, f: Double): Map[String, Double] =
      graft.ops.Packing.temperatureMix(d, "doc_id", col("src"), col("n_chars"),
        alpha, f).select("stratum", "rate").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=1: p_s = n_s/N, so every source keeps exactly the target fraction
    val r1 = rates(1.0, 0.4)
    assert(math.abs(r1("big") - 0.4) < 1e-6 && math.abs(r1("small") - 0.4) < 1e-6)
    // alpha→0: p_s → 1/|S|; the small source is oversampled 5× (capped ≤ 1),
    // the big one undersampled to 0.4 * (N/2)/n_big = 0.2222…
    val r0 = rates(0.0, 0.4)
    assert(r0("small") === 1.0)
    assert(math.abs(r0("big") - 0.4 * 50.0 / 90.0) < 1e-6)
    // determinism: same call, same kept set
    val k1 = graft.ops.Packing.temperatureMix(d, "doc_id", col("src"),
      col("n_chars"), 0.6, 0.4).select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = graft.ops.Packing.temperatureMix(d, "doc_id", col("src"),
      col("n_chars"), 0.6, 0.4).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 === k2 && k1.nonEmpty)
  }

  test("keepBestPerCluster keeps the highest-score member per cluster; singletons keep themselves") {
    // docs 1,2,3 cluster together (2 exact, 3 near dup of 1); 4 is alone.
    // score = doc_id makes the HIGHEST id the keeper — the case the
    // drop-the-larger-id rule gets wrong.
    val out = graft.ops.Dedup.keepBestPerCluster(docs, "doc_id", "text",
      scoreCol = col("doc_id"), ngram = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    val clustered = out.filter(_._2._1 == 1L).keySet // min-id cluster label
    assert(clustered.contains(1L) && clustered.contains(2L))
    val keeper = clustered.max
    assert(out(keeper)._2 === true)                       // best score kept
    assert(clustered.filter(_ != keeper).forall(!out(_)._2)) // others dropped
    assert(out(4L) === (4L, true))                        // singleton keeps itself
    graft.core.Pin.clear()
  }

  test("top_k_by: exact per-key top-k across partitions, (ord desc, payload asc) ties, k > group size") {
    import graft.functions.TopK
    // 3 keys × 40 rows spread over 8 partitions; key "c" has only 2 rows;
    // key "b" has an ord tie at the k boundary
    val rows = (1L to 40L).flatMap { i =>
      Seq(("a", i, i.toDouble), ("b", i, math.min(i, 38L).toDouble)) // b: 38,39,40 tie at 38.0
    } ++ Seq(("c", 1L, 5.0), ("c", 2L, 4.0))
    val df = rows.toDF("key", "id", "v").repartition(8)
    TopK.registerKernels(df)
    val out = df.groupBy(col("key")).agg(TopK.topKBy(col("v"), col("id"), 3).as("tk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
    assert(out("a") === Seq((40.0, 40L), (39.0, 39L), (38.0, 38L)))
    // b: ords are min(i,38) → three rows tie at 38.0 (ids 38,39,40);
    // ties rank payload ASC
    assert(out("b") === Seq((38.0, 38L), (38.0, 39L), (38.0, 40L)))
    assert(out("c") === Seq((5.0, 1L), (4.0, 2L))) // k > group size → whole group
  }

  test("top_k_rows: full rows survive the heap, string ties rank ASC, partials merge") {
    import graft.functions.TopK
    // string ids (topKBy can't carry them), extra payload columns the
    // pair-heap would drop; spread over 8 partitions to exercise merge
    val rows = (1 to 40).flatMap { i =>
      Seq(("a", f"id$i%02d", i.toDouble, i * 10L),
          ("b", f"id$i%02d", math.min(i, 38).toDouble, i * 100L))
    } ++ Seq(("c", "only", 5.0, 7L))
    val df = rows.toDF("key", "id", "v", "extra").repartition(8)
    TopK.registerKernels(df)
    val out = df.groupBy(col("key"))
      .agg(TopK.topKRows(col("v"), col("id"),
        struct(col("id"), col("v"), col("extra")), 3).as("tk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getDouble(1), x.getLong(2))))
      .toMap
    assert(out("a") === Seq(("id40", 40.0, 400L), ("id39", 39.0, 390L), ("id38", 38.0, 380L)))
    // b ties at 38.0 for ids 38..40: string tie ranks ASC (id38 < id39 < id40)
    assert(out("b") === Seq(("id38", 38.0, 3800L), ("id39", 38.0, 3900L), ("id40", 38.0, 4000L)))
    assert(out("c") === Seq(("only", 5.0, 7L)))
    // null ord rows drop; null tie throws (the topKBy contract)
    val withNull = (rows :+ (("c", "nullv", Double.NaN, 1L)))
      .toDF("key", "id", "v", "extra")
      .withColumn("v", when(col("id") === "nullv", lit(null)).otherwise(col("v")))
    val c2 = withNull.filter(col("key") === "c").groupBy(col("key"))
      .agg(TopK.topKRows(col("v"), col("id"), struct(col("id")), 5).as("tk"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)))
    assert(c2.head === Seq("only"))
    intercept[Exception] {
      withNull.withColumn("id", when(col("id") === "only", lit(null)).otherwise(col("id")))
        .groupBy(col("key"))
        .agg(TopK.topKRows(col("v"), col("id"), struct(col("v")), 5).as("tk"))
        .collect()
    }
  }

  test("incrementalNearDups matches batch docs to corpus + earlier batch only") {
    val d5 = docs.union(Seq(
      (5L, "the quick brown fox jumps over the lazy cat today")) // dup of 3
      .toDF("doc_id", "text"))
    val out = graft.ops.Dedup.incrementalNearDups(d5, "doc_id", "text",
      isNew = col("doc_id") >= 2, ngram = 2, k = 12, bands = 6, rows = 2,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((2L, 1L)))        // batch vs corpus (exact dup)
    assert(out.contains((5L, 3L)))        // batch vs EARLIER batch row
    assert(!out.contains((3L, 5L)))       // never the reverse direction
    assert(!out.exists(_._1 === 1L))      // the corpus doc is not a new_id
    graft.core.Pin.clear()
  }

  test("asOfJoin matches the latest right row at-or-before each left row; ties by greatest tie") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val lefts = Seq((1L, t(100), 10L), (1L, t(50), 11L), (2L, t(10), 20L))
      .toDF("k", "ts", "lid")
    val rights = Seq(
      (1L, t(40), 100L), (1L, t(100), 101L), (1L, t(100), 102L), // tie at 100
      (1L, t(200), 103L), (3L, t(5), 300L))
      .toDF("k", "ts", "rid")
    val out = graft.ops.AsOf.asOfJoin(lefts, rights, "k", "ts", "rid", Seq("rid"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(10L) === Some(102L)) // equal-ts match allowed; tie → greatest rid
    assert(out(11L) === Some(100L)) // strictly-prior right row
    assert(out(20L) === None)       // key 2 has no right rows at all
  }

  test("decontamination flags n-gram overlap with the benchmark, clean() drops it") {
    val bench = Seq("what is the capital of france paris").toDF("text")
    val corpus = Seq(
      // contains the bench 4-gram "the capital of france" verbatim
      (1L, "students often ask what the capital of france might be called"),
      // shares only shorter overlaps (no full 4-gram)
      (2L, "the capital city is large and france is a country in europe"),
      (3L, "completely unrelated document about spark shuffles and parquet"))
      .toDF("doc_id", "text")
    val hits = graft.ops.Decontaminate
      .contaminated(corpus, bench, "doc_id", "text", "text", ngram = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 1L)
    assert(!hits.contains(2L) && !hits.contains(3L))
    val surviving = graft.ops.Decontaminate
      .clean(corpus, bench, "doc_id", "text", "text", ngram = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving === Set(2L, 3L))
    // a benchmark item SHORTER than n falls back to its whole token
    // sequence and still catches verbatim copies
    val shortBench = Seq("rare answer token").toDF("text")
    val hits2 = graft.ops.Decontaminate
      .contaminated(corpus.union(Seq((4L, "rare answer token")).toDF("doc_id", "text")),
        shortBench, "doc_id", "text", "text", ngram = 13)
      .collect().map(_.getLong(0)).toSet
    assert(hits2 === Set(4L))
  }

  test("PII redaction scrubs emails, urls and phones in order") {
    val r = Seq(Tuple1("mail a.b+c@ex-ample.org then https://x.io/p?q=1#f and call +44 (0) 20-7946 0958 done"))
      .toDF("t").select(graft.functions.TextFunctions.redactPii(col("t"))).head().getString(0)
    assert(r === "mail <email> then <url> and call <phone> done")
    // text with none of the patterns passes through unchanged
    val clean = Seq(Tuple1("no contact info here")).toDF("t")
      .select(graft.functions.TextFunctions.redactPii(col("t"))).head().getString(0)
    assert(clean === "no contact info here")
  }

  test("semantic dedup drops within-cluster near-dups, keeps the lowest id and distant members") {
    // two tight direction-clusters; 0/1/2 nearly parallel (cos ≈ 1),
    // 10/11 parallel to each other but orthogonal to the first group,
    // 20 orthogonal to everything
    def v(x: Float, y: Float, z: Float) = Array(x, y, z)
    val e = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(0.99f, 0.01f, 0f)), (2L, v(1f, 0.02f, 0f)),
      (10L, v(0f, 1f, 0f)), (11L, v(0f, 0.98f, 0.01f)),
      (20L, v(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val r = graft.ops.Dedup.semanticNearDups(e, "vec_id", "embedding",
        nClusters = 3, iters = 2, threshold = 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r.size === 6)
    assert(r(0L) === true)                    // lowest id of its group survives
    assert(r(1L) === false && r(2L) === false) // near-dups of 0 dropped
    assert(r(10L) === true && r(11L) === false)
    assert(r(20L) === true)                    // no near neighbor anywhere
    graft.core.Pin.clear()
  }

  test("duplicated windows: shared and repeated n-grams counted per doc, short docs fall back") {
    val d = Seq(
      (1L, "a b c d e"),      // windows (n=3): abc bcd cde
      (2L, "x y a b c"),      // windows: xya yab abc — shares abc with doc 1
      (3L, "p q p q p q"),    // pqp qpq pqp qpq — internal repeats
      (4L, "s t"))            // short → one whole-sequence window, unique
      .toDF("doc_id", "text")
    val r = graft.ops.Dedup.duplicatedWindows(d, "doc_id", "text", n = 3)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) === ((3L, 1L, 0.333333)))   // abc duplicated (doc 2 has it)
    assert(r(2L) === ((3L, 1L, 0.333333)))
    assert(r(3L) === ((4L, 4L, 1.0)))        // every window repeats within the doc
    assert(r(4L) === ((1L, 0L, 0.0)))
    graft.core.Pin.clear()
  }

  test("DSIR importance weights: in-target tokens push weight up; math matches by hand") {
    // corpus tokens: target docs {1,2} use "a b"; out-of-domain doc 3 uses "z"
    val c = Seq((1L, "a b"), (2L, "a a"), (3L, "z z b")).toDF("doc_id", "text")
    val target = c.filter(col("doc_id") <= 2)
    val r = graft.ops.Corpus.importanceWeights(c, "doc_id", "text", target)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // raw counts: a=3 b=2 z=2, tot=7, V=3; target counts: a=3 b=1, tot=4
    def pT(ct: Double) = (ct + 1) / (4.0 + 3.0)
    def pR(cr: Double) = (cr + 1) / (7.0 + 3.0)
    def w(toks: (Double, Double)*) =
      BigDecimal(toks.map { case (ct, cr) => math.log(pT(ct)) - math.log(pR(cr)) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) === ((2L, w((3, 3), (1, 2)))))           // a, b
    assert(r(2L) === ((2L, w((3, 3), (3, 3)))))           // a, a
    assert(r(3L) === ((3L, w((0, 2), (0, 2), (1, 2)))))   // z, z, b
    assert(r(1L)._2 > r(3L)._2) // in-domain doc outweighs out-of-domain
    graft.core.Pin.clear()
  }

  test("bm25: rare-term docs outrank common-term docs; k bounds the result") {
    val d = Seq(
      (1L, "rare word here with filler tokens around"),
      (2L, "common common common common common common common"),
      (3L, "rare rare word appears twice in this doc"),
      (4L, "nothing matching at all in this one here"))
      .toDF("doc_id", "text")
    val r = graft.ops.Search.bm25TopK(d, "doc_id", "text",
      Seq("rare", "common"), k = 3).collect()
    assert(r.length === 3)
    val ids = r.map(_.getLong(0))
    assert(!ids.contains(4L))               // no query term → never retrieved
    // same term, higher tf wins: doc 3 (rare ×2) must beat doc 1 (rare ×1)
    val score = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(score(3L) > score(1L))
    graft.core.Pin.clear()
  }

  test("unigram logprob: common-token docs outscore rare-token docs; math matches by hand") {
    // corpus: "a" appears 4x, "b" 2x, "z" 1x; total 7 tokens
    val c = Seq((1L, "a a a b"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    val rows = graft.ops.Corpus.unigramLogProb(c, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val t = 7.0
    def lp(cnts: Seq[Double]) =
      BigDecimal(cnts.map(math.log).sum / cnts.size - math.log(t))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L)._1 === 4L)
    assert(rows(1L)._2 === lp(Seq(4, 4, 4, 2)))
    assert(rows(2L)._2 === lp(Seq(4, 2)))
    assert(rows(3L)._2 === lp(Seq(1)))
    // the all-common doc scores strictly higher than the rare-token doc
    assert(rows(1L)._2 > rows(3L)._2)
  }

  test("KMV sketch: exact below k, estimate within bounds above k, merge-invariant") {
    import graft.ops.Sketch
    val small = (1 to 10).map(i => s"v$i").toDF("x")
    Sketch.registerKernels(small)
    val s1 = small.select(Sketch.hash60(col("x")).as("h"))
      .agg(Sketch.kmvEstimate(col("h"), 64).as("s")).select("s.*").head()
    assert(s1.getAs[Long]("n_kept") === 10L)
    assert(s1.getAs[Double]("est") === 10.0)          // not full ⇒ exact
    val big = (1 to 2000).map(i => s"v$i").toDF("x")
    def est(parts: Int) = big.repartition(parts)
      .select(Sketch.hash60(col("x")).as("h"))
      .agg(Sketch.kmvEstimate(col("h"), 64).as("s")).select("s.*").head()
    val e1 = est(1); val e7 = est(7)
    // partial-buffer merges across any partitioning give the SAME sketch
    assert(e1.getAs[Double]("est") === e7.getAs[Double]("est"))
    assert(e1.getAs[Long]("hk") === e7.getAs[Long]("hk"))
    // k=64 ⇒ ~12% stderr; 2000 ± 50% is a generous non-flaky band
    assert(e1.getAs[Double]("est") > 1000.0 && e1.getAs[Double]("est") < 4000.0)
  }

  test("random projection: deterministic, linear, long-form shape") {
    val e = Seq((1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(2.0f)),
      (3L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val r = Ann.randomProjection(e, "vec_id", "embedding", dOut = 4, dims = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r.size === 12)                              // 3 vecs × 4 dims
    for (d <- 0L until 4L) {
      assert(r((3L, d)) === 0.0)                       // zero vector → zero
      assert(math.abs(r((2L, d)) - 2.0 * r((1L, d))) < 1e-6)  // linearity
    }
  }

  test("knn graph: neighbors stay within the trained cell, nearest first") {
    def v(a: Float, b: Float, c: Float) = Array(a, b, c)
    val e = Seq(
      (1L, v(1f, 0f, 0f)), (2L, v(0.9f, 0.1f, 0f)), (3L, v(0.8f, 0.2f, 0f)),
      (10L, v(0f, 0f, 1f)), (11L, v(0f, 0.1f, 0.9f))).toDF("vec_id", "embedding")
    val g = Ann.knnGraph(e, nClusters = 2, iters = 2, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).groupBy(_._1)
    // cluster {1,2,3} never links to {10,11} and vice versa
    val n1 = g(1L).map(_._2._1).toSet
    assert(n1.subsetOf(Set(2L, 3L)))
    assert(g(10L).map(_._2._1).toSet === Set(11L))
    // rank 1 for vec 1 is its closest neighbor (vec 2)
    val rank1 = g(1L).find(_._2._2 == 1L).get._2._1
    assert(rank1 === 2L)
    graft.core.Pin.clear()
  }

  test("PMI ranks the always-adjacent pair above a weakly-associated one") {
    // "x y" always adjacent; "p"/"y" co-occur only via window spillover —
    // (x,y) must strictly beat it. (Comparing against another PERFECT pair
    // would tie: PMI of a pair whose members only appear together is
    // ln(P·T²/...) regardless of frequency — the known rare-pair ceiling.)
    val d = Seq((1L, "x y a p q"), (2L, "x y b p q"), (3L, "x y a b p"),
      (4L, "x y p q r"), (5L, "x y q r p")).toDF("doc_id", "text")
    val rows = graft.ops.Corpus.pmiPairs(d, "doc_id", "text",
      window = 2, minCount = 2, k = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(rows.contains(("x", "y")))
    assert(rows(("x", "y")) > rows(("p", "y")))
    graft.core.Pin.clear()
  }

  test("c4 rules flag lorem/brace/policy and short docs") {
    val d = Seq(
      (1L, "a perfectly ordinary document with plenty of words inside"),
      (2L, "this one has lorem ipsum filler text inside it"),
      (3L, "code sample { return 1; } embedded in the page"),
      (4L, "please read our privacy policy before continuing onward"),
      (5L, "too short")).toDF("doc_id", "text")
    val m = graft.ops.Corpus.c4Rules(d, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("pass")).toMap
    assert(m === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
  }

  test("tfidf top terms: corpus-wide stopword scores 0, rare term ranks first") {
    val d = Seq(
      (1L, "the zebra the the"),      // 'the' in every doc → idf 0
      (2L, "the lion roars"),
      (3L, "the lion sleeps")).toDF("doc_id", "text")
    val rows = graft.ops.Corpus.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> (r.getString(1), r.getDouble(4)))
      .toMap
    assert(rows((1L, 1L))._1 === "zebra")          // df=1 beats tf=3 'the'
    assert(rows((1L, 2L)) === ("the", 0.0))        // ln(3/3) = 0
    assert(rows((2L, 1L))._1 === "roars")          // df=1 beats df=2 'lion'
    graft.core.Pin.clear()
  }

  test("char entropy: single-char doc = 0, uniform alphabet = log2(n)") {
    val d = Seq((1L, "aaaa"), (2L, "abcd")).toDF("doc_id", "text")
    val m = graft.ops.Corpus.charEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) === 0.0)
    assert(m(2L) === 2.0)
  }

  test("perplexity buckets partition the corpus and agree with the z sign") {
    val d = (0L until 30L).map(i =>
      (i, if (i % 10 == 0) s"rare${i}word unique${i}token oddity${i}"
          else "the common words appear in every single document here"))
      .toDF("doc_id", "text")
    val rows = graft.ops.Corpus.perplexityBuckets(d, "doc_id", "text").collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val (z, b) = (r.getDouble(3), r.getString(4))
      if (z >= 0.5) assert(b === "head")
      else if (z <= -0.5) assert(b === "tail")
      else assert(b === "middle")
    }
    // the rare-token docs are the least fluent → all in the tail
    assert(rows.filter(_.getLong(0) % 10 == 0).forall(_.getString(4) == "tail"))
    graft.core.Pin.clear()
  }

  test("url domains aggregates doc and hit counts") {
    val d = Seq(
      (1L, "see https://a.example.com/x and https://a.example.com/y"),
      (2L, "see https://a.example.com/z and http://b.other.net/w"),
      (3L, "no urls at all here")).toDF("doc_id", "text")
    val m = graft.ops.Corpus.urlDomains(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("a.example.com") === (2L, 3L))
    assert(m("b.other.net") === (1L, 1L))
    assert(m.size === 2)
  }

  test("count-min estimate always dominates the exact count") {
    val items = (0 until 500).map(i => s"tok${i % 37}").toDF("tok")
    val rows = graft.ops.Sketch.countMinTopK(items.toDF("tok"), "tok",
      depth = 4, width = 16, k = 10).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1)))  // est >= exact
  }

  test("embedding standardize: per-dim z-scores sum to ~0") {
    val vecs = Seq(
      (0L, Array(1.0f, 10.0f)), (1L, Array(2.0f, 20.0f)),
      (2L, Array(3.0f, 30.0f)), (3L, Array(4.0f, 40.0f)))
      .toDF("vec_id", "embedding")
    val rows = Ann.standardize(vecs, "vec_id", "embedding").collect()
    assert(rows.length === 8)
    val byDim = rows.groupBy(_.getLong(1))
    byDim.values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(2)).sum) < 1e-6)
      assert(math.abs(rs.map(_.getDouble(2)).max - 1.161895) < 1e-5)
    }
  }

  test("bloom decontamination flags a superset of exact n-gram hits") {
    val bench = Seq("what is the capital of france paris").toDF("text")
    val corpus = Seq(
      (1L, "students often ask what the capital of france might be called"),
      (2L, "the capital city is large and france is a country in europe"),
      (3L, "completely unrelated document about spark shuffles and parquet"))
      .toDF("doc_id", "text")
    val exact = graft.ops.Decontaminate
      .contaminated(corpus, bench, "doc_id", "text", "text", ngram = 4)
      .collect().map(_.getLong(0)).toSet
    val bloom = graft.ops.Decontaminate
      .bloomContaminated(corpus, bench, "doc_id", "text", "text",
        ngram = 4, mBits = 4096, kHashes = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.subsetOf(bloom.keySet))  // one-sided error only
    assert(bloom(1L) >= 1L)
    graft.core.Pin.clear()
  }

  test("bigram logprob: in-corpus-order doc outscores shuffled-order doc; math by hand") {
    // corpus bigrams: (a,b) 2x, (b,c) 2x, (c,a) 1x, (b,a) 1x; vocab = 3
    val c = Seq((1L, "a b c"), (2L, "a b c"), (3L, "b a")).toDF("doc_id", "text")
    val rows = graft.ops.Corpus.bigramLogProb(c, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // unigram counts: a 3, b 3, c 2; V = 3
    def lp(terms: Seq[(Double, Double)]) =
      BigDecimal(terms.map { case (c12, c1) => math.log((c12 + 1) / (c1 + 3)) }
        .sum / terms.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L)._1 === 2L)
    assert(rows(1L)._2 === lp(Seq((2, 3), (2, 3))))   // p(b|a), p(c|b)
    assert(rows(3L)._2 === lp(Seq((1, 3))))           // p(a|b)
    assert(rows(1L)._2 > rows(3L)._2)
    graft.core.Pin.clear()
  }

  test("containment: sub-document dup scores high where jaccard stays low") {
    // big = small + one word: containment small→big = 1.0 while the reverse
    // is 4/5 — the asymmetry jaccard (also 0.8 here) can't distinguish; the
    // pair still shares enough shingle mass for the bands to collide (the
    // recall trade documented on containmentPairs)
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " eta"
    val d = Seq((1L, small), (2L, big), (3L, "unrelated text entirely different corpus"))
      .toDF("doc_id", "text")
    val rows = graft.ops.Dedup.containmentPairs(d, "doc_id", "text",
      ngram = 3, k = 12, bands = 6, rows = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows.contains((1L, 2L)))                   // passes on c_ab alone
    val (cab, cba) = rows((1L, 2L))
    assert(cab === 1.0)       // every shingle of the small doc is in the big
    assert(cba === 0.8)       // the reverse direction is below the gate
    assert(!rows.keySet.exists { case (a, b) => a == 3L || b == 3L })
    graft.core.Pin.clear()
  }

  test("hits: hub mass on the pointer, authority mass on the target; sums 1") {
    // star pointing out: h -> a1, h -> a2 (h is the only hub, a* the authorities)
    val verts = Seq("h", "a1", "a2").toDF("id")
    val adj = Seq(("h", "a1"), ("h", "a2")).toDF("src", "dst")
    val got = graft.olap.Algorithms.hits(verts, adj, iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("h") === ((1.0, 0.0)))
    assert(got("a1") === ((0.0, 0.5)) && got("a2") === ((0.0, 0.5)))
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
    graft.core.Pin.clear()
  }

  test("coreness tiers: clique members reach the top probe, pendants none") {
    // K4 on a,b,c,d plus pendant p-a
    val e = Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"),("a","p"))
      .toDF("src", "dst")
    val got = graft.olap.Algorithms.corenessTiers(e, Seq(2, 3))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))  // p: deg 1, no tier
    graft.core.Pin.clear()
  }

  test("eccentricity: path-graph endpoints see the full length, center half") {
    // path a-b-c-d-e
    val fwd = Seq(("a","b"),("b","c"),("c","d"),("d","e")).toDF("src","dst")
    val adj = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val got = graft.olap.Algorithms.eccentricity(
      Seq("a", "c").toDF("id"), adj, maxDepth = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") === ((4L, 4L)))
    assert(got("c") === ((2L, 4L)))
  }

  test("weighted sample: deterministic, k-bounded, favors heavy weights") {
    val d = (1L to 200L).map(i => (i, if (i % 2 == 0) 1000L else 1L))
      .toDF("doc_id", "w")
    val s1 = graft.ops.Packing.weightedSample(d, "doc_id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    val s2 = graft.ops.Packing.weightedSample(d, "doc_id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2 && s1.size === 40)            // reproducible draw
    assert(s1.count(_ % 2 == 0) >= 35)             // heavy weights dominate
  }

  test("seeded lpa: labels spread from clamped seeds, unreached stay out") {
    // chain: s1 - a - b - c,  isolated: z (no edges)
    val verts = Seq("s1", "a", "b", "c", "z").toDF("id")
    val fwd = Seq(("s1", "a"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Seq(("s1", "red")).toDF("id", "lbl")
    val got = graft.olap.Algorithms.seededLpa(verts, edges, seeds, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("s1" -> "red", "a" -> "red", "b" -> "red"))  // 2 hops
    val got3 = graft.olap.Algorithms.seededLpa(verts, edges, seeds, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got3("c") === "red")
    graft.core.Pin.clear()
  }

  test("item-item cf: perfect co-occurrence scores 1, cosine discounts popularity") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),   // x,y always together
      (3L, "x"), (3L, "p"), (4L, "p"))              // p once with x
      .toDF("basket", "item")
    val rows = graft.ops.Search.itemItemCf(baskets, "basket", "item", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(math.abs(rows(("x", "y")) - 2.0 / math.sqrt(3 * 2)) < 1e-6)
    assert(math.abs(rows(("x", "p")) - 1.0 / math.sqrt(3 * 2)) < 1e-6)
    assert(rows(("y", "x")) === rows(("x", "y")))   // symmetric directions
  }

  test("item-item cf: basketCap bounds a degenerate mega-basket's pair fan-out") {
    // basket 1 is degenerate (10 items); basket 2 is a normal pair
    val mega = (0 until 10).map(i => (1L, f"i$i%02d"))
    val baskets = (mega ++ Seq((2L, "i00"), (2L, "i01"))).toDF("basket", "item")
    // cap=3 keeps only {i00,i01,i02} of the mega-basket: directed pairs from
    // basket 1 = 3*2/2 = 3, basket 2 adds to (i00,i01)'s count; symmetrized = 6
    val capped = graft.ops.Search.itemItemCf(baskets, "basket", "item",
      k = 100, basketCap = 3).collect()
    assert(capped.length === 6)
    val byPair = capped.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byPair(("i00", "i01")) === 2L)           // both baskets co-occur
    assert(byPair(("i00", "i02")) === 1L)           // capped basket only
    assert(!byPair.contains(("i00", "i03")))        // i03 dropped by the cap
    // frequencies stay UNCAPPED: i03 never pairs, but i00's na counts both baskets
    assert(capped.find(r => r.getString(0) == "i00").get.getLong(3) === 2L)
    // default cap is above any real basket: uncapped twin has 10*9/2+1... all pairs
    val full = graft.ops.Search.itemItemCf(baskets, "basket", "item", k = 100)
      .collect()
    assert(full.length === 10 * 9) // all symmetric mega-basket pairs survive
    graft.core.Pin.clear()
  }

  test("bpe: merges match hand computation, fold is left-to-right non-overlapping") {
    // corpus: "low" x3, "lower" x1, "aaaa" x2
    // pair counts round 1: (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1, (a,a)=6
    //   -> merge (a,a) c=6; "aaaa" folds to [aa, aa] (non-overlapping)
    // round 2: (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1, (aa,aa)=2 -> (l,o) by tie
    // round 3: (lo,w)=4, (w,e)=1, (e,r)=1, (aa,aa)=2 -> (lo,w)
    val d = Seq((1L, "low low low aaaa"), (2L, "lower aaaa")).toDF("doc_id", "text")
    val m = graft.ops.Bpe.merges(d, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(m(1L) === (("a", "a", 6L)))
    assert(m(2L) === (("l", "o", 4L)))
    assert(m(3L) === (("lo", "w", 4L)))
    val enc = graft.ops.Bpe.encodeStats(d, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1: 3x "low"->[low]... after 3 merges "low" = [low]? merges: (a,a),(l,o),(lo,w)
    //   "low" -> chars l,o,w -> (l,o) -> [lo, w] -> (lo,w) -> [low]: 1 token
    //   "aaaa" -> [aa, aa]: 2 tokens
    assert(enc(1L) === ((4L, 13L, 5L)))  // 3 words x 3 chars + 4 = 13 chars; 3x1 + 2 = 5 tokens
    assert(enc(2L) === ((2L, 9L, 5L)))   // "lower"=5 chars ->[low,e,r]=3; "aaaa"->2
    graft.core.Pin.clear()
  }

  test("bpe: batched barriers replay the sequential argmax exactly") {
    // a corpus with interacting pairs (shared symbols force rejections)
    // and independent ones (disjoint pairs batch together)
    val d = Seq(
      (1L, "low low low lowest aaaa bbbb cc cc cc"),
      (2L, "lower aaaa bbbb xyz xyz xyz xyz"),
      (3L, "qrs qrs tuv tuv tuv wished wished")).toDF("doc_id", "text")
    val seq1 = graft.ops.Bpe.train(d, "doc_id", "text", merges = 8, batch = 1)._1
    for (b <- Seq(3, 4, 8)) {
      graft.core.Pin.clear()
      val batched = graft.ops.Bpe.train(d, "doc_id", "text", merges = 8, batch = b)._1
      assert(batched === seq1, s"batch=$b diverged from sequential")
    }
    graft.core.Pin.clear()
  }

  test("bpe: symbol-aliasing corpora replay sequential exactly (alias batch closure)") {
    // the aliasing shape: when an accepted merge's concatenation equals an
    // already-existing symbol (accepting (a,bc) while 'abc' exists from an
    // earlier (ab,c)), counts of pairs involving that symbol INCREASE and
    // the disjoint/sharedMax bounds can't see it — the batch must close.
    // Small-alphabet corpora with deep merge cascades make such collisions
    // likely; every one must replay the sequential argmax bit-for-bit.
    // the guard's unit surface (acceptBatch is the pure batch-acceptance
    // logic train() drives): a window candidate whose concatenation equals
    // a previously learned merge's concatenation CLOSES the batch right
    // after its own acceptance — everything later needs fresh counts
    import graft.ops.Bpe.acceptBatch
    val w1 = Seq(("x", "y", 100L), ("a", "bc", 90L), ("p", "q", 80L))
    // without the alias, all three disjoint dominant pairs batch together
    assert(acceptBatch(w1, want = 3, knownConcats = Set.empty, floorOutside = 0L)
      === w1)
    // 'abc' exists (earlier (ab,c) merge): accept (a,bc) — its count was
    // read pre-merge and it IS the next argmax — but close the batch there
    assert(acceptBatch(w1, want = 3, knownConcats = Set("abc"), floorOutside = 0L)
      === w1.take(2))
    // the HEAD aliasing closes immediately after it
    assert(acceptBatch(w1, want = 3, knownConcats = Set("xy"), floorOutside = 0L)
      === w1.take(1))
    // within-batch aliasing: (ab,c) accepted first creates 'abc'; a later
    // disjoint dominant candidate (q,rs) with concat 'qrs' is fine, but
    // one whose concat equals the earlier acceptance's is a closure
    val w2 = Seq(("ab", "c", 100L), ("q", "rs", 90L), ("t", "u", 80L))
    assert(acceptBatch(w2, 3, Set.empty, 0L) === w2)
    val w3 = Seq(("ab", "c", 100L), ("a", "bc", 90L), ("t", "u", 80L))
    assert(acceptBatch(w3, 3, Set.empty, 0L) === w3.take(2))
    // the pre-existing bounds still apply: shared symbol → rejection
    val w4 = Seq(("a", "b", 100L), ("b", "c", 90L))
    assert(acceptBatch(w4, 2, Set.empty, 0L) === w4.take(1))

    // end-to-end sweep: small-alphabet corpora with deep merge cascades —
    // batched must replay sequential bit-for-bit (the guard is
    // conservative: on natural corpora it rarely-to-never fires, so
    // batching throughput is unaffected)
    val rnd = new scala.util.Random(42)
    for (t <- 1 to 4) {
      val words = Seq.fill(12) {
        val len = 2 + rnd.nextInt(4)
        (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
          1 + rnd.nextInt(9))
      }
      val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
      val d = Seq((1L, text)).toDF("doc_id", "text")
      graft.core.Pin.clear()
      val seq1 = graft.ops.Bpe.train(d, "doc_id", "text", merges = 10, batch = 1)._1
      graft.core.Pin.clear()
      val batched = graft.ops.Bpe.train(d, "doc_id", "text", merges = 10, batch = 4)._1
      assert(batched === seq1, s"corpus $t: batch=4 diverged from sequential")
    }
    graft.core.Pin.clear()
  }

  test("source overlap: identical sources jaccard 1, disjoint absent") {
    val d = Seq(
      (1L, "alpha beta gamma", "s1"), (2L, "alpha beta gamma", "s2"),
      (3L, "delta epsilon zeta", "s3")).toDF("doc_id", "text", "source")
    val rows = graft.ops.Corpus.sourceOverlap(d, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(rows(("s1", "s2")) === 1.0)
    assert(!rows.contains(("s1", "s3")))   // no shared token → no pair row
    graft.core.Pin.clear()
  }

  test("source card: counts, vocab and language-mix entropy") {
    val d = Seq(
      (1L, "a b c", "en", "s1"), (2L, "a b", "fr", "s1"),
      (3L, "x y", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.Corpus.sourceCard(d, "source", "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows("s1") === ((2L, 5L, 3L, 2.5, 1.0)))  // 1 doc en + 1 fr → H = 1 bit
    assert(rows("s2") === ((1L, 2L, 2L, 2.0, 0.0)))  // monolingual → H = 0
    graft.core.Pin.clear()
  }

  test("degree assortativity: star graph is maximally disassortative") {
    val fwd = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"))
      .toDF("src", "dst")
    val star = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val r = graft.olap.Algorithms.degreeAssortativity(star).collect()(0)
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) === -1.0)
  }

  test("token budget select: bucketed cut equals the naive global running sum") {
    // scores chosen to land in distinct AND shared buckets; total = 60
    // tokens, budget = 0.5·60 = 30. Global order by (score desc, id asc):
    // d4(20 toks, before 0) kept, d2(15, before 20) kept — straddles the
    // budget, still in — d1(15, before 35) out, d3(10, before 50) out.
    val docs = Seq(
      (1L, "aa bb cc " * 5),                    // 15 toks, score 2.0
      (2L, "aaa bbb ccc " * 5),                 // 15 toks, score 3.0
      (3L, "aa bb " * 5),                       // 10 toks, score 2.0
      (4L, "aaaa bbbb cccc dddd " * 5))         // 20 toks, score 4.0
      .toDF("doc_id", "text")
    val out = graft.ops.Packing.tokenBudgetSelect(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(4L -> 0L, 2L -> 20L))
    // equal scores share a bucket: budget 0.9 reaches d1/d3 and the id
    // tiebreak must order d1 (15 toks, before 35) ahead of d3 (before 50)
    val out2 = graft.ops.Packing.tokenBudgetSelect(docs, "doc_id", "text", 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out2 === Map(4L -> 0L, 2L -> 20L, 1L -> 35L, 3L -> 50L))
  }

  test("intra-doc dedup: repeated chunks collapse to first occurrence, order kept") {
    val docs = Seq(
      (1L, "aa bb cc aa bb cc aa bb cc dd"),  // chunks: [aa bb cc]×3, [dd]
      (2L, "xx yy zz"))                       // no repetition
      .toDF("doc_id", "text")
    val out = graft.ops.Corpus.intraDocDedup(docs, "doc_id", "text", chunk = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("aa bb cc dd", 4L, 2L)))
    assert(out(2L) === (("xx yy zz", 1L, 0L)))
  }

  test("winsorize clips into the percentile band; mad flags the masked outlier") {
    val d = (1 to 9).map(i => (i.toLong, "s", i * 10.0)) :+ (10L, "s", 10000.0)
    val df = d.toDF("id", "g", "v")
    val wz = graft.ops.Robust.winsorize(df, "id", "g", col("v"), 0.05, 0.95)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(wz(10L) < 10000.0)              // clipped down to p95
    assert(wz(5L) === 50.0)                // interior values untouched
    val mad = graft.ops.Robust.madOutliers(df, "id", "g", col("v"), 2.0)
      .collect().map(_.getLong(0)).toSet
    assert(mad.contains(10L))
    assert(!mad.contains(5L))              // median row never flags
    // constant bulk → MAD 0 → flag nothing rather than divide by zero
    val const = Seq((1L, "s", 5.0), (2L, "s", 5.0), (3L, "s", 99.0))
      .toDF("id", "g", "v")
    assert(graft.ops.Robust.madOutliers(const, "id", "g", col("v"), 2.0)
      .count() === 0L)
  }

  test("pr curve: hand-computed thresholds, best f1 at the right cut") {
    val scored = Seq((1L, 1L, 0.9), (2L, 0L, 0.8), (3L, 1L, 0.7), (4L, 0L, 0.6))
      .toDF("doc_id", "y", "score")
    val rows = graft.ops.Corpus.prCurve(scored, "score", "y")
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(rows.size === 4)
    assert(rows(0.9) === ((1L, 0L, 1L, 0.666667)))  // tp=1 fp=0 fn=1, rounded-6
    assert(rows(0.7) === ((2L, 1L, 0L, 0.8)))       // best F1: 2·2/(3+2)
    assert(rows(0.6) === ((2L, 2L, 0L, 0.666667)))
  }

  test("auc: hand-computed mann-whitney with ties") {
    val scored = Seq((1L, 1L, 0.9), (2L, 0L, 0.8), (3L, 1L, 0.7), (4L, 0L, 0.6),
      (5L, 1L, 0.6)).toDF("doc_id", "y", "score")
    val r = graft.ops.Corpus.aucFromScores(scored, "score", "y").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    // pairs won: (.9,.8)(.9,.6)(.7,.6); lost: (.7,.8)(.6,.8); tie: (.6,.6)
    assert(r.getDouble(2) === 0.583333)
    // perfectly separated → 1.0
    val sep = Seq((1L, 1L, 0.9), (2L, 1L, 0.8), (3L, 0L, 0.2), (4L, 0L, 0.1))
      .toDF("doc_id", "y", "score")
    assert(graft.ops.Corpus.aucFromScores(sep, "score", "y").head()
      .getDouble(2) === 1.0)
  }

  test("quality classifier: separable classes separate after training") {
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", 1), (2L, "alpha gamma beta beta", 1),
      (3L, "alpha beta alpha gamma", 1), (4L, "zeta eta theta zeta", 0),
      (5L, "eta theta zeta eta", 0), (6L, "theta zeta eta theta eta", 0))
      .toDF("doc_id", "text", "y0")
    val out = graft.ops.Corpus.trainQualityClassifier(
      d, "doc_id", "text", col("y0") === 1, dims = 32, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size === 6)
    val pos = out.filter(_._2._1 == 1L).values.map(_._2)
    val neg = out.filter(_._2._1 == 0L).values.map(_._2)
    // disjoint vocabularies → every positive outscores every negative
    assert(pos.min > neg.max, s"pos=$pos neg=$neg")
    graft.core.Pin.clear()
  }

  test("image dhash: invariant to uniform brightness, sensitive to content") {
    import java.awt.image.BufferedImage
    def png(id: Long, base: Int, f: (Int, Int) => Int): Multimodal.ImageAsset = {
      val img = new BufferedImage(20, 20, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 20; x <- 0 until 20) {
        val v = base + f(x, y) % 150   // stays < 256 after +brightness
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.ImageAsset(id, bos.toByteArray)
    }
    val pat = (x: Int, y: Int) => x * 37 + y * 91
    val ds = spark.createDataset(Seq(
      png(1L, 10, pat), png(2L, 60, pat),           // same gradients, brighter
      png(3L, 10, (x, y) => x * 91 + y * 37)))(
      org.apache.spark.sql.Encoders.product[Multimodal.ImageAsset])
    val h = Multimodal.imageDHash(ds).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h(1L) === h(2L))   // dHash keys on gradients, not absolute level
    assert(h(1L) !== h(3L))
    // undecodable bytes degrade to the (-1, -1, 0) sentinel, not a task kill
    val junk = spark.createDataset(Seq(
      Multimodal.ImageAsset(9L, Array[Byte](1, 2, 3, 4))))(
      org.apache.spark.sql.Encoders.product[Multimodal.ImageAsset])
    val s = Multimodal.imageDHash(junk).collect()(0)
    assert(s.getLong(0) === 9L && s.getInt(1) === -1 && s.getLong(3) === 0L)
  }

  test("zipf fit: 1/rank frequencies recover slope ~ -1") {
    // freq(r) = floor(100/r) for ranks 1..4 — a near-perfect Zipf line
    val text = Seq.fill(100)("t1") ++ Seq.fill(50)("t2") ++
      Seq.fill(33)("t3") ++ Seq.fill(25)("t4")
    val d = Seq((1L, text.mkString(" "), "s1")).toDF("doc_id", "text", "source")
    val r = graft.ops.Corpus.zipfFit(d, "doc_id", "source", "text", topK = 200)
      .collect()(0)
    assert(r.getAs[Long]("n_terms") === 4L)
    val slope = r.getAs[Double]("slope")
    assert(slope > -1.1 && slope < -0.9, s"slope=$slope")
    val icpt = r.getAs[Double]("intercept")
    assert(math.abs(icpt - math.log(100.0)) < 0.1, s"intercept=$icpt")
    graft.core.Pin.clear()
  }

  test("hll: duplicate-insensitive, small-range path, ~accurate at 10k") {
    import graft.ops.Sketch
    val dups = Seq("a", "b", "c", "a", "a", "b").toDF("x")
    Sketch.registerKernels(dups)
    def est(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val r = df.select(Sketch.hllEstimate(Sketch.hash60(col("x"))).as("h"))
        .select(col("h.s_reg"), col("h.n_empty"), col("h.est")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val withDups = est(dups)
    val distinct3 = est(Seq("a", "b", "c").toDF("x"))
    assert(withDups === distinct3)                   // max registers: dups free
    assert(withDups._2 === 61L)                      // 3 items → 3 of 64 buckets
    // small-range correction: 64·ln(64/61) ≈ 3.08
    assert(math.abs(withDups._3 - 64.0 * math.log(64.0 / 61.0)) < 1e-12)
    val big = est(spark.range(0, 10000).select(concat(lit("tok"), col("id")).as("x")))
    assert(big._2 === 0L)                            // all buckets hit
    assert(big._3 > 7000 && big._3 < 13000)          // ~13% rse at m=64
  }

  test("knn outlier: isolated vector scores higher than clustered ones") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.98f, 0.05f, 0.0f)), (4L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.knnOutlierScores(vecs, nClusters = 1, iters = 1, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size === 4)
    assert(out(4L) > out(1L) && out(4L) > out(2L) && out(4L) > out(3L))
    assert(out.values.forall(v => v >= 0.0 && v <= 2.0))
    graft.core.Pin.clear()
  }

  test("rrf fusion: doc on both lists beats single-list docs; ranks from (score desc, id asc)") {
    // list A ranks: 10 (0.9), 11 (0.8), 12 (0.7); list B: 11 (0.99), 13 (0.5)
    val a = Seq((10L, 0.9), (11L, 0.8), (12L, 0.7)).toDF("doc_id", "score")
    val b = Seq((11L, 0.99), (13L, 0.5)).toDF("doc_id", "score")
    val out = graft.ops.Search.rrfFuse(
      Seq("a" -> a, "b" -> b), "doc_id", "score", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def c(r: Int) = BigDecimal(1.0 / (60 + r))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.size === 4)
    assert(out(11L)._2 === 2L)                       // on both lists
    assert(math.abs(out(11L)._1 - (c(2) + c(1))) < 1e-12)  // rank 2 in a, 1 in b
    assert(math.abs(out(10L)._1 - c(1)) < 1e-12)
    assert(out(11L)._1 > out(10L)._1)                // fusion beats any single rank-1
    // k cuts after ordering by fused score
    val top2 = graft.ops.Search.rrfFuse(
      Seq("a" -> a, "b" -> b), "doc_id", "score", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 === Set(11L, 10L))
  }

  test("embedding decontamination: benchmark members and paraphrase-close vectors flag; far ones don't") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),     // IS a benchmark vector → sim 1.0
      (1L, Array(0.99f, 0.14f, 0.0f)),   // near the benchmark → flags
      (2L, Array(0.0f, 0.0f, 1.0f)),     // orthogonal → clean
      (3L, Array(-1.0f, 0.0f, 0.0f)))    // opposite → clean
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.Decontaminate.embeddingOverlap(
      corpus, bench, "vec_id", "embedding", tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 4)                           // every corpus row scored
    assert(out(0L) === ((1.0, 1L, 1L)))
    assert(out(1L)._3 === 1L && out(1L)._1 > 0.9)
    assert(out(2L) === ((0.0, 0L, 0L)))
    assert(out(3L) === ((-1.0, 0L, 0L)))
  }

  test("hard negatives: positives and self are excluded, nearest wrong answers rank first") {
    val cands = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),    // the query itself (positive)
      (2L, Array(0.99f, 0.14f, 0.0f)),  // labeled positive — must not appear
      (3L, Array(0.9f, 0.44f, 0.0f)),   // closest negative
      (4L, Array(0.5f, 0.87f, 0.0f)),   // farther negative
      (5L, Array(0.0f, 0.0f, 1.0f)))    // orthogonal negative
      .toDF("vec_id", "embedding")
    val qs = cands.filter(col("vec_id") === 1L)
    val pos = Seq((1L, 1L), (1L, 2L)).toDF("query_id", "vec_id")
    val out = Ann.hardNegatives(qs, cands, pos, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq === Seq((3L, 1L), (4L, 2L)))   // ranked by sim, positives gone
  }

  test("mmr: redundancy penalty demotes the near-duplicate of the first pick") {
    val qs = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (10L, Array(0.99f, 0.14f, 0.0f)),  // most relevant → picked first
      (11L, Array(0.98f, 0.19f, 0.0f)),  // 2nd by relevance but ~dup of 10
      (12L, Array(0.70f, 0.71f, 0.0f)))  // diverse → promoted by MMR
      .toDF("vec_id", "embedding")
    val byRel = Ann.bruteForceTopK(qs, cands, k = 3).collect()
      .sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
    assert(byRel === Seq(10L, 11L, 12L))             // pure relevance order
    val mmr = Ann.mmrTopK(qs, cands, k = 3, lambda = 0.3, poolSize = 3)
      .collect().sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
    assert(mmr === Seq(10L, 12L, 11L))               // diversity flips 11 and 12
  }

  test("leakage-safe split: cluster members share a split, singletons hash their own id") {
    val out = Dedup.leakageSafeSplit(docs, "doc_id", "text",
      ngram = 2, k = 12, bands = 6, rows = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size === 4)
    assert(out(1L) === out(2L))                      // exact dups: one cluster, one split
    // the leakage property itself: no cluster straddles two splits
    val byCluster = out.values.groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).toSet }
    assert(byCluster.values.forall(_.size === 1))
    assert(out(4L)._1 === 4L)                        // unrelated doc is its own cluster
    graft.core.Pin.clear()
  }
}
