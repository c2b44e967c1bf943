package graft

import graft.ops.{Ann, Skew}
import org.apache.spark.sql.functions._

class SkewAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("key", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", salts = 8)
      .select("key", "v", "tag").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.count(_.head == "hot") === 100)
  }

  test("skew-safe two-phase aggregation equals direct aggregation") {
    val df = (1 to 500).map(i => (if (i % 2 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val safe = Skew.skewSafeCountSum(df, "key", "v", salts = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(safe === direct)
  }

  test("IVF top-k: self-cell hit ranks first; probes restrict the search") {
    val vecs = (0L until 40L).map { i =>
      // 4 well-separated directions
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      base((i % 4).toInt * 2 + 1) = 0.1f * (i % 3)
      (i, base)
    }.toDF("vec_id", "embedding")
    val res = Ann.ivfTopK(vecs.filter(col("vec_id") < 2), vecs.filter(col("vec_id") >= 5),
      k = 3, nCentroids = 4, nProbe = 1)
    val byQuery = res.collect().groupBy(_.getLong(0))
    // query 0 points in direction 0: its top hits must share direction 0
    assert(byQuery(0L).forall(r => r.getLong(1) % 4 === 0L))
    assert(byQuery(0L).head.getDouble(2) > 0.99)
  }

  private def clusteredVecs = (0L until 60L).map { i =>
    // 4 well-separated directions with per-vector jitter — the k-means
    // fixture: lowest-id seeds all land in direction 0/1, so the trained
    // quantizer must MOVE to recover the other clusters
    val base = Array.fill(8)(0.01f * ((i % 5) + 1))
    base((i % 4).toInt * 2) = 1.0f
    (i, base)
  }.toDF("vec_id", "embedding")

  test("k-means centroids: assignment objective is non-decreasing and cells separate the clusters") {
    val cands = clusteredVecs.filter(col("vec_id") >= 4)
    def objective(cents: org.apache.spark.sql.DataFrame): Double = {
      val scored = cands.crossJoin(broadcast(cents))
        .withColumn("csim", graft.functions.VectorFunctions.cosineSim(col("embedding"), col("ce")))
      scored.groupBy(col("vec_id")).agg(max(col("csim")).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    }
    val obj = (0 to 2).map(t => objective(Ann.kmeansCentroids(cands, nCentroids = 4, iters = t)))
    assert(obj(1) >= obj(0) - 1e-9); assert(obj(2) >= obj(1) - 1e-9)
    // after training, the 4 cells must partition the 4 directions exactly:
    // every member of a cell shares its direction
    val cents = Ann.kmeansCentroids(cands, nCentroids = 4, iters = 3)
    val assigned = cands.crossJoin(broadcast(cents))
      .withColumn("csim", graft.functions.VectorFunctions.cosineSim(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid")).collect()
    val dirsPerCell = assigned.groupBy(_.getLong(1)).values.map(_.map(_.getLong(0) % 4).toSet)
    assert(dirsPerCell.forall(_.size == 1), s"mixed cells: $dirsPerCell")
  }

  test("int8 quantization: high cosine fidelity, exact zero-vector handling") {
    val vf = graft.functions.VectorFunctions
    val df = Seq(
      (1L, Array(0.3f, -1.2f, 0.0f, 0.75f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("z", vf.quantizeInt8(col("embedding")))
      .select(col("vec_id"), col("z.q"), col("z.scale"),
        vf.cosineSim(col("embedding"), vf.dequantizeInt8(col("z.q"), col("z.scale"))).as("fid"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = df(1L)
    assert(r1.getSeq[Int](1).max <= 127 && r1.getSeq[Int](1).min >= -127)
    assert(math.abs(r1.getDouble(2) - 1.2) < 1e-7) // scale = max |x|
    assert(r1.getDouble(3) > 0.999)                // fidelity after dequant
    val r2 = df(2L)
    assert(r2.getSeq[Int](1).forall(_ == 0) && r2.getDouble(2) === 0.0)
  }

  test("mixed-type cosine kernels match the builtin composition") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)))
      .toDF("f", "d")
      .withColumn("d2", transform(col("f"), _.cast("double") * 2.0))
    graft.functions.VectorFunctions.register(spark)
    val r = df.select(
      graft.functions.VectorFunctions.cosineSim(col("f"), col("d")).as("fd"),
      graft.functions.VectorFunctions.cosineSim(col("d"), col("f")).as("df"),
      graft.functions.VectorFunctions.cosineSim(col("d"), col("d2")).as("dd"),
      graft.functions.VectorFunctions.cosineSimBuiltin(col("f"), col("d")).as("ref"))
      .head()
    assert(math.abs(r.getDouble(0) - r.getDouble(3)) < 1e-12)
    assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12)
    // d2 = 2·f is parallel to f: cosine(d, d2) == cosine(d, f) == cosine(f, d)
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
  }

  test("matryoshka two-stage: full-width rerank equals brute force; coarse stage bounds the rerank set") {
    val q = clusteredVecs.filter(col("vec_id") < 4)
    val c = clusteredVecs.filter(col("vec_id") >= 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // rerankFrom >= |C| makes stage 1 a no-op: result must equal brute force
    val exact = rows(Ann.bruteForceTopK(q, c, k = 3))
    val mat = rows(Ann.matryoshkaTopK(q, c, k = 3, coarseDims = 8, rerankFrom = 1000))
    assert(mat === exact)
    // a tight coarse stage returns at most k rows per query, ranked 1..k
    val tight = Ann.matryoshkaTopK(q, c, k = 3, coarseDims = 2, rerankFrom = 4)
    val perQ = tight.groupBy(col("query_id")).count().collect()
    perQ.foreach(r => assert(r.getLong(1) <= 3))
  }

  test("multi-probe SRP recovers neighbors one hyperplane-flip away") {
    val q = clusteredVecs.filter(col("vec_id") < 4)
    val c = clusteredVecs.filter(col("vec_id") >= 4)
    def hits(res: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits(Ann.srpBucketTopK(q, c, k = 5, bits = 6, dims = 8).collect())
    val multi = hits(Ann.srpMultiProbeTopK(q, c, k = 5, bits = 6, dims = 8).collect())
    // multi-probe may only widen the candidate set: strictly more (or equal)
    // results, and every single-probe hit whose rank survives is retained
    assert(single.subsetOf(multi) || multi.size > single.size)
    assert(multi.size >= single.size)
    // a query probes bits+1 buckets: itself plus each one-bit flip
    val probed = Ann.srpMultiProbeTopK(q.limit(1), c, k = 1000, bits = 6, dims = 8)
    assert(probed.select(countDistinct(col("vec_id"))).head().getLong(0) >=
      Ann.srpBucketTopK(q.limit(1), c, k = 1000, bits = 6, dims = 8)
        .select(countDistinct(col("vec_id"))).head().getLong(0))
  }

  test("PQ top-k: reconstruction recovers clustered neighbors; codes compress to m per vector") {
    val q = clusteredVecs.filter(col("vec_id") < 4)
    val c = clusteredVecs.filter(col("vec_id") >= 4)
    val pq = Ann.pqTopK(q, c, k = 5, m = 2, ks = 4, dims = 8, iters = 3).collect()
    // shape: k rows per query, ranks 1..k, sims in [-1, 1] and non-increasing
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.size === 4 && byQuery.values.forall(_.length === 5))
    byQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
    // quantization collapses WITHIN-cell ranking (same codes → same x̂ →
    // id tiebreak), so the correct recall notion for coarse codes is
    // cluster membership: every returned neighbor shares the query's
    // cluster direction (vec_id % 4)
    assert(pq.forall(r => r.getLong(1) % 4 === r.getLong(0) % 4))
    // deterministic: a second run returns the identical result
    val again = Ann.pqTopK(q, c, k = 5, m = 2, ks = 4, dims = 8, iters = 3).collect()
    assert(pq.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("k-means IVF recall: trained quantizer beats lowest-id seeds on clustered data") {
    val q = clusteredVecs.filter(col("vec_id") < 4)
    val c = clusteredVecs.filter(col("vec_id") >= 4)
    val exact = Ann.bruteForceTopK(q, c, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(res: Array[org.apache.spark.sql.Row]): Double =
      res.map(r => (r.getLong(0), r.getLong(1))).count(exact) / exact.size.toDouble
    val seeded = recall(Ann.ivfTopK(q, c, k = 5, nCentroids = 4, nProbe = 1).collect())
    val trained = recall(Ann.ivfKmeansTopK(q, c, k = 5, nCentroids = 4, nProbe = 1, iters = 3).collect())
    assert(trained >= seeded)
    assert(trained === 1.0) // separated clusters: trained cells recover everything
  }
}
