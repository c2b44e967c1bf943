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
}
