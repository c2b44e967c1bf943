package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

/** PCA semantics on a small deterministic fixture: the covariance pass, the
  * Jacobi eigensolver, and the projection's variance/orthogonality
  * invariants (q_embed_covariance oracles the distributed pass; the
  * eigensolve half has no SQL twin, so its contract lives here). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  // 12 deterministic vectors with variance concentrated on a known axis:
  // component 0 dominates (spread ±6), then 1 (±2), then tiny noise dims
  lazy val vecs = (0 until 12).map { i =>
    val a = (i % 4) * 4.0 - 6.0          // big spread
    val b = (i % 3) * 2.0 - 2.0          // medium spread
    val c = (i % 2) * 0.2 - 0.1          // small
    val d = math.sin(i.toDouble) * 0.01  // tiny
    (i.toLong, Array(
      (0.9 * a + 0.1 * b).toFloat, (0.1 * a - 0.9 * b).toFloat,
      (0.3 * c + d).toFloat, (0.2 * d - c).toFloat))
  }.toDF("vec_id", "embedding")

  private def covMatrix(): Array[Array[Double]] = {
    val rows = Pca.covariance(vecs, "vec_id", "embedding", dim).collect()
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      m(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    m
  }

  test("covariance matches a direct two-pass computation") {
    val data = vecs.collect().map(_.getSeq[Float](1).map(x =>
      math.round(x.toDouble * 1e6) / 1e6).toArray)
    val n = data.length
    val mean = (0 until dim).map(j => data.map(_(j)).sum / n)
    val got = covMatrix()
    for (i <- 0 until dim; j <- i until dim) {
      val exp = data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
      assert(math.abs(got(i)(j) - exp) < 2e-6, s"cov($i,$j): ${got(i)(j)} vs $exp")
    }
  }

  test("jacobi eigensolver: descending eigenvalues, orthonormal basis, A·v = λ·v") {
    val m = covMatrix()
    val (vals, basis) = Pca.jacobiEigen(m)
    assert(vals.length === dim)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 })
    for (i <- 0 until dim; j <- i until dim) {
      val dot = (0 until dim).map(r => basis(i)(r) * basis(j)(r)).sum
      val exp = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - exp) < 1e-9, s"v${i}.v$j = $dot")
    }
    for (i <- 0 until dim) {
      val av = (0 until dim).map(r => (0 until dim).map(c => m(r)(c) * basis(i)(c)).sum)
      av.zipWithIndex.foreach { case (x, r) =>
        assert(math.abs(x - vals(i) * basis(i)(r)) < 1e-8,
          s"(A·v$i)[$r] = $x vs ${vals(i) * basis(i)(r)}")
      }
    }
    // sign convention: the largest-|component| entry is positive
    basis.foreach(v => assert(v(v.indices.maxBy(j => (math.abs(v(j)), -j))) >= 0))
  }

  test("projection: per-component variance equals the eigenvalue; k=dim preserves total variance") {
    val (vals, _) = Pca.components(vecs, "vec_id", "embedding", dim)
    val proj = Pca.project(vecs, "vec_id", "embedding", dim, dim)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = proj.length
    for (c <- 0 until dim) {
      val xs = proj.map(_(c))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      assert(math.abs(v - vals(c)) < 2e-4, s"component $c variance $v vs λ ${vals(c)}")
    }
    val m = covMatrix()
    val totalVar = m.indices.map(i => m(i)(i)).sum
    assert(math.abs(vals.sum - totalVar) < 1e-6)
    graft.core.Pin.clear()
  }

  test("components are memoized per pinned input plan") {
    val a = Pca.components(vecs, "vec_id", "embedding", dim)
    val b = Pca.components(vecs, "vec_id", "embedding", dim)
    assert(a eq b)
    graft.core.Pin.clear()
  }

  test("upper_tri_products6 kernel ≡ builtin transform composition (bit-exact decimals)") {
    // the covariance cross-moment kernel must reproduce the exact
    // decimal(37,12) per-(i,j) sums the round/cast/multiply expression
    // composition produced — the oracle comparison rides on this
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    def sums(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), java.math.BigDecimal] = {
      val v6 = transform(col("embedding"),
        x => round(x.cast("double"), 6).cast("decimal(18,6)"))
      val tri = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
        transform(sequence(i, lit(dim - 1)), j =>
          struct(i.as("i"), j.as("j"),
            (element_at(col("v"), i + 1) * element_at(col("v"), j + 1)).as("xy")))))
      df.select(v6.as("v")).select(explode(tri).as("t"))
        .groupBy(col("t.i").as("i"), col("t.j").as("j"))
        .agg(sum(col("t.xy")).as("sxy")).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    }
    def kernelSums(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), java.math.BigDecimal] =
      df.select(explode(VectorFunctions.upperTriProducts6(col("embedding"), dim)).as("t"))
        .groupBy(col("t.i").as("i"), col("t.j").as("j"))
        .agg(sum(col("t.xy")).as("sxy")).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val exp = sums(vecs)
    val got = kernelSums(vecs)
    assert(got.keySet === exp.keySet)
    exp.foreach { case (k, v) =>
      assert(got(k).compareTo(v) == 0, s"sxy$k: ${got(k)} vs $v") }
    // the array<double> element path too (negative values, .xx5 shapes)
    val dvecs = Seq(
      (1L, Array(-0.1234565, 2.5, -3.0000005, 0.0)),
      (2L, Array(1.0000015, -2.0, 0.5, 7.25))).toDF("vec_id", "embedding")
    val dexp = sums(dvecs)
    val dgot = kernelSums(dvecs)
    assert(dgot.keySet === dexp.keySet)
    dexp.foreach { case (k, v) =>
      assert(dgot(k).compareTo(v) == 0, s"double sxy$k: ${dgot(k)} vs $v") }
  }
}
