package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pca

class PcaSpec extends SparkSpec {

  test("symEigen solves a known symmetric matrix") {
    // [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.symEigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(vecs(0)) - s) < 1e-12 &&
      math.abs(math.abs(vecs(2)) - s) < 1e-12)
    // columns orthonormal
    val dot = vecs(0) * vecs(1) + vecs(2) * vecs(3)
    assert(math.abs(dot) < 1e-12)
  }

  test("fit finds the dominant direction of correlated data") {
    import spark.implicits._
    // points along (3, 4)/5 with tiny orthogonal noise, plus an offset
    val rows = (0 until 400).map { i =>
      val t = (i % 40 - 20) * 0.5
      val n = ((i * 7919) % 11 - 5) * 0.01
      (i.toLong, Array((10 + 0.6 * t - 0.8 * n).toFloat,
        (-5 + 0.8 * t + 0.6 * n).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", 2)
    // variances sorted descending, dominant ≫ residual
    assert(m.variance(0) > 30 && m.variance(1) < 0.01)
    // first component ≈ ±(0.6, 0.8); sign-normalized → largest comp positive
    assert(math.abs(m.components(0 * 2 + 0) - 0.6) < 1e-3)
    assert(math.abs(m.components(1 * 2 + 0) - 0.8) < 1e-3)
    assert(math.abs(m.mean(0) - 10.0) < 0.2 && math.abs(m.mean(1) + 5.0) < 0.2)
  }

  test("full-rank projection preserves distances; k-truncation reduces dim") {
    import spark.implicits._
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(6)(j => ((i * (j + 3) * 2654435761L) % 997)
        .toFloat / 997f)))
    val df = rows.toDF("vec_id", "embedding")
    val full = Pca.fitProject(df, "embedding", 6, "p")
      .select("vec_id", "embedding", "p").collect()
    val byId = full.map(r => r.getLong(0) ->
      (r.getSeq[Float](1).map(_.toDouble).toArray, r.getSeq[Double](2).toArray)).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // pairwise distances invariant under the orthonormal full-rank map
    for (i <- 0L until 10L; j <- (i + 1) until 10L) {
      val (xi, pi) = byId(i); val (xj, pj) = byId(j)
      assert(math.abs(d2(xi, xj) - d2(pi, pj)) < 1e-9)
    }
    val k2 = Pca.fitProject(df, "embedding", 2, "p").select("p").head
      .getSeq[Double](0)
    assert(k2.length == 2)
  }
}
