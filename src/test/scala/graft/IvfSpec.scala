package graft

import graft.pipeline.Ivf

class IvfSpec extends SparkSpec {

  test("fit equals a driver-side reference Lloyd (integer-exact sums)") {
    val sp = spark
    import sp.implicits._
    // integer-valued coordinates: every partial sum is exact in fp
    // regardless of addition order, so the distributed treeAggregate
    // must match a sequential reference bit-for-bit
    val vecs = (0L until 40L).map { i =>
      (i, Seq(((i * 7) % 11).toDouble, ((i * 13) % 17).toDouble,
        ((i * 3) % 5).toDouble))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Ivf.fit(df, "vec_id", "embedding", k = 4, iters = 3)(spark)
    // reference: same init (k lowest ids), nearest with strict < (ties ->
    // lowest cluster), empty cluster keeps its centroid
    var cent = vecs.take(4).map(_._2.toArray).toArray
    for (_ <- 1 to 3) {
      val sums = Array.fill(4, 3)(0.0)
      val n = new Array[Long](4)
      vecs.foreach { case (_, v) =>
        val arr = v.toArray
        var best = 0; var bd = Double.MaxValue
        for (c <- 0 until 4) {
          var s = 0.0
          for (d <- 0 until 3) { val dd = arr(d) - cent(c)(d); s += dd * dd }
          if (s < bd) { bd = s; best = c }
        }
        n(best) += 1
        for (d <- 0 until 3) sums(best)(d) += arr(d)
      }
      cent = Array.tabulate(4)(c =>
        if (n(c) > 0) sums(c).map(_ / n(c)) else cent(c))
    }
    assert(got.map(_.toSeq).toSeq == cent.map(_.toSeq).toSeq)
  }
}
