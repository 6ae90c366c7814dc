package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Pq, Similarity}

class PqSpec extends SparkSpec {

  /** 60 vectors in 3 well-separated clusters of dim 8 (+ tiny per-id
    * deterministic jitter), so quantization has real structure to find. */
  private def clustered = {
    import spark.implicits._
    (0L until 60L).map { i =>
      val c = (i % 3).toInt
      val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0 else 0.0)
      val jit = Array.tabulate(8)(d => ((i * 7 + d * 3) % 10) * 0.05)
      (i, base.zip(jit).map { case (a, b) => (a + b).toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("fit is deterministic; encode emits m bytes with codes < k") {
    val df = clustered
    val m1 = Pq.fit(df, "vec_id", "embedding", m = 4, k = 8)
    val m2 = Pq.fit(df, "vec_id", "embedding", m = 4, k = 8)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    assert(m1.dim == 8 && m1.subDim == 2)
    val codes = Pq.encode(df, "vec_id", "embedding", m1)
      .select("codes").collect().map(_.getAs[Array[Byte]](0))
    assert(codes.forall(_.length == 4)) // m bytes per vector: 8 floats -> 4B
    assert(codes.forall(_.forall(b => (b & 0xFF) < 8)))
  }

  test("exhaustive candidates == brute force; shortlist keeps high recall") {
    val df = clustered
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      Seq(0L, 1L, 2L), 5).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    // candidates >= corpus: ADC shortlist passes everything to the exact
    // re-rank -> identical to brute force, row for row
    val exact = Pq.adcTopK(df, "vec_id", "embedding", Seq(0L, 1L, 2L), 5,
      m = 4, k = 8, candidates = 100).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    assert(exact == brute)
    // a 10-deep shortlist out of 59 candidates still recalls most true
    // neighbours on clustered data (ADC distances are cluster-faithful)
    val approx = Pq.adcTopK(df, "vec_id", "embedding", Seq(0L, 1L, 2L), 5,
      m = 4, k = 8, candidates = 10)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.map(s => (s(0).asInstanceOf[Long],
      s(1).asInstanceOf[Long])).toSet
    val recall = (approx & bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF-PQ: exhaustive probes+shortlist == brute force; probed recall") {
    val df = clustered
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      Seq(0L, 1L, 2L), 5).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    // nProbe = numClusters and candidates >= corpus: identical to brute
    val exact = graft.pipeline.IvfPq.topK(df, "vec_id", "embedding",
      Seq(0L, 1L, 2L), 5, numClusters = 3, nProbe = 3, m = 4, k = 8,
      candidates = 100).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    assert(exact == brute)
    // probing only the single nearest list on 3-blob data still finds
    // every true neighbour (neighbours share the query's blob)
    val probed = graft.pipeline.IvfPq.topK(df, "vec_id", "embedding",
      Seq(0L, 1L, 2L), 5, numClusters = 3, nProbe = 1, m = 4, k = 8,
      candidates = 10)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.map(s => (s(0).asInstanceOf[Long],
      s(1).asInstanceOf[Long])).toSet
    val recall = (probed & bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
