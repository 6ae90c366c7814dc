package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index: deterministic
  * k-means coarse quantizer + cluster-assignment join.
  *
  * The scale story: `fit` is a few Lloyd iterations, each one scan +
  * hash aggregation (centroids live on the driver — k·dim doubles);
  * `topK` probes only the `nProbe` nearest clusters per query, turning the
  * search into an equi-join on cluster id — no corpus×queries product.
  * Everything is seeded/deterministic (id-ordered init, fixed iteration
  * count) so results are reproducible across runs and engines.
  */
object Ivf {

  private[pipeline] def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private[pipeline] def nearestArr(centroids: Array[Array[Double]])(arr: Array[Double]): Int = {
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      val d = dist2(arr, centroids(c))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  private[pipeline] def nearest(centroids: Array[Array[Double]])(v: Seq[Double]): Int =
    nearestArr(centroids)(v.toArray)

  /** Two-level pruned assignment (the FAISS coarse-quantizer trick): a
    * driver-side k-means over the CENTROIDS groups them under ~√k
    * super-centroids; a vector then scans the members of its 2 nearest
    * supers instead of all k — O(√k + 2k/√k) distance evaluations per
    * row instead of O(k). The sf10 soak measured the flat scan as the
    * whole cost of clustered SemDeDup (assignment is O(n·k) with
    * k ∝ n). Approximate only near super-cell borders the 2-probe
    * misses; small k (≤ 64) falls back to the exact scan. */
  private[pipeline] def prunedNearestArr(centroids: Array[Array[Double]])
      : Array[Double] => Int = {
    val k = centroids.length
    if (k <= 64) return nearestArr(centroids)
    val b = math.max(2, math.sqrt(k.toDouble).toInt)
    var supers = Array.tabulate(b)(i => centroids(i).clone())
    val assign = new Array[Int](k)
    for (_ <- 1 to 5) {
      var i = 0
      while (i < k) {
        assign(i) = nearestArr(supers)(centroids(i)); i += 1
      }
      val dim = centroids(0).length
      val sums = Array.fill(b, dim)(0.0)
      val counts = new Array[Int](b)
      i = 0
      while (i < k) {
        val s = assign(i); counts(s) += 1
        var d = 0
        while (d < dim) { sums(s)(d) += centroids(i)(d); d += 1 }
        i += 1
      }
      supers = Array.tabulate(b)(s =>
        if (counts(s) > 0) sums(s).map(_ / counts(s)) else supers(s))
    }
    var i = 0
    while (i < k) { assign(i) = nearestArr(supers)(centroids(i)); i += 1 }
    val members: Array[Array[Int]] =
      Array.tabulate(b)(s => (0 until k).filter(assign(_) == s).toArray)
    (arr: Array[Double]) => {
      // two nearest supers
      var s1 = -1; var d1 = Double.MaxValue
      var s2 = -1; var d2 = Double.MaxValue
      var s = 0
      while (s < b) {
        val d = dist2(arr, supers(s))
        if (d < d1) { s2 = s1; d2 = d1; s1 = s; d1 = d }
        else if (d < d2) { s2 = s; d2 = d }
        s += 1
      }
      var best = 0; var bd = Double.MaxValue
      for (sp <- Seq(s1, s2) if sp >= 0; c <- members(sp)) {
        val d = dist2(arr, centroids(c))
        if (d < bd) { bd = d; best = c }
      }
      best
    }
  }

  private[pipeline] def prunedNearest(centroids: Array[Array[Double]])
      : Seq[Double] => Int = {
    val f = prunedNearestArr(centroids)
    (v: Seq[Double]) => f(v.toArray)
  }

  /** Deterministic k-means: init = the k lowest-id vectors, then `iters`
    * Lloyd steps. Each step is ONE scan aggregated in-task into k×dim
    * running sums + per-cluster counts (treeAggregate): no posexplode of
    * every vector into n·dim shuffled rows, no per-step exchange — only
    * k·(dim+1) doubles per partition cross the network (guide §2.3
    * aggregate-before-you-shuffle, §5 bounded driver pulls), and each
    * Lloyd step is exactly one job instead of an AQE shuffle-query wave.
    * (A collect_list-of-vectors per cluster would gather whole clusters
    * into single rows and OOM at corpus scale.) */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 3)
      (implicit spark: SparkSession): Array[Array[Double]] = {
    val vecD = transform(col(vecCol), x => x.cast("double"))
    // Cached for the duration of the Lloyd iterations only — unpersisted
    // before returning so repeated fits don't accumulate session-lifetime
    // cached frames.
    val base = df.select(col(idCol).as("id"), vecD.as("v")).cache()
    try {
      var centroids = base.orderBy(col("id")).limit(k)
        .collect().map(_.getSeq[Double](1).toArray)
      val dim = centroids(0).length
      val vecs = base.select(col("v")).rdd.map(_.getSeq[Double](0).toArray)
      for (_ <- 1 to iters) {
        // pruned for large k (exact fallback below 64): Lloyd with an
        // approximate assigner is the standard large-k practice
        val assign = prunedNearestArr(centroids)
        val (sums, counts) = vecs.treeAggregate(
          (Array.fill(k, dim)(0.0), new Array[Long](k)))(
          seqOp = { case (acc @ (s, n), v) =>
            val c = assign(v)
            n(c) += 1
            val sc = s(c)
            var d = 0
            while (d < dim) { sc(d) += v(d); d += 1 }
            acc
          },
          combOp = { case (a @ (sa, na), (sb, nb)) =>
            var c = 0
            while (c < k) {
              na(c) += nb(c)
              val s1 = sa(c); val s2 = sb(c)
              var d = 0
              while (d < dim) { s1(d) += s2(d); d += 1 }
              c += 1
            }
            a
          })
        val updated = centroids.clone()
        for (c <- 0 until k if counts(c) > 0)
          updated(c) = sums(c).map(_ / counts(c))
        centroids = updated
      }
      centroids
    } finally base.unpersist(false)
  }

  /** Top-k cosine neighbours per query id, probing the `nProbe` nearest
    * clusters of each query vector. */
  def topK(df: DataFrame, idCol: String, vecCol: String, queryIds: Seq[Long],
      k: Int, numClusters: Int = 16, nProbe: Int = 4, iters: Int = 3)
      (implicit spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val centroids = fit(df, idCol, vecCol, numClusters, iters)
    val assignUdf = udf(nearest(centroids) _)
    val probesUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      centroids.zipWithIndex.map { case (c, i) => (dist2(arr, c), i) }
        .sortBy(_._1).take(nProbe).map(_._2)
    }
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val corpus = df.select(col(idCol).as("cand_id"), vecD.as("cv"))
      .withColumn("cluster", assignUdf(col("cv")))
    val queries = df.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), vecD.as("qv"))
      .withColumn("cluster", explode(probesUdf(col("qv"))))
    val scored = corpus.join(broadcast(queries), Seq("cluster"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Dedup.cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }
}

/** A composed corpus-cleaning pipeline — the flagship training-data flow:
  * exact dedup → quality floor → language filter → token accounting.
  * Single scan + one aggregation; every step is a Column expression. */
object CorpusClean {
  def run(docs: DataFrame, minQuality: Double, langs: Seq[String]): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_guess", TextAnalysis.langId(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      // exact dedup: keep the lowest doc_id per distinct text. Partition by
      // (xxhash64, md5) of the text, not the text itself — the window
      // shuffle then moves ~40-byte keys instead of document bodies (the
      // dominant cost at corpus scale); the double hash makes collisions a
      // ~2^-192 event.
      .withColumn("rn", row_number().over(
        Window.partitionBy(xxhash64(col("text")), md5(col("text")))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .filter(col("quality") >= minQuality)
      .filter(col("lang_guess").isInCollection(langs))
      .select(col("doc_id"), col("lang_guess"), col("n_tokens"),
        round(col("quality"), 6).as("quality"))
}
