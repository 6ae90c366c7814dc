package graft

import graft.pipeline.{Dedup, Ivf}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("Ivf leaves no cached RDDs behind after fit/topK") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val vecs = (0L until 64L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 7 + d) % 13).toDouble)))
      .toDF("doc_id", "embedding")
    val res = Ivf.topK(vecs, "doc_id", "embedding", Seq(0L, 1L),
      k = 3, numClusters = 4, nProbe = 2)
    assert(res.count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"Ivf leaked cached RDDs: $leaked")
  }

  test("duplicateClusters: driver union-find and distributed loop agree") {
    import spark.implicits._
    // two chains (0-1-2-3, 10-11), one clique (20,21,22), a self-contained pair
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
      .toDF("id_a", "id_b")
    val expect = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    val viaDriver = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == expect)
    // force the distributed min-label path (pair limit 0)
    val viaCluster = Dedup.duplicateClusters(pairs, driverPairLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCluster == expect)
  }

  test("deterministic sampling: stable, disjoint split, rate in range") {
    import spark.implicits._
    val docs = QueryLib.tbl(spark, "/root/testdata/sf0.001", "documents")
    val s1 = graft.pipeline.Sampling.deterministicSample(docs, "text", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = graft.pipeline.Sampling.deterministicSample(docs, "text", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty) // stable across runs
    val n = docs.count().toDouble
    assert(s1.size / n > 0.1 && s1.size / n < 0.4) // ~rate (dup-correlated)
    val (train, holdout) = graft.pipeline.Sampling.split(docs, "text", 0.25)
    val t = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val h = holdout.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((t intersect h).isEmpty && (t union h).size == n.toLong)
    assert(h == s1) // holdout membership == the sample predicate
    // identical texts land on the same side (split survives duplication)
    val dupSides = docs.groupBy("text")
      .agg(countDistinct(graft.pipeline.Sampling.keep(col("text"), 0.25)).as("sides"))
    assert(dupSides.filter(col("sides") > 1).count() == 0)
  }

  test("jaccardPairs equals the direct pair-scoring function") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over a lazy cat"),
      (2L, "completely different text with no overlap at all whatsoever"),
      (3L, "the quick brown fox jumps over the lazy dog")) // exact dup of 0
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact dup pair scores 1.0
    assert(pairs((0L, 3L)) == 1.0)
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0 && pairs((0L, 1L)) < 1)
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L })
    // parity with the direct scoring expression on one pair
    val direct = docs.filter(col("doc_id").isin(0L, 1L))
      .agg(collect_list(col("text"))).collect()(0).getSeq[String](0)
    val scored = Seq((direct(0), direct(1))).toDF("a", "b")
      .select(round(Dedup.ngramJaccard(col("a"), col("b"), 3), 6).as("j"))
      .collect()(0).getDouble(0)
    assert(scored == pairs((0L, 1L)))
  }

  test("decontamination flags eval n-gram overlap, clean() removes it") {
    import spark.implicits._
    import graft.pipeline.Decontaminate
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"), // exact copy of eval doc
      (1L, "zeta eta theta iota kappa"),      // disjoint
      (2L, "alpha beta gamma delta epsilon and more trailing words here"),
      (3L, "completely different text again"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // n=5: the eval doc is one whole-text shingle; doc 0 shares it exactly,
    // doc 2 contains it as its first 5-gram
    val r = Decontaminate.overlap(docs, eval, "doc_id", "text", 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r(0L) == ((1L, true)) && r(2L) == ((1L, true)))
    assert(r(1L) == ((0L, false)) && r(3L) == ((0L, false)))
    val kept = Decontaminate.clean(docs, eval, "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // the eval-gram side broadcasts (no corpus-side shuffle join)
    val plan = Decontaminate.overlap(docs, eval, "doc_id", "text", 5)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("bloom-prefiltered decontamination is exact for any fpp") {
    import spark.implicits._
    import graft.pipeline.Decontaminate
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon and more trailing words here"),
      (3L, "completely different text again"),
      (4L, "")).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon"),
      (101L, "iota kappa lambda mu nu")).toDF("doc_id", "text")
    val want = Decontaminate.overlap(docs, eval, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
      .toMap
    // a sloppy filter (fpp 0.5) admits false positives into the
    // candidate set; the exact verify join must still remove them all
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Decontaminate
        .overlapBloom(docs, eval, "doc_id", "text", 3, fpp)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
        .toMap
      assert(got == want, s"fpp=$fpp")
    }
    // the prefilter sits below the only shuffle: the corpus-gram side
    // reaches the verify join already gated by the UDF
    val plan = Decontaminate.overlapBloom(docs, eval, "doc_id", "text", 3)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("mightContain") || plan.contains("UDF"), plan)
  }

  test("repetition stats flag repetitious text and stay zero on clean text") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"), // one bigram everywhere
      (1L, "every word here is completely different from neighbours"),
      (2L, "a b c d e a b c d e a b c d e"), // repeated 5-gram
      (3L, ""), (4L, "one"))
      .toDF("doc_id", "text")
    val r = docs.withColumn("rep", TextAnalysis.repetitionStats(col("text"), 2, 5))
      .select(col("doc_id"), element_at(col("rep"), 1).as("top2"),
        element_at(col("rep"), 2).as("dup5"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // "spam spam" appears 5x, len 9, total = 6*4+5 = 29
    assert(math.abs(r(0L)._1 - 5.0 * 9 / 29) < 1e-12)
    // all-duplicate 5-grams: "a b c d e ..." every 5-gram occurs >1 times?
    assert(r(2L)._2 > 0.5)
    // clean text: no bigram repeats (top covers just its single occurrence)
    // and no duplicate 5-grams at all
    assert(r(1L)._1 < r(0L)._1 && r(1L)._2 == 0.0)
    assert(r(3L) == ((0.0, 0.0)) && r(4L) == ((0.0, 0.0)))
  }

  test("maxBucket caps degenerate LSH buckets; default output unchanged") {
    import spark.implicits._
    // degenerate corpus: 200 identical docs → every band lands one bucket
    // of 200 members (|bucket|² = 40k pairs on one task without the guard)
    val degenerate = (0L until 200L).map(i => (i, "same boilerplate text in every single document"))
      .toDF("doc_id", "text")
    val capped = Dedup.lshCandidatePairs(degenerate, "doc_id", "text",
      numHashes = 16, bands = 4, maxBucket = Some(10))
    assert(capped.count() == 0) // the hot bucket is dropped, loudly
    // a mixed corpus: near-dup pair survives the cap, hot bucket doesn't
    val mixed = degenerate.unionByName(Seq(
      (500L, "a genuinely unique document about rivers and tides"),
      (501L, "a genuinely unique document about rivers and tides"))
      .toDF("doc_id", "text"))
    val mixedPairs = Dedup.lshCandidatePairs(mixed, "doc_id", "text",
      numHashes = 16, bands = 4, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mixedPairs.contains((500L, 501L)))
    assert(mixedPairs.forall { case (a, b) => a >= 500L && b >= 500L })
    // default (no cap) behavior is unchanged: all C(4,2)=6 pairs on a small clique
    val tiny = (0L until 4L).map(i => (i, "same boilerplate text in every single document"))
      .toDF("doc_id", "text")
    assert(Dedup.lshCandidatePairs(tiny, "doc_id", "text", 16, 4).count() == 6)
    // embedding variant: identical vectors form one hot bucket; cap drops it
    val planes = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = (0L until 50L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("doc_id", "embedding")
    val vecCapped = Dedup.embeddingNearDups(vecs, "doc_id", "embedding",
      0.9, planes, maxBucket = 10)
    assert(vecCapped.count() == 0)
    // explicit opt-out of the (default-on) guard keeps every pair
    val vecOpen = Dedup.embeddingNearDups(vecs, "doc_id", "embedding", 0.9,
      planes, maxBucket = Int.MaxValue)
    assert(vecOpen.count() == 50L * 49L / 2)
    // the DEFAULT path carries the guard (cap >> this clique, so the
    // same pairs survive) — no argument needed to be protected
    assert(Dedup.DefaultMaxBucket < Int.MaxValue)
    assert(Dedup.embeddingNearDups(vecs, "doc_id", "embedding", 0.9, planes)
      .count() == 50L * 49L / 2)
    // zero vectors no longer NaN out the dot product
    val withZero = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("doc_id", "embedding")
    assert(Dedup.embeddingNearDups(withZero, "doc_id", "embedding", -1.0, planes)
      .collect().forall(r => !r.getDouble(2).isNaN))
  }

  test("autoBanding scales rows-per-band with corpus size; auto path matches") {
    import spark.implicits._
    // rows-per-band (numHashes/bands) must GROW with n to keep false
    // candidates linear — the r8 sf10 soak measured x145 candidate output
    // for x10 rows at fixed banding
    def rOf(n: Long) = { val (h, b) = Dedup.autoBanding(n); h / b }
    assert(rOf(1000) <= rOf(1000000))
    assert(rOf(1000000) <= rOf(1000000000L))
    assert(rOf(1000000000L) >= 6)
    // the S-curve midpoint (1/b)^(1/r) stays near the threshold
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val (h, b) = Dedup.autoBanding(100000000L, threshold = t)
      val r = h / b
      val mid = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(mid - t) < 0.25, s"t=$t mid=$mid (b=$b r=$r)")
    }
    // expected false pairs per doc stays within budget at every scale
    Seq(1000L, 1000000L, 1000000000L).foreach { n =>
      val (h, b) = Dedup.autoBanding(n)
      val fp = n.toDouble / 2 * b * math.pow(0.05, h / b)
      assert(fp <= 10.0, s"n=$n fp=$fp")
    }
    // the auto variant is exactly lshCandidatePairs with derived params
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta ${i % 5}"))
      .toDF("doc_id", "text")
    val (h, b) = Dedup.autoBanding(40)
    val auto = Dedup.lshCandidatePairsAuto(docs, "doc_id", "text")
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val manual = Dedup.lshCandidatePairs(docs, "doc_id", "text", h, b)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(auto == manual && auto.nonEmpty)
  }

  test("multi-probe embedding near-dups: radius grows recall " +
      "monotonically, full radius is exactly brute force, never cartesian") {
    val sp = spark
    import sp.implicits._
    // vectors on a circle: neighbours are near-boundary for hyperplanes
    val n = 60
    val vecs = (0L until n.toLong).map { i =>
      val a = i * 2 * math.Pi / n
      (i, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        (0.3 * math.cos(3 * a)).toFloat, (0.3 * math.sin(3 * a)).toFloat))
    }.toDF("vec_id", "embedding")
    val planes = graft.pipeline.Similarity.randomPlanes(6, 4)
    def pairs(radius: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDupsMultiprobe(vecs, "vec_id", "embedding", 0.93,
        planes, radius)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // radius 0 == the plain bucketed search
    val r0 = pairs(0)
    assert(r0 == Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.93,
      planes).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // monotone recall in radius
    val r1 = pairs(1); val r2 = pairs(2)
    assert(r0.subsetOf(r1) && r1.subsetOf(r2))
    // full radius = EXACT: equals the brute-force threshold join
    val brute = vecs.as("l").join(vecs.as("r"),
        $"l.vec_id" < $"r.vec_id")
      .select($"l.vec_id", $"r.vec_id",
        Dedup.cosine($"l.embedding", $"r.embedding").as("cos"))
      .filter($"cos" >= 0.93)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(planes.length) == brute && brute.nonEmpty)
    // near-boundary pairs exist that radius 0 misses (the point of probes)
    assert(r0.size < brute.size,
      s"fixture produced no boundary pairs (r0=${r0.size} brute=${brute.size})")
    // plan shape: equi-join on bucket, never a cartesian product
    val plan = Dedup.embeddingNearDupsMultiprobe(vecs, "vec_id", "embedding",
      0.93, planes, 1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("autoPlanes scales the signature space with the corpus; auto " +
      "path matches the manual planes") {
    import spark.implicits._
    // expected bucket population n/2^p stays near the target at any n
    assert(Dedup.autoPlanes(100) == 1)
    Seq(10000L, 1000000L, 1000000000L).foreach { n =>
      val p = Dedup.autoPlanes(n)
      val perBucket = n.toDouble / (1L << p)
      assert(perBucket <= 2000.0 && (p == 24 || perBucket > 500.0),
        s"n=$n p=$p perBucket=$perBucket")
    }
    assert(Dedup.autoPlanes(Long.MaxValue) == 24) // bounded
    // the auto variant is exactly embeddingNearDups with derived planes
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => ((i % 7) + d).toFloat))
    }.toDF("vec_id", "embedding")
    val p = Dedup.autoPlanes(50)
    val auto = Dedup.embeddingNearDupsAuto(vecs, "vec_id", "embedding",
      0.9, dim = 8).orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val manual = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.9,
      graft.pipeline.Similarity.randomPlanes(p, 8))
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(auto == manual && auto.nonEmpty)
    // THE DEFAULT SURFACE (planes-free overload) routes through
    // autoPlanes — the shape users copy is the scale-safe one; the
    // fixed-planes overload stays the explicitly-pinned expert path
    val default = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      0.9, 8).orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(default == auto)
  }

  test("multi-probe caps the ENUMERATED mask count, not just planes") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    // C(24, <=12) ≈ 2.7M masks: a typedLit that size exploded per row
    // blows up the plan long before the radius=planes exactness lever
    val planes24 = graft.pipeline.Similarity.randomPlanes(24, 2)
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsMultiprobe(vecs, "vec_id", "embedding",
        0.5, planes24, probeRadius = 12)
    }
    assert(e.getMessage.contains("probe masks"))
    // saturating binomial-sum arithmetic
    assert(Dedup.maskCount(6, 2) == 1 + 6 + 15)
    assert(Dedup.maskCount(6, 6) == 64)
    assert(Dedup.maskCount(6, 99) == 64) // radius past planes saturates
    assert(Dedup.maskCount(24, 12) > Dedup.MaxProbeMasks)
    // a sane radius on many planes still passes the cap
    assert(Dedup.maskCount(24, 2) == 1 + 24 + 276)
  }

  test("chunkDedup keeps the global first occurrence of each chunk") {
    val sp = spark
    import sp.implicits._
    // doc 1: chunks "a b", "c d"; doc 2 repeats "a b" then adds "e f";
    // doc 3 repeats its own first chunk within itself
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "g h g h")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      (1L, 2L, 2L),  // both chunks first
      (2L, 2L, 1L),  // "a b" already seen in doc 1
      (3L, 2L, 1L))) // repeats itself: second copy dropped
    // a short tail chunk is its own unit, not merged or padded
    val tail = Dedup.chunkDedup(Seq((1L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", 2).head()
    assert(tail.getLong(1) == 2L && tail.getLong(2) == 2L)
  }

  test("chunkDedup emits nothing for null or empty text (oracle parity)") {
    val sp = spark
    import sp.implicits._
    // size(split(null)) is -1: without the guard, sequence(0, nc-1) would
    // fabricate a descending [0, -1] = two bogus null-chunk rows per doc
    val docs = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 2L)
  }

  test("semDeDup keeps the first occurrence of each semantic duplicate") {
    val sp = spark
    import sp.implicits._
    // 0 and 2 are near-identical directions (cos ≈ 1); 1 and 3 are
    // orthogonal to them and to each other → only 2 is dropped
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(vecs, "vec_id", "embedding", 0.9, 1)
      .orderBy("id").collect()
    assert(out.map(r => r.getLong(0) -> r.getBoolean(2)).toSeq ==
      Seq(0L -> true, 1L -> true, 2L -> false, 3L -> true))
    // max_cos of 2 is its cosine to 0; id 0 has no smaller neighbour
    assert(out(2).getDouble(1) > 0.99 && out(0).isNullAt(1))
  }

  test("semDeDup multi-cluster equals brute force on well-separated blobs") {
    val sp = spark
    import sp.implicits._
    // two far-apart blobs: k-means with k = 2 must separate them, and no
    // above-threshold pair crosses blobs → clustered result == k = 1 result
    val vecs = (0L until 20L).map { i =>
      val blob = if (i % 2 == 0) Array(10.0f, 0.0f) else Array(0.0f, 10.0f)
      (i, Array(blob(0) + (i % 5) * 0.01f, blob(1) + (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val brute = Dedup.semDeDup(vecs, "vec_id", "embedding", 0.999, 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val clustered = Dedup.semDeDup(vecs, "vec_id", "embedding", 0.999, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(brute.toSeq == clustered.toSeq)
    assert(brute.count(!_._2) > 0 && brute.count(_._2) > 0)
  }
}
