package graft

import graft.streaming.{EventStream, Sessionize}

class StreamingSpec extends SparkSpec {

  test("streaming sessionization (flatMapGroupsWithState) matches the batch plan") {
    val dir = "/root/testdata/sf0.001"
    val events = QueryLib.tbl(spark, dir, "events")
    // batch truth. The stream emits sessions closed by a gap plus trailing
    // sessions flushed by the event-time timeout once the final watermark
    // passes them — so: streamed ⊆ batch, and every gap-closed batch
    // session (all but each user's trailing one) must be streamed.
    val batch = Sessionize.batch(events, 30)
    val lastSid = batch.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("sid").as("sid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def key(r: org.apache.spark.sql.Row, tsIdx: Int, nIdx: Int, vIdx: Int) =
      (r.getLong(0), r.getTimestamp(tsIdx), r.getLong(nIdx),
        math.rint(r.getDouble(vIdx) * 1e4) / 1e4)
    val batchAll = batch.collect().map(r => key(r, 2, 3, 4)).toSet
    val closedBatch = batch.collect()
      .filter(r => !lastSid.contains((r.getLong(0), r.getLong(1))))
      .map(r => key(r, 2, 3, 4)).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("graft_sess")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val src = EventStream.eventSource(spark, streamDir.toString)
    val q = Sessionize.streaming(src, 30).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sess").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4))
        .toSet
      assert(streamed.subsetOf(batchAll),
        s"stream emitted sessions unknown to batch: ${(streamed -- batchAll).take(3)}")
      assert(closedBatch.subsetOf(streamed),
        s"gap-closed batch sessions missing from stream: ${(closedBatch -- streamed).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup keeps one document per distinct text") {
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val nDistinct = docs.select("text").distinct().count()
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir.toString)
    val q = graft.pipeline.Dedup.exactStreaming(src, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("stream_dedup")
      assert(kept.count() == nDistinct)
      assert(kept.select("text").distinct().count() == nDistinct)
    } finally q.stop()
  }

  test("streaming windowed aggregation matches the batch plan") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStream.batch(spark, dir, "1 hour").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the file stream source needs a directory; stage a link to the table
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = EventStream.streaming(spark, streamDir.toString, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_agg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_agg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("text-analysis kernels run unchanged on a document stream") {
    import graft.pipeline.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    // quality/repetition/simhash are stateless per-row kernels, so the
    // SAME column expressions must work on a readStream frame and agree
    // with the batch result row-for-row
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    def features(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.repetitionStats(col("text"), 2, 5).as("rep"),
      Dedup.simhash(col("text")).as("sig"))
    val batch = features(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2), r.getLong(3))).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft_text_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir.toString)
    val q = features(src).writeStream.outputMode("append")
      .format("memory").queryName("stream_text").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_text").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2), r.getLong(3))).toMap
      assert(streamed == batch && streamed.size == 500)
    } finally q.stop()
  }

  test("trigram familiarity scores a stream against a batch-fit corpus model") {
    import graft.pipeline.TextAnalysis
    import org.apache.spark.sql.functions._
    // the model table (trigram → corpus count) is fit in batch; scoring a
    // live stream is then a stream-static join + per-row arithmetic —
    // results must equal the all-batch operator row-for-row
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val batch = TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val lt = lower(col("text"))
    val tgs = when(length(lt) >= 3,
      transform(sequence(lit(1), length(lt) - 2), i => lt.substr(i, lit(3))))
      .otherwise(array())
    val model = docs.select(explode(tgs).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("c"))
    val streamDir = java.nio.file.Files.createTempDirectory("graft_tg_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir.toString)
    val scored = src.select(col("doc_id"), explode(tgs).as("tg"))
      .join(model, "tg") // stream-static equi-join
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c") >= 5, 1L).otherwise(0L)).as("n_common"))
      .withColumn("familiarity",
        round(col("n_common").cast("double") / col("n_trigrams"), 6))
    val q = scored.writeStream.outputMode("complete")
      .format("memory").queryName("stream_tg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_tg").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3))).toMap
      assert(streamed == batch && streamed.size == batch.size)
    } finally q.stop()
  }

  test("DSIR scores a stream against a batch-fit bucket model") {
    import org.apache.spark.sql.functions._
    // fit on the batch corpus, score the SAME corpus arriving as a
    // stream: stream-static broadcast join + update aggregation must
    // equal the all-batch operator row-for-row
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val batch = graft.pipeline.Sampling
      .dsirWeights(docs, "doc_id", "text", col("lang") === "en", 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val model = graft.pipeline.Sampling
      .dsirModel(docs, "doc_id", "text", col("lang") === "en", 4096)
      .localCheckpoint() // freeze the static side for the streaming join
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dsir_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir.toString)
    val scored = graft.pipeline.Sampling
      .dsirScore(src, "doc_id", "text", model, 4096)
    val q = scored.writeStream.outputMode("complete")
      .format("memory").queryName("stream_dsir").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_dsir").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch && streamed.size == batch.size)
    } finally q.stop()
  }

  test("streaming per-source cap admits exactly min(cap, n) per source") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val wantCounts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> math.min(20L, r.getLong(1))).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft_cap_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir.toString)
    val admitted = graft.streaming.StreamCap(src, 20)
    val q = admitted.writeStream.outputMode("append")
      .format("memory").queryName("stream_cap").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stream_cap").collect()
      val got = rows.groupBy(_.getString(1)).map { case (s, rs) =>
        s -> rs.length.toLong
      }
      assert(got == wantCounts, s"admitted per source: $got")
      // the admission sequence per source is a permutation of 1..count
      rows.groupBy(_.getString(1)).foreach { case (s, rs) =>
        assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length),
          s"source $s sequence")
      }
      // no document admitted twice
      assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    } finally q.stop()
    // and the SAME state function runs on a static frame
    val staticOut = graft.streaming.StreamCap(docs, 20)
    assert(staticOut.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == wantCounts)
  }

  test("streaming near-dup admission: state spans micro-batches") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamNearDedup
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the band plays a very long tune about nothing at all"
    val other = "completely different subject matter entirely disjoint " +
      "vocabulary speaking of ships and sealing wax and cabbages and kings"
    val batches = Seq(
      Seq((1L, base), (2L, other), (3L, "short odd one out entirely")),
      Seq((4L, base),                 // exact dup of batch-1 doc 1
        (5L, other + " extra"),       // near-dup of batch-1 doc 2
        (6L, "fresh unrelated text about mountains rivers and glaciers"),
        (7L, "fresh unrelated text about mountains rivers and glaciers")))
    // reference: sequential claim-always simulation over the SAME probes
    val probesByDoc = StreamNearDedup.probes(
        batches.flatten.toDF("doc_id", "text"), 32, 8, 3)(sp)
      .collect().groupBy(_._1)
      .map { case (d, ps) => d -> ps.map(p => (p._2, p._3)).toSet }
    val claimed = scala.collection.mutable.Set.empty[(Int, Long)]
    val want = scala.collection.mutable.Map.empty[Long, Boolean]
    for (batch <- batches) {
      val perBucket = batch.map(_._1).sorted
        .flatMap(d => probesByDoc(d).toSeq.map(b => (b, d)))
        .groupBy(_._1)
      val verdicts = perBucket.toSeq.flatMap { case (b, probes) =>
        val ds = probes.map(_._2).distinct.sorted
        val pre = claimed.contains(b)
        claimed += b
        ds.zipWithIndex.map { case (d, i) => d -> (pre || i > 0) }
      }
      batch.foreach { case (d, _) =>
        want(d) = !verdicts.exists(v => v._1 == d && v._2)
      }
    }
    // sanity on the fixture: dups rejected, originals + fresh admitted
    assert(want(1L) && want(2L) && want(3L) && want(6L))
    assert(!want(4L) && !want(5L) && !want(7L))

    val stream = MemoryStream[(Long, String)](sp)
    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    val q = StreamNearDedup.verdicts(
        stream.toDF().toDF("doc_id", "text"),
        ttlMs = StreamNearDedup.HistoryExact)(sp)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamNearDedup.Verdict],
          _: Long) =>
        StreamNearDedup.decide(b).collect().foreach(r =>
          got(r.getLong(0)) = r.getBoolean(1))
        ()
      }.start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toMap == want.toMap, s"got $got want $want")

    // the static (one-batch) path agrees with the one-batch simulation
    val allAtOnce = StreamNearDedup(batches.flatten.toDF("doc_id", "text"))(sp)
      .collect().map(d => d.doc_id -> d.admitted).toMap
    // doc 4 duplicates doc 1 exactly -> only the lower id survives;
    // docs 6/7 are identical -> 6 survives
    assert(allAtOnce(1L) && !allAtOnce(4L) && allAtOnce(6L) && !allAtOnce(7L))
  }

  test("near-dup admission TTL: claims expire, in-window dups still rejected") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamNearDedup
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the band plays a very long tune about nothing at all"
    val stream = MemoryStream[(Long, String)](sp)
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
    // the in-window docs (1→2, 3→4) must be PROCESSED within one TTL of
    // each other; under a loaded test host micro-batch latency alone
    // has exceeded 1s, so the window carries real scheduling headroom
    val ttlMs = 8000L
    // NOTE: with ProcessingTimeTimeout armed every batch "requires
    // another batch" to fire future timers, so the engine never signals
    // noNewData and processAllAvailable would HANG — poll the sink map
    // with a deadline instead (the documented caveat for timed state)
    val q = StreamNearDedup.verdicts(
        stream.toDF().toDF("doc_id", "text"), ttlMs = ttlMs)(sp)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamNearDedup.Verdict],
          _: Long) =>
        StreamNearDedup.decide(b).collect().foreach(r =>
          got.put(r.getLong(0), r.getBoolean(1)))
        ()
      }.start()
    def awaitDoc(id: Long): Unit = {
      val t0 = System.nanoTime
      while (!got.containsKey(id) && System.nanoTime - t0 < 60e9.toLong)
        Thread.sleep(50)
      assert(got.containsKey(id), s"doc $id not decided within 60s")
    }
    try {
      // doc 1 claims; doc 2 probes the same buckets inside the window
      stream.addData(Seq((1L, base))); awaitDoc(1L)
      stream.addData(Seq((2L, base))); awaitDoc(2L)
      // past the TTL the claim is stale even though the bucket groups
      // RECEIVE data this batch (the timestamp check, not the timer,
      // carries the semantics here)
      Thread.sleep(ttlMs + 700)
      stream.addData(Seq((3L, base))); awaitDoc(3L)
      // and doc 3's fresh claim rejects an immediate follower again
      stream.addData(Seq((4L, base))); awaitDoc(4L)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toMap == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false), got)
  }

  test("near-dup admission state contract: ttlMs is explicit, " +
      "HistoryExact opts into unbounded retention, negatives rejected") {
    val sp = spark
    import sp.implicits._
    import graft.streaming.StreamNearDedup
    // HistoryExact is the only sanctioned spelling of "keep all
    // history" — it must stay 0 so checkpointed streams written before
    // the contract change resume with identical state semantics.
    assert(StreamNearDedup.HistoryExact == 0L)
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      StreamNearDedup.verdicts(docs, ttlMs = -1L)(sp)
    }
    assert(ex.getMessage.contains("ttlMs"))
    // the explicit opt-in builds a NoTimeout plan and still resolves
    val v = StreamNearDedup.verdicts(docs,
      ttlMs = StreamNearDedup.HistoryExact)(sp)
    assert(v.collect().forall(!_.collided))
  }

  test("streaming decontamination: real stream equals batch overlap") {
    import graft.streaming.StreamDecontaminate
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val evalDocs = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 89 === 0)
    val batch = graft.pipeline.Decontaminate
      .overlap(docs, evalDocs, "doc_id", "text", 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val streamed = StreamDecontaminate.runAvailableNow(spark,
        s"$dir/documents.parquet", docs.schema, "doc_id", "text", 13, evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed == batch)
    // the fixture must actually exercise both branches
    assert(streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming decontamination: static flag is bit-identical to overlap," +
      " oversized eval sets refuse loudly") {
    import graft.streaming.StreamDecontaminate
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val evalDocs = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 89 === 0)
    val bc = StreamDecontaminate.evalGrams(evalDocs, "text", 13)
    val viaFlag = StreamDecontaminate.flag(docs, "doc_id", "text", 13, bc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaOverlap = graft.pipeline.Decontaminate
      .overlap(docs, evalDocs, "doc_id", "text", 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaFlag == viaOverlap)
    val ex = intercept[IllegalArgumentException] {
      StreamDecontaminate.evalGrams(evalDocs, "text", 13, maxGrams = 1)
    }
    assert(ex.getMessage.contains("overlapBloom"))
  }

  test("evalGrams kernel equals the Catalyst shingle set") {
    import graft.streaming.StreamDecontaminate
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents")
    val evalDocs = docs.filter(col("doc_id") % 89 === 0)
    val bc = StreamDecontaminate.evalGrams(evalDocs, "text", 13)
    val viaCatalyst = evalDocs
      .select(explode(graft.pipeline.Dedup.shingles(col("text"), 13)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(bc.value == viaCatalyst)
  }
}
