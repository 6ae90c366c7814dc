package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 probes.
  *
  * `neardedup`: the StreamNearDedup long-run state measurement the r10
  * verdict asked for — ≥50 micro-batches through `verdicts`, recording
  * the state store's row count against the admitted-chain count per
  * batch. The claim under test: state grows O(bands × chain heads)
  * (each admitted head claims ≤ `bands` buckets; rejected near-dups
  * mostly re-touch their head's buckets), NOT with total probes — the
  * property that lets the admission stage run indefinitely on an
  * ingest stream. One JSON line per batch; fix only if superlinear.
  */
object SoakR12 {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val which = if (args.nonEmpty) args(0) else "neardedup"

    if (which == "aoi") {
      // spatial-pushdown probe: a 4096x4096 x 4-frame Zarr store
      // (16x16 chunk grid per frame, 1024 chunk objects) read through
      // the connector — full scan vs a one-tile AOI. The AOI read
      // should open ~4 chunk objects instead of 1024.
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("soak_aoi").toString
      val w = 4096; val h = 4096; val nf = 4
      val frames = Seq.tabulate(nf)(t =>
        Array.tabulate(w * h)(i => ((i + t) % 1000).toDouble))
      graft.raster.Zarr.write(s"$dir/s.zarr", frames, w, h,
        graft.raster.Bbox(0, 0, 409.6, 409.6), Double.MaxValue,
        "EPSG:28992", Seq.tabulate(nf)(_ * 3600000L))
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val df = spark.read.format("graft-raster").load(s"$dir/s.zarr")
      for (round <- 1 to 2) {
        val (sumFull, secFull) = time {
          df.agg(sum(expr("aggregate(values, 0D, (a, x) -> a + x)")))
            .collect()(0).getDouble(0)
        }
        val (sumAoi, secAoi) = time {
          df.filter(col("ty") === 7 && col("tx") === 9)
            .agg(sum(expr("aggregate(values, 0D, (a, x) -> a + x)")))
            .collect()(0).getDouble(0)
        }
        println(f"""{"soak":"aoi_zarr","round":$round,"chunks":${16 * 16 * nf},"sec_full":$secFull%.3f,"sum_full":$sumFull%.1f,"sec_aoi":$secAoi%.3f,"sum_aoi":$sumAoi%.1f}""")
      }
    }

    if (which == "neardedup" || which == "neardedupttl") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamNearDedup
      val nBatches = if (args.length > 1) args(1).toInt else 60
      val docsPerBatch = if (args.length > 2) args(2).toInt else 300
      val dupFrac = 0.4 // 40% of each batch near-duplicates an earlier doc
      val vocab = Array.tabulate(4096)(i => f"tok$i%04x")
      var s = 0x9E3779B97F4A7C15L
      def next(): Long = {
        s = s * 6364136223846793005L + 1442695040888963407L; s
      }
      def freshDoc(): String =
        Seq.fill(40)(vocab(math.floorMod(next(), vocab.length).toInt))
          .mkString(" ")
      val originals = scala.collection.mutable.ArrayBuffer[String]()
      var nextId = 0L
      def batch(): Seq[(Long, String)] = Seq.fill(docsPerBatch) {
        val id = nextId; nextId += 1
        val isDup = originals.nonEmpty &&
          math.floorMod(next(), 1000) < (dupFrac * 1000).toInt
        val text =
          if (isDup) {
            // near-dup: one token swapped in a random earlier original
            val base = originals(math.floorMod(next(), originals.length).toInt)
            val toks = base.split(" ")
            toks(math.floorMod(next(), toks.length).toInt) =
              vocab(math.floorMod(next(), vocab.length).toInt)
            toks.mkString(" ")
          } else { val d = freshDoc(); originals += d; d }
        (id, text)
      }
      // ttl lane: buckets idle >2s expire; batches are paced so ~every
      // 3rd batch's claims lapse — state should PLATEAU instead of
      // growing with stream length
      val ttlMs = if (which == "neardedupttl") 2000L else 0L
      val stream = MemoryStream[(Long, String)](spark)
      var admittedTotal = 0L
      @volatile var batchesDone = 0L
      @volatile var lastRows = -1L
      @volatile var lastMb = -1L
      val q = StreamNearDedup.verdicts(
          stream.toDF().toDF("doc_id", "text"), ttlMs = ttlMs)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamNearDedup.Verdict],
            _: Long) =>
          val admitted = StreamNearDedup.decide(b)
            .filter("admitted").count()
          admittedTotal += admitted
          if (admitted > 0) batchesDone += 1
          ()
        }.start()
      // with ProcessingTimeTimeout armed the engine never signals
      // noNewData (every batch re-arms timers), so processAllAvailable
      // would hang — wait for the foreachBatch counter instead
      def awaitBatch(n: Long): Unit = {
        val t0 = System.nanoTime
        while (batchesDone < n && System.nanoTime - t0 < 120e9.toLong)
          Thread.sleep(20)
        require(batchesDone >= n, s"batch $n not processed within 120s")
      }
      try {
        for (i <- 1 to nBatches) {
          stream.addData(batch())
          if (ttlMs > 0) awaitBatch(i) else q.processAllAvailable()
          val st = Option(q.lastProgress)
            .flatMap(p => p.stateOperators.headOption)
          val rows = st.map(_.numRowsTotal).getOrElse(lastRows)
          val mb = st.map(_.memoryUsedBytes).getOrElse(lastMb)
          lastRows = rows; lastMb = mb
          if (i <= 5 || i % 10 == 0 || i == nBatches) {
            val perHead =
              if (admittedTotal > 0) rows.toDouble / admittedTotal else -1.0
            println(f"""{"soak":"neardedup_state","ttl_ms":$ttlMs,"batch":$i,"docs":${i.toLong * docsPerBatch},"admitted":$admittedTotal,"state_rows":$rows,"rows_per_admitted":$perHead%.2f,"state_mb":${mb / 1048576.0}%.1f}""")
          }
        }
      } finally q.stop()
    }
  }
}
