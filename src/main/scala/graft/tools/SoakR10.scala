package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Lines, Sampling}

/** Round-10 soak: the round-9 newcomers (q17 after the RANGE-window
  * rewrite, g31 kNN join after the salt hardening, p43 source cap, p44
  * duplicate-span removal) at sf0.1 / sf1 / sf10 with shuffle
  * partitions scaled to input, plus two targeted probes:
  *
  *  - q17 hot-user: one user with N events inside a single 12-hour
  *    window. The old bucketed pair-join materializes N² candidate rows
  *    on one (user, bucket) key; the RANGE window is O(N log N). Both
  *    plans run at growing N so the asymptotic gap is MEASURED, not
  *    asserted (the pair join stops at the size where its next step
  *    would be ~10⁹ rows; the window plan continues flat).
  *  - Zipfian line-frequency probe (VERDICT r9 #6): dropBoilerplate's
  *    join keys on the line text — the ultimate hot key is the empty /
  *    boilerplate line. A corpus whose line distribution is Zipfian
  *    (top line ≈ 20% of all lines) runs against a uniform corpus of
  *    identical size; if AQE's skew split is doing its job the two
  *    wall-clocks stay close.
  *
  * One JSON line per measurement. */
object SoakR10 {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val which = args.headOption.getOrElse("all")

    // ------------------------------------------------ sf-scaling soak
    if (which == "all" || which == "sf") {
      val sfs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/sf1",
        "sf10" -> "/tmp/sf10").filter(s => new java.io.File(s._2).exists())
      for ((sfName, dir) <- sfs) {
        val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
        val parts = math.max(32, (nDocs / 1500).toInt)
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        def run(name: String)(f: => Long): Unit = {
          val (rows, sec) = time(f)
          println(f"""{"soak":"$name","partitions":$parts,"sf":"$sfName","sec":$sec%.3f,"agg":$rows}""")
        }
        run("q17_range_window") {
          graft.SparkEntry.queries("q17_range_join")(spark, dir)
            .agg(sum(col("n_near"))).collect()(0).getLong(0)
        }
        run("g31_knn_join") {
          graft.SparkEntry.queries("g31_knn_join")(spark, dir)
            .agg(sum(col("nn_rank")), count(lit(1))).collect()(0).getLong(0)
        }
        run("p43_source_cap") {
          graft.SparkEntry.queries("p43_source_cap")(spark, dir)
            .agg(sum(col("src_rank")), sum(when(col("kept"), 1L)))
            .collect()(0).getLong(0)
        }
        run("p44_remove_dup_spans") {
          graft.SparkEntry.queries("p44_remove_dup_spans")(spark, dir)
            .agg(sum(length(col("clean_text"))), sum(col("removed_chars")))
            .collect()(0).getLong(0)
        }
      }
    }

    // ------------------------------------------------ q17 hot-user probe
    if (which == "all" || which == "hotuser") {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val W = 43200000000L // 12 h in micros
      def hotEvents(n: Int): DataFrame =
        spark.range(n.toLong).select(
          col("id").as("event_id"), lit(1L).as("user_id"),
          // n events spread over ONE 12-hour window -> every pair is
          // in range: the worst case for the pair join
          (col("id") * (W / math.max(n, 1))).as("us"))

      def windowPlan(e: DataFrame): Long = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-W, W)
        e.withColumn("n_near", count(lit(1)).over(w) - 1)
          .agg(sum(col("n_near"))).collect()(0).getLong(0)
      }
      def pairPlan(e: DataFrame): Long = {
        val r = e.select(col("user_id"), col("event_id").as("b_id"),
          col("us").as("b_us"), expr(s"us DIV $W").as("bucket"))
        val l = e.withColumn("bucket",
          explode(array(expr(s"us DIV $W - 1"), expr(s"us DIV $W"),
            expr(s"us DIV $W + 1"))))
        l.join(r, Seq("user_id", "bucket"))
          .filter(col("b_id") =!= col("event_id") &&
            abs(col("b_us") - col("us")) <= W)
          .groupBy("event_id").agg(count(lit(1)).as("n_near"))
          .agg(sum(col("n_near"))).collect()(0).getLong(0)
      }
      for (n <- Seq(1000, 3000, 10000, 30000)) {
        val (agg, sec) = time(pairPlan(hotEvents(n)))
        println(f"""{"soak":"q17_hotuser_pairjoin","n":$n,"sec":$sec%.3f,"agg":$agg}""")
      }
      // the pair join is ~n² candidate rows on ONE key; 10⁵ would be
      // 10¹⁰ rows — not run. The window plan keeps going, flat:
      for (n <- Seq(10000, 100000, 1000000)) {
        val (agg, sec) = time(windowPlan(hotEvents(n)))
        println(f"""{"soak":"q17_hotuser_window","n":$n,"sec":$sec%.3f,"agg":$agg}""")
      }
    }

    // ---------------------------------------- late-round newcomers (q18, p47)
    if (which == "sf2") {
      val sfs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/sf1",
        "sf10" -> "/tmp/sf10").filter(s => new java.io.File(s._2).exists())
      for ((sfName, dir) <- sfs) {
        val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
        val parts = math.max(32, (nDocs / 1500).toInt)
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        def run(name: String)(f: => Long): Unit = {
          val (rows, sec) = time(f)
          println(f"""{"soak":"$name","partitions":$parts,"sf":"$sfName","sec":$sec%.3f,"agg":$rows}""")
        }
        run("q18_interval_join") {
          graft.SparkEntry.queries("q18_interval_join")(spark, dir)
            .agg(sum(col("n_active"))).collect()(0).getLong(0)
        }
        run("p47_stream_neardedup") {
          graft.SparkEntry.queries("p47_stream_neardedup")(spark, dir)
            .agg(sum(when(col("admitted"), 1L).otherwise(0L)), count(lit(1)))
            .collect()(0).getLong(0)
        }
      }
    }

    // ------------------------------------------------ DSv2 archive probe
    if (which == "all" || which == "dsv2") {
      // a directory of many GRIB files: the multi-file archive case the
      // connector exists for. Compare executor-parallel connector read
      // against the driver-side block API loop over the same files.
      val dir = java.nio.file.Files.createTempDirectory("soak_dsv2").toString
      val nFiles = 64; val nf = 4
      val w = if (args.length > 1) args(1).toInt else 200
      val h = if (args.length > 2) args(2).toInt else 150
      for (f <- 0 until nFiles) {
        val frames = Seq.tabulate(nf)(t =>
          Array.tabulate(w * h)(i => ((i + t + f) % 1000).toDouble))
        graft.raster.Grib.write(s"$dir/f$f.grib2", frames, w, h,
          Double.MaxValue, Seq.tabulate(nf)(_ * 3600000L), 0.0, 0.0, 0.0001,
          template = 3)
      }
      // run twice: the first read pays session/codegen fixed costs
      for (round <- 1 to 2) {
        val (sumV2, secV2) = time {
          spark.read.format("graft-raster").load(dir)
            .agg(sum(expr("aggregate(values, 0D, (a, x) -> a + x)")))
            .collect()(0).getDouble(0)
        }
        println(f"""{"soak":"dsv2_archive","round":$round,"files":$nFiles,"sec":$secV2%.3f,"sum":$sumV2%.1f}""")
      }
      val (sumDrv, secDrv) = time {
        var s = 0.0
        for (f <- 0 until nFiles) {
          val p = s"$dir/f$f.grib2"
          val ch = graft.io.PositionedReader.open(p)
          try {
            val m = graft.raster.Grib.readMeta(ch, p)
            m.fields.foreach(fd =>
              s += graft.raster.Grib.decode(ch, fd, Double.MaxValue).sum)
          } finally ch.close()
        }
        s
      }
      println(f"""{"soak":"dsv2_driver_loop","files":$nFiles,"sec":$secDrv%.3f,"sum":$sumDrv%.1f}""")
      // metadata-only query: column pruning must keep this near-free
      val (cnt, secCnt) = time {
        spark.read.format("graft-raster").load(dir).count()
      }
      println(f"""{"soak":"dsv2_count_pruned","files":$nFiles,"sec":$secCnt%.3f,"rows":$cnt}""")
    }

    // --------------------------------------- archive-scale plan probe
    // ≥1000 files × 4 frames: planning wall-time serial vs pooled (the
    // r10 verdict's DSv2 scale item), task count, warm read. Planning
    // is isolated via rdd.getNumPartitions (runs planInputPartitions,
    // reads no data); local NVMe header reads are ~0.1 ms so the pool's
    // win here bounds below the object-storage case (1-2 RTTs/file).
    if (which == "dsv2plan") {
      val dir = java.nio.file.Files.createTempDirectory("soak_plan").toString
      val nFiles = if (args.length > 1) args(1).toInt else 1000
      val nf = 4; val w = 40; val h = 30
      for (f <- 0 until nFiles) {
        val frames = Seq.tabulate(nf)(t =>
          Array.tabulate(w * h)(i => ((i + t + f) % 1000).toDouble))
        graft.raster.Grib.write(s"$dir/f$f.grib2", frames, w, h,
          Double.MaxValue, Seq.tabulate(nf)(_ * 3600000L), 0.0, 0.0, 0.0001,
          template = 3)
      }
      for (par <- Seq(1, 32); round <- 1 to 3) {
        System.setProperty("graft.raster.planParallelism", par.toString)
        val (nParts, secPlan) = time {
          spark.read.format("graft-raster").load(dir).rdd.getNumPartitions
        }
        println(f"""{"soak":"dsv2_plan","par":$par,"round":$round,"files":$nFiles,"partitions":$nParts,"sec":$secPlan%.3f}""")
      }
      System.clearProperty("graft.raster.planParallelism")
      val (cnt, secCnt) = time {
        spark.read.format("graft-raster").load(dir).count()
      }
      println(f"""{"soak":"dsv2_plan_count","files":$nFiles,"rows":$cnt,"sec":$secCnt%.3f}""")
      for (round <- 1 to 2) {
        val (sumV, secRead) = time {
          spark.read.format("graft-raster").load(dir)
            .agg(sum(expr("aggregate(values, 0D, (a, x) -> a + x)")))
            .collect()(0).getDouble(0)
        }
        println(f"""{"soak":"dsv2_plan_read","round":$round,"files":$nFiles,"sec":$secRead%.3f,"sum":$sumV%.1f}""")
      }
    }

    // ------------------------------------------------ Zipfian line probe
    if (which == "all" || which == "zipf") {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val nDocs = 200000
      val linesPerDoc = 25
      // Zipfian: line rank r appears with probability ∝ 1/r over a
      // 10k-line vocabulary -> the top line lands on ~1/ln(10k) ≈ 10%
      // of all rows, rank 2 on 5%, ... (plus every doc shares line 0)
      def corpus(zipf: Boolean): DataFrame =
        spark.range(nDocs.toLong).select(col("id").as("doc_id"),
          array_join(transform(sequence(lit(0), lit(linesPerDoc - 1)), i => {
            val h = abs(hash(col("id") * 31 + i * 7919))
            // log-uniform over [1, 10000): density ∝ 1/rank (Zipf)
            val rank =
              if (zipf) floor(exp(h % 1000000 / 1000000.0 *
                math.log(10000))).cast("long")
              else (h % 10000).cast("long")
            // 60% of lines unique to their doc (survive the filter),
            // 40% drawn from the shared vocabulary (the hot join keys)
            when(i % 5 < 3,
              concat(lit("unique to "), col("id"), lit(" line "), i))
              .otherwise(concat(lit("line body number "), rank))
          }), "\n").as("text"))
      for (z <- Seq(false, true)) {
        val label = if (z) "zipf" else "uniform"
        val (agg, sec) = time {
          Lines.dropBoilerplate(corpus(z), "doc_id", "text", 2)
            .agg(sum(length(col("clean_text"))), sum(col("n_removed")))
            .collect()(0).getLong(0)
        }
        println(f"""{"soak":"zipf_line_probe","dist":"$label","docs":$nDocs,"sec":$sec%.3f,"agg":$agg}""")
      }
    }

    spark.stop()
  }
}
