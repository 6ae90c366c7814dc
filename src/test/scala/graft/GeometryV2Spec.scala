package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geometry._
import graft.sources.GraftFgbOffset

/** The `graft-fgb` DSv2 connector: schema, bbox planning (file prune +
  * R-tree exactness), column pruning, Hadoop-scheme paths, and
  * agreement with the block-API FlatGeobufSource. */
class GeometryV2Spec extends SparkSpec {

  /** Two square layers: `near` around the origin, `far` translated by
    * +1000 in x — disjoint extents, same property layout. */
  private lazy val archive: (String, String, String) = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_v2").toString
    def squares(shift: Double): DataFrame =
      (0 until 40).map { i =>
        val x = shift + (i % 8) * 3.0
        val y = (i / 8) * 3.0
        (i.toLong, s"sq$i", i * 1.5,
          s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 2}, $x ${y + 2}, $x $y))")
      }.toDF("fid", "name", "score", "wkt")
        .select(col("fid"), col("name"), col("score"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    val near = s"$dir/near.fgb"
    val far = s"$dir/far.fgb"
    FlatGeobufSink.writeStream(squares(0.0), "EPSG:28992", near)(sp)
    FlatGeobufSink.writeStream(squares(1000.0), "EPSG:28992", far)(sp)
    (dir, near, far)
  }

  test("schema and full-archive read match the block source") {
    val (dir, near, _) = archive
    val df = spark.read.format("graft-fgb").load(dir)
    assert(df.columns.toSeq ==
      Seq("path", "fid", "env_minx", "env_miny", "env_maxx", "env_maxy",
        "name", "score", "geometry", "crs"))
    assert(df.select("crs").head().getString(0) == "EPSG:28992")
    assert(df.count() == 80)
    // one file, against the block source row-for-row
    val v2 = spark.read.format("graft-fgb").load(near)
      .select("fid", "name", "score", "geometry")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        GeomFunctions.readWkb(r.getAs[Array[Byte]](3)).toText))
      .sortBy(_._1)
    val block = FlatGeobufSource(near).frame(GeometryRequest())(spark)
      .select("fid", "name", "score", "geometry")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        GeomFunctions.readWkb(r.getAs[Array[Byte]](3)).toText))
      .sortBy(_._1)
    assert(v2.toSeq == block.toSeq)
  }

  test("bbox prunes non-intersecting files at planning and hits exactly " +
      "the envelope-intersecting features") {
    val (dir, _, _) = archive
    // covers near's squares with 0 <= x0 of envelope <= 7 (cols 0..2 at
    // x 0,3,6 → envelopes [0,2],[3,5],[6,8] all intersect [1.1, 6.9])
    val df = spark.read.format("graft-fgb")
      .option("bbox", "1.1,0.5,6.9,3.7").load(dir)
      .select("fid")
    val full = spark.read.format("graft-fgb").load(dir)
    // the far file plans ZERO partitions under the bbox
    assert(df.rdd.getNumPartitions < full.rdd.getNumPartitions)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("far.fgb -> pruned"), plan)
    assert(plan.contains("near.fgb -> "), plan)
    // envelope semantics, closed intervals: rows 0 (y 0..2) and 1
    // (y 3..5) intersect y-window [0.5, 3.7]; columns at x 0,3,6
    val want = Seq(0L, 1L, 2L, 8L, 9L, 10L)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("column pruning reaches the scan and geometry decode is skipped") {
    val (_, near, _) = archive
    val df = spark.read.format("graft-fgb").load(near).select("fid", "score")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns [fid,score]"), scanDesc)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).length == 40)
    // count(*) is a COMPLETE pushdown: the planned candidate total,
    // no feature bytes read
    val cnt = spark.read.format("graft-fgb").load(near)
      .groupBy().count()
    assert(cnt.queryExecution.executedPlan.toString
      .contains("complete agg [count]"),
      cnt.queryExecution.executedPlan.toString)
    assert(spark.read.format("graft-fgb").load(near).count() == 40)
    // a bbox-pruned count is the exact hit-set size, same path
    assert(spark.read.format("graft-fgb")
      .option("bbox", "1.1,0.5,6.9,3.7").load(dirOf(near)).count() == 6)
  }

  private def dirOf(p: String): String =
    new java.io.File(p).getParent

  test("bbox and limit compose: planning truncates the pruned hit set") {
    val (dir, near, _) = archive
    val df = spark.read.format("graft-fgb")
      .option("bbox", "1.1,0.5,6.9,3.7").load(dir)
      .select("fid").limit(2)
    assert(df.collect().length == 2)
    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val planned = scanExec.inputPartitions.map(
      _.asInstanceOf[graft.sources.GraftFgbPartition])
    // only features from the intersecting file, at most the limit
    assert(planned.map(_.offs.length).sum == 2)
    assert(planned.forall(_.path == near))
  }

  test("file:// scheme paths plan and decode identically to local") {
    val (_, near, _) = archive
    val local = spark.read.format("graft-fgb").load(near)
      .select("fid", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val viaScheme = spark.read.format("graft-fgb").load(s"file://$near")
      .select("fid", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaScheme.toSeq == local.toSeq)
  }

  test("DSv2 write: one indexed .fgb per task, round-trips through the " +
      "connector read, empty tasks write nothing") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_v2_write").toString
    val df = (0 until 60).map { i =>
      val x = (i % 10) * 5.0; val y = (i / 10) * 5.0
      (i.toLong, s"w$i", i * 0.5,
        s"POLYGON (($x $y, ${x + 3} $y, ${x + 3} ${y + 3}, $x ${y + 3}, $x $y))")
    }.toDF("fid", "name", "score", "wkt")
      .select(col("fid"), col("name"), col("score"),
        GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    // range-partition on fid so parts are spatially coherent-ish; 8
    // partitions over 60 rows exercises multiple files
    df.repartitionByRange(8, col("fid"))
      .write.format("graft-fgb").option("srs", "EPSG:28992")
      .mode("append").save(dir)
    val parts = new java.io.File(dir).listFiles.map(_.getName).sorted
    assert(parts.forall(n => n.startsWith("part-") && n.endsWith(".fgb")),
      parts.mkString(","))
    assert(parts.length >= 2 && parts.length <= 8)
    val back = spark.read.format("graft-fgb").load(dir)
    // adopted fid + properties + geometry round-trip
    val got = back.select("fid", "name", "score", "geometry")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        GeomFunctions.readWkb(r.getAs[Array[Byte]](3)).toText)).sortBy(_._1)
    val want = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2),
      GeomFunctions.readWkb(r.getAs[Array[Byte]](3)).toText)).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // every part carries its own R-tree: a bbox read over the written
    // archive uses the index (exact envelope hits, no residual filter)
    val hit = spark.read.format("graft-fgb")
      .option("bbox", "0.5,0.5,4.5,4.5").load(dir)
      .select("fid").collect().map(_.getLong(0)).sorted
    assert(hit.toSeq == Seq(0L), hit.mkString(","))
    // empty tasks must not leave empty or temp files
    val dir2 = java.nio.file.Files.createTempDirectory("fgb_v2_w2").toString
    df.limit(2).repartition(6)
      .write.format("graft-fgb").option("srs", "EPSG:28992")
      .mode("append").save(dir2)
    val parts2 = new java.io.File(dir2).listFiles.map(_.getName)
    assert(parts2.forall(n => n.startsWith("part-") && n.endsWith(".fgb")))
    assert(spark.read.format("graft-fgb").load(dir2).count() == 2)
  }

  test("envelope-column predicates push down to the R-tree like the " +
      "bbox option, visible in PushedFilters") {
    val (dir, _, _) = archive
    val viaFilter = spark.read.format("graft-fgb").load(dir)
      .filter(col("env_maxx") >= 1.1 && col("env_minx") <= 6.9 &&
        col("env_maxy") >= 0.5 && col("env_miny") <= 3.7)
      .select("fid")
    val plan = viaFilter.queryExecution.executedPlan.toString
    assert(plan.contains("far.fgb -> pruned"), plan)
    // the four predicates resolved to one pushed window in the scan
    assert(plan.contains("pushed bbox [1.1, 0.5, 6.9, 3.7]"), plan)
    val viaOption = spark.read.format("graft-fgb")
      .option("bbox", "1.1,0.5,6.9,3.7").load(dir).select("fid")
    assert(viaFilter.collect().map(_.getLong(0)).sorted.toSeq ==
      viaOption.collect().map(_.getLong(0)).sorted.toSeq)
    // the filter prune plans the same number of partitions
    assert(viaFilter.rdd.getNumPartitions == viaOption.rdd.getNumPartitions)
    // strict bounds stay exact: the window prunes closed, the residual
    // filter above the scan resolves the tie
    val strict = spark.read.format("graft-fgb").load(dir)
      .filter(col("env_maxx") > 0.0 && col("env_minx") < 2.0)
      .select("fid").collect().map(_.getLong(0)).sorted
    assert(strict.nonEmpty)
    // env columns read as data too (null-safe would need null geoms)
    val env = spark.read.format("graft-fgb").load(dir)
      .filter(col("fid") === 0 && !col("path").contains("far"))
      .select("env_minx", "env_maxy").head()
    assert(env.getDouble(0) == 0.0 && env.getDouble(1) == 2.0)
  }

  test("streaming read: newly landed .fgb parts flow through " +
      "micro-batches exactly once") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_stream").toString
    def part(tag: String, base: Long): String = {
      val out = s"$dir/$tag.fgb"
      val df = (0 until 5).map { k =>
        val x = k * 3.0
        (base + k, s"$tag$k",
          s"POLYGON (($x 0, ${x + 2} 0, ${x + 2} 2, $x 2, $x 0))")
      }.toDF("fid", "name", "wkt")
        .select(col("fid"), col("name"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
      FlatGeobufSink.writeStream(df, "EPSG:28992", out)(sp)
      out
    }
    part("a", 0L)
    val schema = spark.read.format("graft-fgb").load(dir).schema
    val q = spark.readStream.format("graft-fgb").schema(schema).load(dir)
      .select("fid", "name")
      .writeStream.outputMode("append").format("memory")
      .queryName("fgb_stream_test").start()
    try {
      q.processAllAvailable()
      val first = spark.table("fgb_stream_test").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(first.length == 5 && first.head == (0L, "a0"))
      // a second part lands AFTER the stream started: next batch emits
      // exactly its rows, nothing re-read
      part("b", 100L)
      q.processAllAvailable()
      val all = spark.table("fgb_stream_test").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(all.length == 10, all.mkString(","))
      assert(all.count(_._2.startsWith("a")) == 5 &&
        all.count(_._2.startsWith("b")) == 5)
    } finally q.stop()
    // offset round-trips through its JSON encoding
    val off = GraftFgbOffset(Set(s"$dir/a.fgb", s"$dir/b.fgb"))
    assert(GraftFgbOffset.fromJson(off.json()) == off)
    // pushdown applies to the STREAM too: the same ScanBuilder plans
    // micro-batches, so a bbox option prunes features in new parts
    val schema2 = spark.read.format("graft-fgb").load(dir).schema
    val q2 = spark.readStream.format("graft-fgb").schema(schema2)
      .option("bbox", "0.5,0.5,2.5,1.5") // only the k=0 square of each part
      .load(dir)
      .select("fid")
      .writeStream.outputMode("append").format("memory")
      .queryName("fgb_stream_bbox").start()
    try {
      q2.processAllAvailable()
      val hit = spark.table("fgb_stream_bbox").collect()
        .map(_.getLong(0)).sorted
      assert(hit.toSeq == Seq(0L, 100L), hit.mkString(","))
    } finally q2.stop()
  }

  test("end-to-end streaming pipeline: fgb watcher -> transform -> " +
      "streaming fgb write, epochs publish immutable parts") {
    val sp = spark
    import sp.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("fgb_pipe_src").toString
    val dstDir = java.nio.file.Files.createTempDirectory("fgb_pipe_dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fgb_pipe_ck").toString
    def land(tag: String, base: Long): Unit = {
      val df = (0 until 4).map { k =>
        val x = k * 2.0
        (base + k, s"$tag$k",
          s"POLYGON (($x 0, ${x + 1} 0, ${x + 1} 1, $x 1, $x 0))")
      }.toDF("fid", "name", "wkt")
        .select(col("fid"), col("name"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
      FlatGeobufSink.writeStream(df, "EPSG:28992", s"$srcDir/$tag.fgb")(sp)
    }
    land("a", 0L)
    val schema = spark.read.format("graft-fgb").load(srcDir).schema
    val q = spark.readStream.format("graft-fgb").schema(schema).load(srcDir)
      .select(col("fid"), upper(col("name")).as("name"), col("geometry"))
      .writeStream.outputMode("append").format("graft-fgb")
      .option("srs", "EPSG:28992")
      .option("checkpointLocation", ckpt)
      .start(dstDir)
    try {
      q.processAllAvailable()
      land("b", 100L)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.format("graft-fgb").load(dstDir)
      .select("fid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(out.length == 8, out.mkString(","))
    assert(out.count(_._2.startsWith("A")) == 4 &&
      out.count(_._2.startsWith("B")) == 4)
    // parts are per-epoch, no temp leftovers
    val names = new java.io.File(dstDir).listFiles.map(_.getName)
      .filterNot(_.startsWith(".")) // spark checkpoint markers, if any
    assert(names.forall(n => n.startsWith("part-") && n.endsWith(".fgb")),
      names.mkString(","))
  }

  test("limit pushdown caps planned byte ranges; reported statistics " +
      "let a small archive broadcast in joins") {
    val sp = spark
    import sp.implicits._
    val (dir, _, _) = archive
    // LIMIT 3 schedules at most 3 candidate features
    val lim = spark.read.format("graft-fgb").load(dir).limit(3)
    assert(lim.collect().length == 3)
    val scanExec = lim.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val planned = scanExec.inputPartitions.map(
      _.asInstanceOf[graft.sources.GraftFgbPartition].offs.length).sum
    assert(planned == 3, s"planned $planned candidate features")
    // Catalyst sees the scan's true size: optimizer stats are tiny
    val df = spark.read.format("graft-fgb").load(dir)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0 && size < 10L * 1024 * 1024, s"sizeInBytes $size")
    // ...so a join against a big side picks a broadcast of the archive
    val big = spark.range(100000).select(col("id").as("fid"),
      (col("id") % 7).as("grp"))
    val joined = df.select("fid", "name").join(big, "fid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("runtime filtering on path prunes archive files at execution") {
    val (dir, near, far) = archive
    val df = spark.read.format("graft-fgb").load(dir)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.get.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("path"))
    val before = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions().length
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("path", Array(near))))
    val after = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions()
    assert(after.length < before || before == 1)
    assert(after.forall(p =>
      p.asInstanceOf[graft.sources.GraftFgbPartition].path == near), far)
  }

  test("property equality predicates push into the scan: evaluated " +
      "before geometry decode, visible in the plan, exact results") {
    val (dir, _, _) = archive
    val df = spark.read.format("graft-fgb").load(dir)
      .filter(col("name") === "sq7")
      .select("fid", "name", "score", "geometry")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("name = sq7"), plan)
    // both files carry a sq7 (fid 7); values decode exactly
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).sorted.toSeq
    assert(got == Seq((7L, "sq7", 10.5), (7L, "sq7", 10.5)), got)
    // numeric property equality too, composed with bbox pruning
    val num = spark.read.format("graft-fgb")
      .option("bbox", "-10,-10,500,500").load(dir)
      .filter(col("score") === 3.0).select("fid")
    assert(num.queryExecution.executedPlan.toString
      .contains("score = 3.0"))
    assert(num.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a pushed LIMIT must NOT truncate planning under reader-side
    // filters: all matches still come back
    val lim = spark.read.format("graft-fgb").load(dir)
      .filter(col("name") === "sq7").select("fid").limit(2)
    assert(lim.collect().length == 2)
    // no match -> empty, not an error
    assert(spark.read.format("graft-fgb").load(dir)
      .filter(col("name") === "nope").count() == 0)
    // count(*) under a residual filter goes through the NORMAL scan
    // (never the complete-agg candidate count)
    val cnt = spark.read.format("graft-fgb").load(dir)
      .filter(col("name") === "sq7")
    assert(!cnt.groupBy().count().queryExecution.executedPlan.toString
      .contains("complete agg"))
    assert(cnt.count() == 2)
    // IN and IS NOT NULL push the same way (both files carry fids 2,3)
    val inDf = spark.read.format("graft-fgb").load(dir)
      .filter(col("name").isin("sq2", "sq3")).select("fid")
    assert(inDf.queryExecution.executedPlan.toString
      .contains("in (sq2,sq3)"),
      inDf.queryExecution.executedPlan.toString.take(1200))
    assert(inDf.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 2L, 3L, 3L))
    val nn = spark.read.format("graft-fgb").load(dir)
      .filter(col("name").isNotNull)
    assert(nn.queryExecution.executedPlan.toString.contains("name not null"))
    assert(nn.count() == 80)
  }

  test("MIN/MAX(env_*) + COUNT(*) answer from header and index bytes " +
      "alone; null geometries have NO envelope; corrupt feature bytes " +
      "prove the pushed path reads zero data") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_envagg").toString
    // two files; file b carries a null geometry (no envelope -> NULL
    // env columns, skipped by SQL MIN/MAX but counted by COUNT(*))
    def mk(rows: Seq[(Long, String)], name: String): Unit = {
      val df = rows.toDF("fid", "wkt").select(col("fid"),
        when(col("wkt").isNull, lit(null).cast("binary"))
          .otherwise(GeomFunctions.stGeomFromWkt(col("wkt"))).as("geometry"))
      FlatGeobufSink.writeStream(df, "EPSG:4326", s"$dir/$name.fgb")(sp)
    }
    mk(Seq((1L, "POINT (2 3)"), (2L, "LINESTRING (5 1, 9 4)")), "a")
    mk(Seq((3L, "POINT (-4 8)"), (4L, null)), "b")
    val agg = spark.read.format("graft-fgb").load(dir)
      .agg(count("*").as("n"), min("env_minx").as("ax"),
        min("env_miny").as("ay"), max("env_maxx").as("bx"),
        max("env_maxy").as("by"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("env min/max from index"),
      agg.queryExecution.executedPlan.toString.take(1200))
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val r = df.collect()(0)
      assert(r.getLong(0) == 4L) // count includes the null-geometry row
      assert((r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)) == ((-4.0, 1.0, 9.0, 8.0)), r)
    }
    check(agg)
    // CORRUPT the feature sections (keep header + R-tree): the pushed
    // path must still answer — zero data bytes are read
    Seq("a", "b").foreach { n =>
      val p = s"$dir/$n.fgb"
      val m = FgbMeta.read(p)
      val raf = new java.io.RandomAccessFile(p, "rw")
      try {
        raf.seek(m.featStart)
        raf.write(Array.fill((m.fileLen - m.featStart).toInt)(0x5A.toByte))
      } finally raf.close()
    }
    check(spark.read.format("graft-fgb").load(dir)
      .agg(count("*").as("n"), min("env_minx").as("ax"),
        min("env_miny").as("ay"), max("env_maxx").as("bx"),
        max("env_maxy").as("by")))
    // an ALL-null-geometry archive: MIN/MAX over zero envelopes is NULL
    val dir2 = java.nio.file.Files.createTempDirectory("fgb_envnull").toString
    val nulls = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("fid", "wkt")
      .select(col("fid"), lit(null).cast("binary").as("geometry"))
    FlatGeobufSink.writeStream(nulls, "EPSG:4326", s"$dir2/n.fgb")(sp)
    val rn = spark.read.format("graft-fgb").load(dir2)
      .agg(count("*").as("n"), min("env_minx").as("ax"),
        max("env_maxx").as("bx")).collect()(0)
    assert(rn.getLong(0) == 2L && rn.isNullAt(1) && rn.isNullAt(2))
    // a bbox-restricted read can NOT use the archive-wide fold: plan
    // falls back to the scan (and the null-geometry feature, having no
    // envelope, never matches a window)
    val dir3 = java.nio.file.Files.createTempDirectory("fgb_envbox").toString
    val dfc = Seq((1L, "POINT (2 3)"), (2L, null)).toDF("fid", "wkt")
      .select(col("fid"), when(col("wkt").isNull,
        lit(null).cast("binary"))
        .otherwise(GeomFunctions.stGeomFromWkt(col("wkt"))).as("geometry"))
    FlatGeobufSink.writeStream(dfc, "EPSG:4326", s"$dir3/c.fgb")(sp)
    val boxed = spark.read.format("graft-fgb")
      .option("bbox", "0,0,10,10").load(dir3)
    assert(!boxed.agg(min("env_minx")).queryExecution.executedPlan
      .toString.contains("env min/max from index"))
    assert(boxed.count() == 1L) // null geometry: no envelope, no match
    // MIN over a MAX column is not index-derivable: falls back, exact
    val mixed = spark.read.format("graft-fgb").load(dir3)
      .agg(min("env_maxx").as("m"))
    assert(!mixed.queryExecution.executedPlan.toString
      .contains("env min/max from index"))
    assert(mixed.collect()(0).getDouble(0) == 2.0)
    // an outer query can prune EVERY aggregate output: Spark offers an
    // EMPTY aggregation, which must NOT be answered with a count row
    // (planner asserts on the column count) — caught by the sf30 soak
    assert(spark.read.format("graft-fgb").load(dir3)
      .agg(count("*").as("n"), min("env_minx").as("ax")).count() == 1L)
    assert(spark.read.format("graft-fgb").load(dir3)
      .agg(count("*").as("n")).count() == 1L)
  }

  test("pushed numeric equality matches Spark SQL signed-zero " +
      "semantics: score === 0.0 keeps stored -0.0 rows") {
    val sp = spark
    import sp.implicits._
    // Spark evaluates -0.0 = 0.0 as TRUE; Double.equals distinguishes
    // them — and a reader-side filter can only SUBTRACT rows, so a
    // naive pushed equality silently drops the -0.0 row for good
    val dir = java.nio.file.Files.createTempDirectory("fgb_szero").toString
    val df = Seq((1L, -0.0, "POINT (0 0)"), (2L, 0.0, "POINT (1 1)"),
        (3L, 5.0, "POINT (2 2)"))
      .toDF("fid", "score", "wkt")
      .select(col("fid"), col("score"),
        GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    FlatGeobufSink.writeStream(df, "EPSG:4326", s"$dir/z.fgb")(sp)
    val eq = spark.read.format("graft-fgb").load(dir)
      .filter(col("score") === 0.0).select("fid")
    // pushed (visible in the scan) AND both zero rows survive
    assert(eq.queryExecution.executedPlan.toString.contains("score = 0.0"))
    assert(eq.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val in = spark.read.format("graft-fgb").load(dir)
      .filter(col("score").isin(0.0, 5.0)).select("fid")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // the predicate units normalize BOTH sides (literal and decoded)
    import graft.sources.{PropEqPred, PropInPred}
    assert(PropEqPred(0, 0.0).eval(java.lang.Double.valueOf(-0.0)))
    assert(PropEqPred(0, -0.0).eval(java.lang.Double.valueOf(0.0)))
    assert(PropEqPred(0, 0.0f).eval(java.lang.Float.valueOf(-0.0f)))
    assert(!PropEqPred(0, 0.0).eval(java.lang.Double.valueOf(1.0)))
    assert(PropInPred(0, Array[Any](-0.0)).eval(java.lang.Double.valueOf(0.0)))
    // NaN equals itself (Spark's NaN semantics; boxed equals already does)
    assert(PropEqPred(0, Double.NaN).eval(java.lang.Double.valueOf(Double.NaN)))
  }

  test("a streaming watch starts over an EMPTY directory (explicit " +
      "schema) and emits the first part when it lands") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_empty").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("fid",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    // no .fgb parts have landed yet: the watch must START, not throw
    val q = spark.readStream.format("graft-fgb").schema(schema).load(dir)
      .select("fid", "name")
      .writeStream.outputMode("append").format("memory")
      .queryName("fgb_empty_watch").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fgb_empty_watch").count() == 0)
      val df = Seq((7L, "late", "POINT (1 1)")).toDF("fid", "name", "wkt")
        .select(col("fid"), col("name"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
      FlatGeobufSink.writeStream(df, "EPSG:28992", s"$dir/late.fgb")(sp)
      q.processAllAvailable()
      val got = spark.table("fgb_empty_watch").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((7L, "late")), got.mkString(","))
    } finally q.stop()
    // a BATCH scan of an empty archive still fails loudly
    val ex = intercept[Exception] {
      spark.read.format("graft-fgb").schema(schema)
        .load(java.nio.file.Files.createTempDirectory("fgb_empty2").toString)
        .count()
    }
    assert(ex.getMessage.contains("holds no .fgb files"), ex.getMessage)
  }

  test("successive batch appends to one archive never collide on part " +
      "names; both writes' rows read back") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_append2").toString
    def frame(base: Long): DataFrame =
      (0 until 6).map { k =>
        val x = k * 2.0
        (base + k, s"r${base + k}",
          s"POLYGON (($x 0, ${x + 1} 0, ${x + 1} 1, $x 1, $x 0))")
      }.toDF("fid", "name", "wkt")
        .select(col("fid"), col("name"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    frame(0L).repartition(2).write.format("graft-fgb")
      .option("srs", "EPSG:28992").mode("append").save(dir)
    // the second append reuses partition ids 0..1 — write-unique names
    // must keep the job commit from colliding with the first write
    frame(100L).repartition(2).write.format("graft-fgb")
      .option("srs", "EPSG:28992").mode("append").save(dir)
    val got = spark.read.format("graft-fgb").load(dir)
      .select("fid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 6L) ++ (100L until 106L)).toSeq,
      got.mkString(","))
    val names = new java.io.File(dir).listFiles.map(_.getName)
    assert(names.forall(n => n.startsWith("part-") && n.endsWith(".fgb")),
      names.mkString(","))
    assert(names.length == 4, names.mkString(","))
  }

  test("streaming epoch commit is idempotent: a replayed commit whose " +
      "part already published drops the tmp instead of failing") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_replay").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    val w = new graft.sources.GraftFgbStreamingWrite(
      graft.sources.GraftFgbWrite.config(dir, Map("srs" -> "EPSG:28992")),
      schema)
    // simulate a crash between renames: the part is already at its
    // final name, the replayed epoch re-offers the same (tmp, fin)
    val fin = s"$dir/part-000001-00000.fgb"
    val tmp = s"$dir/_tmp_part-000001-00000-42.tmp"
    graft.io.FileIO.writeAll(fin, Array[Byte](1, 2, 3))
    graft.io.FileIO.writeAll(tmp, Array[Byte](1, 2, 3))
    w.commit(1L, Array(graft.sources.GraftFgbPartWritten(tmp, fin)))
    assert(graft.io.FileIO.exists(fin))
    assert(!graft.io.FileIO.exists(tmp), "replayed tmp must be dropped")
    // and a FRESH part still publishes by rename
    val fin2 = s"$dir/part-000002-00000.fgb"
    val tmp2 = s"$dir/_tmp_part-000002-00000-43.tmp"
    graft.io.FileIO.writeAll(tmp2, Array[Byte](9))
    w.commit(2L, Array(graft.sources.GraftFgbPartWritten(tmp2, fin2)))
    assert(graft.io.FileIO.exists(fin2) && !graft.io.FileIO.exists(tmp2))
    // a PARTIAL publish (non-atomic copy+delete rename that crashed
    // mid-copy: final exists but is SHORTER than the finished tmp) must
    // be re-published from the tmp, not kept truncated
    val fin3 = s"$dir/part-000003-00000.fgb"
    val tmp3 = s"$dir/_tmp_part-000003-00000-44.tmp"
    graft.io.FileIO.writeAll(fin3, Array[Byte](1)) // truncated publish
    graft.io.FileIO.writeAll(tmp3, Array[Byte](1, 2, 3, 4))
    w.commit(3L, Array(graft.sources.GraftFgbPartWritten(tmp3, fin3)))
    assert(graft.io.FileIO.size(fin3) == 4L,
      "truncated final must be replaced by the complete tmp")
    assert(!graft.io.FileIO.exists(tmp3))
  }

  test("randomized property-pushdown equivalence: pushed predicates " +
      "return exactly what the unpushed block API returns (nulls, all " +
      "scalar types)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fgb_fuzz").toString
    val url = s"$dir/t.fgb"
    // mixed types with nulls sprinkled in (null name every 7th, null
    // score every 5th, null geometry every 11th)
    val rows = (0 until 120).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else s"n${i % 9}",
        if (i % 5 == 0) None else Some(i % 6 * 1.5),
        i % 4,
        i % 2 == 0,
        if (i % 11 == 0) null
        else s"POINT (${i % 10} ${i / 10})")
    }
    val df = rows.toDF("fid", "name", "score", "cnt", "flag", "wkt")
      .select(col("fid"), col("name"), col("score"), col("cnt"), col("flag"),
        GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    FlatGeobufSink.writeStream(df, "EPSG:28992", url)(sp)
    val rnd = new scala.util.Random(20260815L)
    def somePred(): org.apache.spark.sql.Column = rnd.nextInt(6) match {
      case 0 => col("name") === s"n${rnd.nextInt(10)}"
      case 1 => col("name").isin(Seq.fill(1 + rnd.nextInt(3))(
        s"n${rnd.nextInt(10)}"): _*)
      case 2 => col("name").isNotNull
      case 3 => col("score") === (rnd.nextInt(7) * 1.5)
      case 4 => col("cnt") === rnd.nextInt(5)
      case 5 => col("flag") === (rnd.nextInt(2) == 0)
    }
    val truthBase = FlatGeobufSource(url).frame(GeometryRequest())(sp)
      .select("fid", "name", "score", "cnt", "flag")
    val pushedBase = spark.read.format("graft-fgb").load(url)
      .select("fid", "name", "score", "cnt", "flag")
    for (trial <- 0 until 30) {
      val preds = Seq.fill(1 + rnd.nextInt(3))(somePred()).reduce(_ && _)
      val want = truthBase.filter(preds)
        .collect().map(_.getLong(0)).sorted.toSeq
      val got = pushedBase.filter(preds)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"trial $trial: preds=$preds got=$got want=$want")
    }
  }

  test("an archive with drifting property layouts fails loudly at planning") {
    val sp = spark
    import sp.implicits._
    val (dir, _, _) = archive
    val drifted = s"$dir/drift.fgb"
    FlatGeobufSink.writeStream(
      Seq((1L, 2.0, "POINT (0 0)")).toDF("fid", "other", "wkt")
        .select(col("fid"), col("other"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry")),
      "EPSG:28992", drifted)(sp)
    try {
      val ex = intercept[Exception] {
        spark.read.format("graft-fgb").load(dir).count()
      }
      assert(ex.getMessage.contains("do not match the archive schema"),
        ex.getMessage)
    } finally java.nio.file.Files.delete(java.nio.file.Paths.get(drifted))
  }
}
