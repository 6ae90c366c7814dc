package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.raster.{Bbox, Grib, Zarr}

/** DataSource V2 connector: executor-side decode, frame-partition
  * pruning under temporal pushdown, directory expansion. */
class RasterV2Spec extends SparkSpec {

  private def writeGrib(path: String, frames: Seq[Array[Double]],
      w: Int, h: Int): Unit =
    Grib.write(path, frames, w, h, Double.MaxValue,
      frames.indices.map(_ * 3600000L), 0.0, 0.0, 0.05)

  test("graft-raster reads a GRIB stack with exact tile values") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val w = 7; val h = 5
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => (t * 1000 + i).toDouble))
    writeGrib(s"$dir/s.grib2", frames, w, h)
    val df = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    assert(df.columns.toSeq ==
      Seq("path", "t", "ty", "tx", "values", "x0", "y0", "x1", "y1", "crs"))
    assert(df.select("crs").head().getString(0) == "EPSG:4326")
    val rows = df.orderBy("t").collect()
    assert(rows.length == 3) // one 256-tile covers the 7x5 grid
    for ((r, t) <- rows.zipWithIndex) {
      assert(r.getLong(1) == t * 3600000L)
      assert(r.getSeq[Double](4) == frames(t).toSeq)
    }
  }

  test("temporal pushdown prunes whole (file, frame) partitions") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2p").toString
    writeGrib(s"$dir/s.grib2",
      Seq.tabulate(4)(t => Array.fill(4)(t.toDouble)), 2, 2)
    val df = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    assert(df.rdd.getNumPartitions == 4)
    val sliced = df.filter(col("t") >= 3600000L && col("t") <= 7200000L)
    // one partition per surviving frame: the filter reached planning
    assert(sliced.rdd.getNumPartitions == 2,
      sliced.queryExecution.executedPlan.toString)
    assert(sliced.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 3.0) // frames 1 + 2
  }

  test("a directory expands to its GRIB files; Zarr stores read too") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2d").toString
    writeGrib(s"$dir/a.grib2", Seq(Array.fill(4)(1.0)), 2, 2)
    writeGrib(s"$dir/b.grib2", Seq(Array.fill(4)(2.0)), 2, 2)
    Zarr.write(s"$dir/c.zarr", Seq(Array.fill(4)(3.0)), 2, 2,
      Bbox(0, 0, 2, 2), -9.0, "EPSG:28992", Seq(0L))
    val df = sp.read.format("graft-raster").load(dir)
    assert(df.count() == 3)
    assert(df.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 6.0)
    // per-path provenance survives
    assert(df.select(countDistinct(col("path"))).collect()(0).getLong(0) == 3)
  }

  test("GeoTIFF files read through the connector (bands -> frames)") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2t").toString
    graft.raster.GeoTiff.write(s"$dir/a.tif",
      Array.tabulate(6)(_ * 1.0), 3, 2, Bbox(0, 0, 3, 2), 28992, -9999.0)
    graft.raster.GeoTiff.write(s"$dir/b.tif",
      Array.tabulate(6)(_ * 10.0), 3, 2, Bbox(0, 0, 3, 2), 28992, -9999.0)
    val df = sp.read.format("graft-raster").option("time_first", "5000")
      .load(s"$dir/a.tif", s"$dir/b.tif")
    val rows = df.orderBy("path").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(1) == 5000L)) // time_first honored
    assert(rows(0).getSeq[Double](4) == Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    assert(rows(1).getSeq[Double](4).map(_ / 10) ==
      Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    // a directory mixing formats picks the tifs up too
    val all = sp.read.format("graft-raster").load(dir)
    assert(all.count() == 2)
  }

  test("column pruning reaches the payload: no values, no data bytes") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2c").toString
    Zarr.write(s"$dir/s.zarr", Seq(Array.tabulate(4)(_ * 1.0)), 2, 2,
      Bbox(0, 0, 2, 2), -9.0, "EPSG:28992", Seq(0L), zarrVersion = 3)
    // corrupt the data chunk: any decode of it must now throw
    val chunk = Paths.get(s"$dir/s.zarr/band1/c/0/0/0")
    Files.write(chunk, Array.fill[Byte](16)(0x5A))
    val df = sp.read.format("graft-raster").load(s"$dir/s.zarr")
    // planning reads zarr.json + coordinates only; a query without
    // `values` never opens the chunk — count and time listing succeed
    assert(df.count() == 1)
    assert(df.select("path", "t", "ty", "tx").collect().length == 1)
    // and the pruned schema shows in the scan description
    val plan = df.select("t").queryExecution.executedPlan.toString
    assert(plan.contains("columns [t]"), plan)
    // the moment values are required, the corrupt chunk fails loudly
    intercept[Exception] { df.select("values").collect() }
  }

  test("pooled planning over many files stays header-only and exact") {
    val sp = spark
    // 40 datasets > the 32-way planning pool: every store's DATA chunk
    // is corrupted, so any planning-time (or metadata-query-time) data
    // read fails loudly — count, time listing and pruning must all
    // succeed off headers alone, in deterministic order
    val dir = Files.createTempDirectory("graft_dsv2pool").toString
    for (i <- 0 until 40) {
      Zarr.write(s"$dir/s$i.zarr", Seq.tabulate(2)(t =>
        Array.fill(4)(i * 10.0 + t)), 2, 2,
        Bbox(0, 0, 2, 2), -9.0, "EPSG:28992", Seq(0L, 3600000L),
        zarrVersion = 3)
      for (t <- 0 until 2)
        Files.write(Paths.get(s"$dir/s$i.zarr/band1/c/$t/0/0"),
          Array.fill[Byte](16)(0x5A))
    }
    val df = sp.read.format("graft-raster").load(dir)
    assert(df.count() == 80)
    assert(df.rdd.getNumPartitions == 80)
    val ts = df.select("path", "t").collect()
    assert(ts.length == 80 && ts.map(_.getLong(1)).count(_ == 0L) == 40)
    // temporal pushdown prunes at (pooled) planning time
    assert(df.filter(col("t") === 0L).rdd.getNumPartitions == 40)
    // data bytes are genuinely corrupt: values fail loudly
    intercept[Exception] { df.select("values").collect() }
  }

  test("NetCDF and HDF5 dataset kinds: exact values, pruned partitions") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2nc").toString
    val w = 5; val h = 4
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => t * 100.0 + i))
    val times = Seq(0L, 3600000L, 7200000L)
    graft.raster.NetCdf.write(s"$dir/a.nc", frames, w, h, Bbox(0, 0, w, h),
      -9999.0, "EPSG:28992", times)
    // an HDF5 container behind the .nc extension: kind is routed on the
    // magic bytes, not the name (the NetCDF-4 reality)
    graft.raster.Hdf5Write.write(s"$dir/b.nc", frames.map(_.map(_ + 1000)),
      w, h, Bbox(0, 0, w, h), -9999.0, "EPSG:28992", times)
    val df = sp.read.format("graft-raster").load(s"$dir/a.nc", s"$dir/b.nc")
    assert(df.rdd.getNumPartitions == 6) // one per (file, frame)
    val rows = df.orderBy("path", "t").collect()
    assert(rows.length == 6)
    assert(rows(1).getSeq[Double](4) == frames(1).toSeq)
    assert(rows(4).getSeq[Double](4) == frames(1).map(_ + 1000).toSeq)
    // temporal pushdown prunes whole (file, frame) partitions
    val sliced = df.filter(col("t") === 3600000L)
    assert(sliced.rdd.getNumPartitions == 2,
      sliced.queryExecution.executedPlan.toString)
    assert(sliced.count() == 2)
    // directory expansion finds both files
    assert(sp.read.format("graft-raster").load(dir).count() == 6)
  }

  test("pushed time filter band-prunes the GeoTIFF decode") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2bp").toString
    val w = 4; val h = 3
    val bands = Seq.tabulate(4)(b =>
      Array.tabulate(w * h)(i => b * 1000.0 + i))
    RasterFixtures.writeChunkyMultibandTiff(s"$dir/mb.tif", bands, w, h)
    val df = sp.read.format("graft-raster").load(s"$dir/mb.tif")
    // lower the materialization guard to 2 bands' worth: a full decode
    // (4 bands) must fail loudly, a time-sliced read (2 surviving
    // bands) must succeed — proof the pushed filter reached the decode
    val prev = graft.raster.RequestGuards.rasterLimitPixels
    graft.raster.RequestGuards.rasterLimitPixels = w.toLong * h * 2
    try {
      val e = intercept[Exception] { df.select("values").collect() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("in-memory limit")), e.getMessage)
      val sliced = df.filter(col("t") >= 3600000L && col("t") <= 7200000L)
        .orderBy("t").collect()
      assert(sliced.length == 2)
      assert(sliced(0).getSeq[Double](4) == bands(1).toSeq)
      assert(sliced(1).getSeq[Double](4) == bands(2).toSeq)
    } finally graft.raster.RequestGuards.rasterLimitPixels = prev
  }

  test("spatial pushdown: tile window matches the unfiltered read, all kinds") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_dsv2s").toString
    val w = 600; val h = 520 // 3x3 tile grid (256-px tiles)
    val frames = Seq.tabulate(2)(t =>
      Array.tabulate(w * h)(i => ((t * 7 + i) % 1000).toDouble))
    val times = Seq(0L, 3600000L)
    writeGrib(s"$dir/s.grib2", frames, w, h)
    Zarr.write(s"$dir/s.zarr", frames, w, h, Bbox(0, 0, 30, 26),
      Double.MaxValue, "EPSG:4326", times)
    graft.raster.Hdf5Write.write(s"$dir/s.nc", frames, w, h,
      Bbox(0, 0, 30, 26), Double.MaxValue, "EPSG:4326", times)
    graft.raster.GeoTiff.write(s"$dir/s.tif", frames.head, w, h,
      Bbox(0, 0, 30, 26), 4326, -9999.0, tileSize = 256)
    for (p <- Seq(s"$dir/s.grib2", s"$dir/s.zarr", s"$dir/s.nc",
        s"$dir/s.tif")) {
      val df = sp.read.format("graft-raster").load(p)
      val base = df.collect().map(r =>
        (r.getLong(1), r.getInt(2), r.getInt(3)) -> r.getSeq[Double](4)).toMap
      val nFrames = base.keySet.map(_._1).size
      // point window
      val one = df.filter($"ty" === 1 && $"tx" === 2).collect()
      assert(one.length == nFrames, s"$p: ${one.length}")
      one.foreach(r => assert(r.getSeq[Double](4) ==
        base((r.getLong(1), 1, 2)), s"$p ty=1 tx=2"))
      // range window: ty >= 1, tx < 2 -> 2 x 2 tiles per frame
      val range = df.filter($"ty" >= 1 && $"tx" < 2).collect()
      assert(range.length == nFrames * 4, s"$p: ${range.length}")
      range.foreach { r =>
        val k = (r.getLong(1), r.getInt(2), r.getInt(3))
        assert(r.getInt(2) >= 1 && r.getInt(3) < 2, s"$p leaked $k")
        assert(r.getSeq[Double](4) == base(k), s"$p $k")
      }
      // the pushed window shows in the scan description
      val plan = df.filter($"ty" === 1 && $"tx" === 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("tiles ty [1, 1] tx [2, 2]"), s"$p plan")
    }
  }

  test("spatial pushdown reaches the bytes: out-of-window chunks never open") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_dsv2sc").toString
    val w = 600; val h = 520
    val frames = Seq.tabulate(2)(t =>
      Array.tabulate(w * h)(i => ((t + i) % 100).toDouble))
    val times = Seq(0L, 3600000L)
    // zarr v3: chunk objects are independently addressable — corrupt
    // EVERY chunk except column cx=2: an AOI read of tx=2 succeeds,
    // the full read fails loudly
    Zarr.write(s"$dir/s.zarr", frames, w, h, Bbox(0, 0, 30, 26),
      Double.MaxValue, "EPSG:4326", times, zarrVersion = 3)
    for (t <- 0 until 2; cy <- 0 until 3; cx <- 0 until 2)
      Files.write(Paths.get(s"$dir/s.zarr/band1/c/$t/$cy/$cx"),
        Array.fill[Byte](24)(0x5A))
    val zdf = sp.read.format("graft-raster").load(s"$dir/s.zarr")
    val got = zdf.filter($"tx" === 2).collect()
    assert(got.length == 6) // 2 frames x 3 ty x 1 tx
    got.foreach { r =>
      val ty = r.getInt(2); val t = r.getLong(1) / 3600000L
      val tw0 = 600 - 512
      val vs = r.getSeq[Double](4)
      assert(vs.length == tw0 * (if (ty == 2) 8 else 256))
      assert(vs.head == frames(t.toInt)((ty * 256) * w + 512))
    }
    intercept[Exception] { zdf.select("values").collect() }
    // hdf5: full-width row chunks -> clobber the FIRST chunk (frame 0,
    // rows 0-255): any ty>=1 window stays clean, the full read fails
    graft.raster.Hdf5Write.write(s"$dir/s.nc", frames, w, h,
      Bbox(0, 0, 30, 26), Double.MaxValue, "EPSG:4326", times,
      chunkRows = 256)
    val firstChunk = 96L + 8L * (w + h + times.length)
    val raf = new java.io.RandomAccessFile(s"$dir/s.nc", "rw")
    try { raf.seek(firstChunk); raf.write(Array.fill[Byte](4)(0x7F)) }
    finally raf.close()
    val hdf = sp.read.format("graft-raster").load(s"$dir/s.nc")
    val hgot = hdf.filter($"ty" >= 1).collect()
    assert(hgot.length == 2 * 2 * 3)
    hgot.foreach { r =>
      val t = (r.getLong(1) / 3600000L).toInt
      val ty = r.getInt(2); val tx = r.getInt(3)
      assert(r.getSeq[Double](4).head ==
        frames(t)((ty * 256) * w + tx * 256), s"ty=$ty tx=$tx")
    }
    intercept[Exception] { hdf.select("values").collect() }
    // geotiff (tiled): the decoded region is the window, proven by the
    // materialization guard — a full decode of 600x520 trips a limit
    // the 256x264 window read fits under
    graft.raster.GeoTiff.write(s"$dir/s.tif", frames.head, w, h,
      Bbox(0, 0, 30, 26), 4326, -9999.0, tileSize = 256)
    val prev = graft.raster.RequestGuards.rasterLimitPixels
    graft.raster.RequestGuards.rasterLimitPixels = 300L * 300
    try {
      val tdf = sp.read.format("graft-raster").load(s"$dir/s.tif")
      val tgot = tdf.filter($"ty" === 0 && $"tx" === 1).collect()
      assert(tgot.length == 1)
      assert(tgot.head.getSeq[Double](4).head == frames(0)(256))
      intercept[Exception] { tdf.select("values").collect() }
    } finally graft.raster.RequestGuards.rasterLimitPixels = prev
  }

  test("bbox resolution: strict-overlap tiles, edge-touch excluded") {
    import graft.sources.TileWindow
    // 600x520 px grid, cell 1.0, origin (0, 520): world y 0..520
    def f(x0: Double, y0: Double, x1: Double, y1: Double) =
      TileWindow.fromBbox(x0, y0, x1, y1, 0.0, 520.0, 1.0, 600, 520)
    // interior box: cols 100..299 -> tx 0..1; rows 220..419 -> ty 0..1
    assert(f(100, 100, 300, 300) == TileWindow(0, 1, 0, 1))
    // tile-aligned box: cols 256..511 exactly -> tx 1 only (edges touch
    // cols 255/512 with zero area and are excluded)
    assert(f(256, 0, 512, 520) == TileWindow(0, 2, 1, 1))
    // fully outside -> empty
    assert(f(700, 0, 800, 10) == TileWindow.Empty)
    assert(f(0, 600, 10, 700) == TileWindow.Empty)
    // degenerate (zero-area) bbox -> empty
    assert(f(10, 10, 10, 300) == TileWindow.Empty)
    // FLOAT boundaries: with an inexact pitch (0.05), a band file whose
    // extent ENDS at the bbox edge must still resolve empty — 13/0.05
    // floors to 259.99..., which read as a one-row overlap before the
    // epsilon guard
    val g = TileWindow.fromBbox(0, 0, 30, 13, 0.0, 26.0, 0.05, 600, 260)
    assert(g == TileWindow.Empty, g)
    // and a bbox genuinely half a cell past the edge is NOT empty
    assert(TileWindow.fromBbox(0, 0, 30, 13.025, 0.0, 26.0, 0.05,
      600, 260) != TileWindow.Empty)
  }

  test("bbox option prunes non-intersecting band files at planning") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2bb").toString
    val w = 5
    val times = Seq(0L, 3600000L, 7200000L)
    // two latitude bands of one logical 5x4 grid: top = world y [2, 4),
    // bottom = world y [0, 2)
    val top = Seq.tabulate(3)(t => Array.tabulate(w * 2)(i => t * 100.0 + i))
    val bot = Seq.tabulate(3)(t =>
      Array.tabulate(w * 2)(i => t * 100.0 + 10 + i))
    graft.raster.NetCdf.write(s"$dir/top.nc", top, w, 2, Bbox(0, 2, w, 4),
      -9999.0, "EPSG:28992", times)
    graft.raster.NetCdf.write(s"$dir/bot.nc", bot, w, 2, Bbox(0, 0, w, 2),
      -9999.0, "EPSG:28992", times)
    val df = sp.read.format("graft-raster").option("bbox", s"0,0,$w,2")
      .load(dir)
    val qe = df.queryExecution
    val rows = df.collect()
    // only the bottom band's 3 (file, frame) partitions were planned
    assert(df.rdd.getNumPartitions == 3)
    assert(rows.length == 3)
    assert(rows.forall(_.getString(0).endsWith("bot.nc")))
    assert(rows.map(r => r.getLong(1) -> r.getSeq[Double](4)).toMap ==
      times.zip(bot.map(_.toSeq)).toMap)
    // the pushed bbox and the per-dataset resolution show in explain
    val plan = qe.executedPlan.toString
    assert(plan.contains("bbox [0.0, 0.0, 5.0, 2.0]"), plan)
    assert(plan.contains("top.nc -> pruned"), plan)
    assert(plan.contains("bot.nc -> ty [0, 0] tx [0, 0]"), plan)
  }

  test("envelope-column predicates prune files like the bbox option " +
      "and read back the tile's world rectangle") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2env").toString
    val w = 5
    val times = Seq(0L, 3600000L)
    val top = Seq.tabulate(2)(t => Array.tabulate(w * 2)(i => t * 100.0 + i))
    val bot = Seq.tabulate(2)(t =>
      Array.tabulate(w * 2)(i => t * 100.0 + 10 + i))
    graft.raster.NetCdf.write(s"$dir/top.nc", top, w, 2, Bbox(0, 2, w, 4),
      -9999.0, "EPSG:28992", times)
    graft.raster.NetCdf.write(s"$dir/bot.nc", bot, w, 2, Bbox(0, 0, w, 2),
      -9999.0, "EPSG:28992", times)
    // tiles entirely at/below world y=2: exactly the bottom band
    val df = sp.read.format("graft-raster").load(dir)
      .filter(col("y1") <= 2.0)
    val rows = df.collect()
    // the top band plans ZERO partitions (padded window still misses it
    // by more than the one-cell pad? no — the pad keeps the boundary
    // tile, so top.nc stays planned and the residual drops its rows;
    // what IS guaranteed: bot rows only, exact values, and the explain
    // shows the pushed env box)
    assert(rows.forall(_.getString(0).endsWith("bot.nc")))
    assert(rows.length == 2)
    assert(rows.map(r => r.getLong(1) -> r.getSeq[Double](4)).toMap ==
      times.zip(bot.map(_.toSeq)).toMap)
    // virtual columns carry the tile's world rectangle
    val env = rows.head
    assert(env.getDouble(env.fieldIndex("x0")) == 0.0 &&
      env.getDouble(env.fieldIndex("x1")) == 5.0 &&
      env.getDouble(env.fieldIndex("y0")) == 0.0 &&
      env.getDouble(env.fieldIndex("y1")) == 2.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("env filters"), plan)
    // a box clear of the top band by more than one cell DOES prune it
    val pruned = sp.read.format("graft-raster").load(dir)
      .filter(col("y1") <= 0.5 && col("x1") >= 0.0)
    assert(pruned.rdd.getNumPartitions == 2) // bot only
    assert(pruned.queryExecution.executedPlan.toString
      .contains("top.nc -> pruned"))
  }

  test("streaming read: a dataset landing mid-stream emits its frames " +
      "exactly once") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2_stream").toString
    val w = 4; val h = 2
    def land(name: String, base: Double): Unit =
      graft.raster.Grib.write(s"$dir/$name", Seq.tabulate(2)(t =>
        Array.tabulate(w * h)(i => base + t * 100.0 + i)), w, h,
        Double.MaxValue, Seq(0L, 3600000L), 0.0, 0.0, 0.05)
    land("a.grib2", 0.0)
    val q = sp.readStream.format("graft-raster")
      .schema(graft.sources.GraftRasterTable.schema).load(dir)
      .select(col("path"), col("t"), col("values"))
      .writeStream.outputMode("append").format("memory")
      .queryName("raster_stream_test").start()
    try {
      q.processAllAvailable()
      val first = sp.table("raster_stream_test").collect()
      assert(first.length == 2 && first.forall(_.getString(0).endsWith("a.grib2")))
      land("b.grib2", 1000.0)
      q.processAllAvailable()
      val all = sp.table("raster_stream_test").collect()
      assert(all.length == 4, all.length)
      assert(all.count(_.getString(0).endsWith("a.grib2")) == 2 &&
        all.count(_.getString(0).endsWith("b.grib2")) == 2)
      // values decode identically to the batch read
      val bVals = all.filter(r => r.getString(0).endsWith("b.grib2") &&
        r.getLong(1) == 0L).head.getSeq[Double](2)
      assert(bVals == Seq.tabulate(w * h)(i => 1000.0 + i))
    } finally q.stop()
    // offset JSON round-trip
    val off = graft.sources.GraftRasterOffset(Set(s"$dir/a.grib2"))
    assert(graft.sources.GraftRasterOffset.fromJson(off.json()) == off)
  }

  test("streaming replay plans from the OFFSET's path set: a dataset " +
      "deleted after commit fails loudly, never silently drops") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2_replay").toString
    val w = 4; val h = 2
    def land(name: String): Unit =
      graft.raster.Grib.write(s"$dir/$name", Seq.tabulate(2)(t =>
        Array.tabulate(w * h)(i => t * 100.0 + i)), w, h,
        Double.MaxValue, Seq(0L, 3600000L), 0.0, 0.0, 0.05)
    land("a.grib2"); land("b.grib2")
    val df = sp.read.format("graft-raster").load(dir)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.get
    val mbs = scan.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsReportStatistics] // just to prove it's our scan
    assert(mbs != null)
    val stream = scan.toMicroBatchStream(
      Files.createTempDirectory("ck").toString)
    val s0 = graft.sources.GraftRasterOffset(Set(s"$dir/a.grib2"))
    val s1 = graft.sources.GraftRasterOffset(
      Set(s"$dir/a.grib2", s"$dir/b.grib2"))
    // normal replay: exactly b's frames, planned from the offset diff
    val parts = stream.asInstanceOf[graft.sources.GraftRasterMicroBatchStream]
      .planInputPartitions(s0, s1)
    assert(parts.length == 2, parts.length) // two frames of b.grib2
    // b vanishes after the offset was recorded: the batch MUST fail
    // loudly (exact-replay contract), not plan around the hole
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/b.grib2"))
    val ex = intercept[Exception] {
      stream.asInstanceOf[graft.sources.GraftRasterMicroBatchStream]
        .planInputPartitions(s0, s1)
    }
    assert(ex.getMessage.contains("no longer exists"), ex.getMessage)
  }

  test("end-to-end streaming pipeline: raster watcher -> streaming Zarr " +
      "write, each epoch extends the time axis") {
    val sp = spark
    val src = Files.createTempDirectory("graft_rs_src").toString
    val dst = Files.createTempDirectory("graft_rs_dst").toString + "/out.zarr"
    val ckpt = Files.createTempDirectory("graft_rs_ck").toString
    val w = 4; val h = 2
    def land(name: String, t0: Int): Unit =
      graft.raster.NetCdf.write(s"$src/$name",
        Seq.tabulate(2)(k => Array.tabulate(w * h)(i => (t0 + k) * 100.0 + i)),
        w, h, Bbox(0, 0, w, h), -9999.0, "EPSG:28992",
        Seq.tabulate(2)(k => (t0 + k) * 3600000L))
    land("a.nc", 0)
    val q = sp.readStream.format("graft-raster")
      .schema(graft.sources.GraftRasterTable.schema).load(src)
      .select("path", "t", "ty", "tx", "values")
      .writeStream.outputMode("append").format("graft-raster")
      .option("width", w.toString).option("height", h.toString)
      .option("x0", "0").option("y0", "0").option("cell", "1")
      .option("projection", "EPSG:28992").option("nodata", "-9999.0")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q.processAllAvailable()
      // first epoch: 2 frames readable through the batch connector
      val r1 = sp.read.format("graft-raster").load(dst)
        .select("t", "values").collect()
      assert(r1.length == 2)
      land("b.nc", 2)
      q.processAllAvailable()
    } finally q.stop()
    val r2 = sp.read.format("graft-raster").load(dst)
      .select("t", "values").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(r2.size == 4, r2.keys.toSeq.sorted.mkString(","))
    for (k <- 0 until 4)
      assert(r2(k * 3600000L) ==
        Seq.tabulate(w * h)(i => k * 100.0 + i), s"frame $k")
  }

  test("complete aggregate pushdown: count/min(t)/max(t) from planning " +
      "metadata, zero data bytes") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2agg").toString
    // corrupt every data chunk: any data read fails loudly, so a green
    // aggregate PROVES it was answered from planning metadata
    for (i <- 0 until 3) {
      Zarr.write(s"$dir/s$i.zarr", Seq.tabulate(2)(t =>
        Array.fill(4)(i * 10.0 + t)), 2, 2,
        Bbox(0, 0, 2, 2), -9.0, "EPSG:28992",
        Seq(i * 3600000L, (i + 1) * 3600000L), zarrVersion = 3)
      for (t <- 0 until 2)
        Files.write(Paths.get(s"$dir/s$i.zarr/band1/c/$t/0/0"),
          Array.fill[Byte](16)(0x5A))
    }
    val df = sp.read.format("graft-raster").load(dir)
    val agg = df.agg(count(lit(1)).as("n"), min("t").as("lo"),
      max("t").as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("complete agg"), plan)
    val r = agg.collect()(0)
    assert(r.getLong(0) == 6 && r.getLong(1) == 0L &&
      r.getLong(2) == 3L * 3600000L, r.toString)
    // count() alone takes the same path
    assert(df.count() == 6)
    // a temporal filter composes: the pushed range shrinks the answer
    // (stores overlap in time: frames at >= 1h are s0's 1h, s1's 1h+2h,
    // s2's 2h+3h)
    val f = df.filter(col("t") >= 3600000L)
    assert(f.count() == 5)
    assert(f.agg(min("t")).collect()(0).getLong(0) == 3600000L)
    // grouped aggregates are NOT pushed (fall back to the row scan,
    // which here fails loudly on the corrupt chunks only if it needs
    // values — a group by path count still runs on metadata rows)
    val grouped = df.groupBy("path").count().collect()
    assert(grouped.length == 3 && grouped.forall(_.getLong(1) == 2))
  }

  test("a static t IN list prunes to exact instants at planning") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2in").toString
    writeGrib(s"$dir/s.grib2",
      Seq.tabulate(8)(t => Array.fill(4)(t.toDouble)), 2, 2)
    val df = sp.read.format("graft-raster").load(s"$dir/s.grib2")
      .filter(col("t").isin(0L, 2 * 3600000L, 5 * 3600000L))
    // exact instants, not the [0, 5h] range clamp (6 frames)
    assert(df.rdd.getNumPartitions == 3,
      df.queryExecution.executedPlan.toString)
    assert(df.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 0.0 + 2.0 + 5.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("t in {0,7200000,18000000}"), plan)
  }

  test("runtime filtering on path and t prunes (file, frame) partitions") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2rt").toString
    for (n <- Seq("a", "b"))
      graft.raster.Grib.write(s"$dir/$n.grib2", Seq.tabulate(3)(t =>
        Array.fill(4)(t.toDouble)), 2, 2, Double.MaxValue,
        (0 until 3).map(_ * 3600000L), 0.0, 0.0, 0.05)
    val df = sp.read.format("graft-raster").load(dir)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.get.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(scan.filterAttributes().map(_.describe()).toSeq ==
      Seq("path", "t"))
    val batch = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
    assert(batch.planInputPartitions().length == 6) // 2 files x 3 frames
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("path", Array(s"$dir/a.grib2")),
      org.apache.spark.sql.sources.In("t",
        Array(java.lang.Long.valueOf(3600000L)))))
    val kept = batch.planInputPartitions()
    assert(kept.length == 1)
    val p = kept.head.asInstanceOf[graft.sources.GraftFramePartition]
    assert(p.path.endsWith("a.grib2") && p.tMs == 3600000L)
  }

  test("bbox window composes with the tile iteration on a tiled grid") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_dsv2bw").toString
    val w = 600; val h = 520 // 3x3 tiles, world (0,0)-(30,26), cell 0.05
    val frames = Seq.tabulate(2)(t =>
      Array.tabulate(w * h)(i => ((t * 3 + i) % 500).toDouble))
    writeGrib(s"$dir/s.grib2", frames, w, h)
    val base = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    val want = base.filter($"tx" === 2).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)) ->
        r.getSeq[Double](4)).toMap
    // GRIB written with degPerCell 0.05 at origin (0,0)-(30,26): a bbox
    // strictly inside tile column 2 (world x > 512*0.05 = 25.6)
    val got = sp.read.format("graft-raster")
      .option("bbox", "25.65,0,29.0,26.0").load(s"$dir/s.grib2")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3)) ->
        r.getSeq[Double](4)).toMap
    assert(got.keySet == want.keySet) // 2 frames x 3 ty x tx=2
    assert(got == want)
  }

  test("DSv2 write path: tile frames -> one shard per frame, " +
      "read-back exact, driver writes only metadata") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_dsv2w").toString
    val w = 600; val h = 520 // 3x3 tiles per frame
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => ((t * 11 + i) % 997).toDouble))
    writeGrib(s"$dir/s.grib2", frames, w, h)
    val src = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    val out = s"$dir/out.zarr"
    src.write.format("graft-raster").mode("append")
      .option("width", w.toString).option("height", h.toString)
      .option("x0", "0").option("y0", "0").option("cell", "0.05")
      .option("projection", "EPSG:4326").option("chunk", "256")
      .save(out)
    // the store IS a sharded v3 store: one shard object per frame,
    // sharding_indexed metadata, no other data objects
    val meta = Files.readString(Paths.get(s"$out/band1/zarr.json"))
    assert(meta.contains("sharding_indexed") && meta.contains("crc32c"),
      meta)
    for (t <- 0 until 3)
      assert(Files.exists(Paths.get(s"$out/band1/c/$t/0/0")), s"shard $t")
    // read-back through the connector: byte-exact tile frames
    val back = sp.read.format("graft-raster").load(out)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(1), r.getInt(2), r.getInt(3))
    val want = src.collect().map(r => key(r) -> r.getSeq[Double](4)).toMap
    val got = back.collect().map(r => key(r) -> r.getSeq[Double](4)).toMap
    assert(got == want)
    // and the AOI path over the written store still prunes + matches
    val aoi = back.filter($"ty" === 1 && $"tx" === 2).collect()
    assert(aoi.length == 3)
    aoi.foreach(r => assert(r.getSeq[Double](4) == want(key(r))))
  }

  test("DSv2 write path failure modes: missing options, bad tile, " +
      "off-grid time are loud") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_dsv2wf").toString
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val tiles = Seq((0L, 0, 0, Seq.fill(4)(1.0)))
      .toDF("t", "ty", "tx", "values")
      .withColumn("path", org.apache.spark.sql.functions.lit("x"))
      .select("path", "t", "ty", "tx", "values")
    val e1 = intercept[Exception] {
      tiles.write.format("graft-raster").mode("append")
        .option("width", "2").save(s"$dir/a.zarr")
    }
    assert(msgs(e1).exists(_.contains("missing required option")),
      e1.getMessage)
    def opts(df: org.apache.spark.sql.DataFrame) =
      df.write.format("graft-raster").mode("append")
        .option("width", "2").option("height", "2").option("x0", "0")
        .option("y0", "0").option("cell", "1")
        .option("projection", "EPSG:28992")
    val e2 = intercept[Exception] { // wrong tile size for a 2x2 grid
      opts(Seq((0L, 0, 0, Seq.fill(9)(1.0)))
        .toDF("t", "ty", "tx", "values")
        .withColumn("path", org.apache.spark.sql.functions.lit("x"))
        .select("path", "t", "ty", "tx", "values")).save(s"$dir/b.zarr")
    }
    assert(msgs(e2).exists(_.contains("holds 9 values")), e2.getMessage)
    val e3 = intercept[Exception] { // t off the time grid
      opts(Seq((1234L, 0, 0, Seq.fill(4)(1.0)))
        .toDF("t", "ty", "tx", "values")
        .withColumn("path", org.apache.spark.sql.functions.lit("x"))
        .select("path", "t", "ty", "tx", "values")).save(s"$dir/c.zarr")
    }
    assert(msgs(e3).exists(_.contains("time_first")), e3.getMessage)
    // a minimal valid frame round-trips (2x2 grid = one tile)
    opts(Seq((0L, 0, 0, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("t", "ty", "tx", "values")
      .withColumn("path", org.apache.spark.sql.functions.lit("x"))
      .select("path", "t", "ty", "tx", "values")).save(s"$dir/d.zarr")
    val back = sp.read.format("graft-raster").load(s"$dir/d.zarr")
      .collect()
    assert(back.length == 1 &&
      back(0).getSeq[Double](4) == Seq(1.0, 2.0, 3.0, 4.0))
    // and a file:// target writes shard objects AND metadata through
    // the Hadoop-capable I/O layer
    opts(Seq((0L, 0, 0, Seq(5.0, 6.0, 7.0, 8.0)))
      .toDF("t", "ty", "tx", "values")
      .withColumn("path", org.apache.spark.sql.functions.lit("x"))
      .select("path", "t", "ty", "tx", "values"))
      .save(s"file://$dir/e.zarr")
    val backE = sp.read.format("graft-raster").load(s"$dir/e.zarr")
      .collect()
    assert(backE.length == 1 &&
      backE(0).getSeq[Double](4) == Seq(5.0, 6.0, 7.0, 8.0))
  }

  test("unknown layouts fail loudly by name") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2f").toString
    Files.writeString(Paths.get(s"$dir/x.bin"), "not a raster")
    val e = intercept[Exception] {
      sp.read.format("graft-raster").load(s"$dir/x.bin").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("graft-raster")), e.getMessage)
    val e2 = intercept[Exception] {
      sp.read.format("graft-raster")
        .load(Files.createTempDirectory("graft_dsv2e").toString).collect()
    }
    assert(msgs(e2).exists(_.contains("no GRIB files, GeoTIFFs,")))
  }
}
