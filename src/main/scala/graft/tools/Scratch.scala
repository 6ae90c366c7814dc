package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.raster._

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Round-8
  * continuation focus: the bigram-LM perplexity scorer and SemDeDup over
  * the real sf0.001 tables.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")

    // ---- bigram-LM perplexity: corpus-trained CCNet-style filter stage
    val ppl = graft.pipeline.Lm.bigramPerplexity(docs, "doc_id", "text")
    val stats = ppl.agg(
      org.apache.spark.sql.functions.count(col("doc_id")),
      org.apache.spark.sql.functions.min(col("avg_nll_micro")),
      org.apache.spark.sql.functions.max(col("avg_nll_micro"))).head
    println(s"perplexity: docs=${stats.getLong(0)} " +
      s"avg_nll_micro=[${stats.getLong(1)}, ${stats.getLong(2)}]")

    // ---- SemDeDup: brute (k=1) vs clustered (k=8) keep decisions
    val brute = graft.pipeline.Dedup
      .semDeDup(embs, "vec_id", "embedding", 0.35, 1)
    val clustered = graft.pipeline.Dedup
      .semDeDup(embs, "vec_id", "embedding", 0.35, 8)
    val bk = brute.filter(col("kept")).count()
    val ck = clustered.filter(col("kept")).count()
    println(s"semdedup: n=${brute.count()} kept_brute=$bk kept_k8=$ck " +
      s"(clustered keeps >= brute: ${ck >= bk})")

    // ---- NetCDF quick re-check (stays from the codec landings)
    val dir = java.nio.file.Files.createTempDirectory("scratch_r8c").toString
    val mem = MemorySource(
      data = Seq(Array.tabulate(64)(_ * 1.0), Array.tabulate(64)(_ * 2.0)),
      gridW = 8, gridH = 8, noDataIn = 255, projection = "EPSG:28992",
      pixelSize = 0.5, originX = 135000, originY = 456000,
      timeFirstMs = 0L, frameDeltaMs = Some(3600000L), dtypeName = "float64")
    val req = RasterRequest(Bbox(135000, 455996, 135004, 456000),
      "EPSG:28992", 8, 8, Some(java.time.Instant.ofEpochMilli(0)),
      Some(java.time.Instant.ofEpochMilli(3600000L)))
    NetCdfSink(mem, s"$dir/stack.nc").write(req)
    val nc = RasterFileSource(s"$dir/stack.nc")
    println(s"netcdf: proj=${nc.projection} times=${nc.allTimes.size} " +
      s"cell=${nc.cellSize.get} rows=${nc.frame(req).count()}")

    // ---- composed pipeline: clean + perplexity gate (p39's flow)
    val kept = graft.pipeline.CorpusClean
      .run(docs, 0.3, Seq("de", "en", "es", "fr", "zh"))
      .join(graft.pipeline.Lm.bigramPerplexity(docs, "doc_id", "text")
        .select(col("doc_id"), col("avg_nll_micro")), "doc_id")
      .filter(col("avg_nll_micro") <= 3400000L)
    println(s"clean+lm: kept=${kept.count()} of ${docs.count()}")

    // ---- trigram LM and spatial join
    val tri = graft.pipeline.Lm.trigramPerplexity(docs, "doc_id", "text")
    println(s"trigram-lm: docs=${tri.count()}")

    // ---- GeoPackage tile pyramid through the raster dispatch
    val dir0 = java.nio.file.Files.createTempDirectory("scratch_gt").toString
    val mem0 = MemorySource(Seq(Array.tabulate(64)(_ * 3.0)), 8, 8, 65535,
      "EPSG:28992", 0.5, 135000, 456000, dtypeName = "uint16")
    val req0 = RasterRequest(Bbox(135000, 455996, 135004, 456000),
      "EPSG:28992", 8, 8, None, None)
    GpkgRasterSink(mem0, s"$dir0/t.gpkg", tileSize = 5).write(req0)
    val gt = RasterFileSource(s"$dir0/t.gpkg")
    println(s"gpkg-tiles: kind=${gt.getClass.getSimpleName} " +
      s"cell=${gt.cellSize.get} rows=${gt.frame(req0).count()}")

    // ---- NetCDF-4 (HDF5) and Zarr v2 through the same dispatch surface
    Hdf5Sink(mem, s"$dir/stack4.nc", chunkRows = 3).write(req)
    val h5 = RasterFileSource(s"$dir/stack4.nc")
    println(s"hdf5: kind=${h5.getClass.getSimpleName} proj=${h5.projection} " +
      s"times=${h5.allTimes.size} rows=${h5.frame(req).count()}")
    ZarrSink(mem, s"$dir/stack.zarr", chunkH = 3, chunkW = 3).write(req)
    val zr = RasterFileSource(s"$dir/stack.zarr")
    println(s"zarr: kind=${zr.getClass.getSimpleName} proj=${zr.projection} " +
      s"times=${zr.allTimes.size} rows=${zr.frame(req).count()}")

    // ---- round 12: HDF5 1.10 Extensible Array / v2 B-tree chunk
    // indexes, end-to-end through the public source + DSv2 connector
    val dirIdx = java.nio.file.Files.createTempDirectory("scratch_idx").toString
    val bands3 = Seq(Array.tabulate(64)(_ * 1.0),
      Array.tabulate(64)(_ * 2.0), Array.tabulate(64)(i => (i % 7).toDouble))
    for (ci <- Seq("btree1", "farray", "earray", "btree2")) {
      val p = s"$dirIdx/$ci.nc"
      Hdf5Write.write(p, bands3, 8, 8, Bbox(135000, 455996, 135004, 456000),
        255, "EPSG:28992", Seq(0L, 3600000L, 7200000L), "float64",
        chunkRows = 1, chunkIndex = ci,
        eaIdxBlkElmts = 1, eaMinElmts = 2, eaSupMinPtrs = 2, eaPageBits = 2)
      val src = Hdf5Source(p)
      val res = src.getData(req.copy(stop = Some(
        java.time.Instant.ofEpochMilli(7200000L)))).get
      val sums = res.values.map(_.sum).mkString(",")
      val df = spark.read.format("graft-raster").load(p)
        .filter(col("t") === 3600000L)
        .select(org.apache.spark.sql.functions.explode(col("values"))
          .as("value"))
        .agg(org.apache.spark.sql.functions.sum(col("value")))
      println(s"h5-index[$ci]: frames=${res.values.length} sums=[$sums] " +
        s"dsv2_t1_sum=${df.head.getDouble(0)}")
    }

    spark.stop()
  }
}
