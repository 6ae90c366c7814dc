package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geometry._

class FlatGeobufSpec extends SparkSpec {

  private def tmpFgb(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"fgb_$tag").resolve(s"$tag.fgb").toString

  test("magic, header and index round-trip the fixture features") {
    val out = tmpFgb("basic")
    FlatGeobufSink.writeStream(
      GeometryFixtures.features.frame(GeometryRequest()), "EPSG:28992", out)
    val head = {
      val in = new java.io.FileInputStream(out)
      try in.readNBytes(8) finally in.close()
    }
    assert(head(0) == 'f' && head(1) == 'g' && head(2) == 'b' && head(3) == 3)
    val src = FlatGeobufSource(out)
    assert(src.projection == "EPSG:28992")
    assert(src.columns.contains("value") && src.columns.contains("name"))
    val df = src.frame(GeometryRequest()).cache()
    assert(df.count() == 3)
    val r2 = df.filter(col("fid") === 2).head()
    assert(r2.getAs[Double]("value") == 7.5)
    assert(r2.getAs[String]("name") == "b")
    assert(GeomFunctions.readWkb(r2.getAs[Array[Byte]]("geometry")).equalsExact(
      GeomFunctions.readWkt(GeometryFixtures.square(135001, 455998, 135003, 456000))))
    df.unpersist()
  }

  /** Every geometry family the codec claims, plus nulls and typed attrs. */
  private case class MixedSource() extends GeometryBlock {
    override def columns: Set[String] = Set("geometry", "n", "f", "flag", "note")
    override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
      import spark.implicits._
      Seq(
        (1L, "POINT (1 2)", Some(7L), Some(1.25), Some(true), Some("""a<b>&"c' €""")),
        (2L, "LINESTRING (0 0, 3 4, 5 5)", Some(-3L), None, Some(false), None),
        (3L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))", None, Some(2.5e-3), None, Some("plain")),
        (4L, "MULTIPOINT ((1 1), (2 2))", Some(0L), Some(0.0), Some(true), Some("mp")),
        (5L, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))", Some(9L), None, None, None),
        (6L, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 5.5 6, 6 6, 6 5.5, 5.5 5.5)))", Some(1L), Some(6.75), Some(false), Some("mpoly")),
        (7L, null.asInstanceOf[String], Some(8L), Some(8.0), Some(true), Some("nogeom"))
      ).toDF("fid", "wkt", "n", "f", "flag", "note")
        .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
          col("n"), col("f"), col("flag"), col("note"))
    }
  }

  test("all geometry families, nulls, and typed attrs round-trip exactly") {
    val out = tmpFgb("mixed")
    val sp = spark
    FlatGeobufSink.writeStream(MixedSource().frame(GeometryRequest())(sp), "EPSG:28992", out)(sp)
    val back = FlatGeobufSource(out).frame(GeometryRequest())(sp)
      .orderBy("fid").collect()
    assert(back.length == 7)
    val wkts = Seq(
      "POINT (1 2)",
      "LINESTRING (0 0, 3 4, 5 5)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 5.5 6, 6 6, 6 5.5, 5.5 5.5)))")
    wkts.zipWithIndex.foreach { case (w, i) =>
      val g = GeomFunctions.readWkb(back(i).getAs[Array[Byte]]("geometry"))
      assert(g.equalsExact(GeomFunctions.readWkt(w)), s"fid ${i + 1}")
    }
    assert(back(6).isNullAt(back(6).fieldIndex("geometry")))
    assert(back(0).getAs[Long]("n") == 7L)
    assert(back(0).getAs[Double]("f") == 1.25)
    assert(back(0).getAs[Boolean]("flag"))
    assert(back(0).getAs[String]("note") == """a<b>&"c' €""")
    assert(back(1).isNullAt(back(1).fieldIndex("f")))
    assert(back(2).isNullAt(back(2).fieldIndex("n")))
  }

  test("bbox requests prune through the Hilbert R-tree and match a full scan") {
    val sp = spark
    import sp.implicits._
    // 50×40 grid of unit squares, ids row-major — enough for a 3-level tree
    val rows = (0 until 2000).map { i =>
      (i.toLong, GeometryFixtures.square(i % 50 * 2, i / 50 * 2, i % 50 * 2 + 1, i / 50 * 2 + 1), i * 0.5)
    }
    val out = tmpFgb("grid")
    FlatGeobufSink.writeStream(
      SeqGeometrySource(rows.map(r => (r._1, r._2, r._3, "x" + r._1)))
        .frame(GeometryRequest())(sp), "EPSG:28992", out)(sp)
    val src = FlatGeobufSource(out)
    assert(src.frame(GeometryRequest())(sp).count() == 2000)
    val box = GeometryFixtures.square(10.5, 8.5, 20.5, 16.5)
    val boxed = src.frame(GeometryRequest(geometryWkt = Some(box)))(sp)
    val expect = src.frame(GeometryRequest())(sp)
      .filter(GeomFunctions.stFilter(col("geometry"), lit(box), lit("intersects")))
    assert(boxed.count() == expect.count())
    assert(boxed.select(sum("value")).head().getDouble(0) ==
      expect.select(sum("value")).head().getDouble(0))
    // filters + limit compose
    assert(src.frame(GeometryRequest(filters = Map("name" -> "x77")))(sp)
      .select("fid").collect().map(_.getLong(0)).toSeq == Seq(77L))
    assert(src.frame(GeometryRequest(limit = Some(5)))(sp).count() == 5)
  }

  test("GeometryFileSource dispatches .fgb; to_file writes it; serde round-trips") {
    val out = tmpFgb("dispatch")
    GeometryToFile.toFile(GeometryFixtures.features, out)
    val view = GeometryFileSource(out)
    assert(view.projection == "EPSG:28992")
    assert(view.frame(GeometryRequest()).count() == 3)
    val back = graft.core.BlockRegistry.fromJson(view.toJson)
    assert(back.token == view.token)
    assert(back.asInstanceOf[GeometryBlock].frame(GeometryRequest()).count() == 3)
  }

  test("an unindexed foreign file (index_node_size=0) reads via the size-prefix walk") {
    import FlatGeobuf._
    // hand-build a spec-legal file with NO spatial index, as foreign
    // writers may produce: magic, header with index_node_size=0, features
    val hb = new Buf
    hb.u32(0)
    val ht = writeTable(hb, Seq[Option[Slot]](
      Some(stringRef("plain")), None, Some(U8S(GtPoint)),
      None, None, None, None,
      Some(tableVecRef(Seq(
        (bb: Buf) => writeTable(bb, Seq[Option[Slot]](
          Some(stringRef("tag")), Some(U8S(CtString))))))),
      Some(U64S(2L)), Some(U16S(0)), // features_count=2, index_node_size=0
      None))
    hb.patchU32(0, ht.toLong)
    val headerBody = hb.result()
    val feats = Seq(("POINT (1 2)", "a"), ("POINT (3 4)", "b")).map { case (wkt, tag) =>
      val fb = new Buf
      fb.u32(0)
      val g = GeomFunctions.readWkt(wkt)
      val props = encodeProperties(Seq((0, CtString, tag)))
      val t = writeTable(fb, Seq[Option[Slot]](
        Some(RefS(geometryWriter(g))), Some(byteVecRef(props)), None))
      fb.patchU32(0, t.toLong)
      fb.result()
    }
    val out = java.nio.file.Files.createTempDirectory("fgb_noindex")
      .resolve("plain.fgb")
    val os = new java.io.FileOutputStream(out.toFile)
    try {
      os.write(Magic)
      os.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(headerBody.length).array())
      os.write(headerBody)
      feats.foreach { f =>
        os.write(java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(f.length).array())
        os.write(f)
      }
    } finally os.close()
    val df = FlatGeobufSource(out.toString).frame(GeometryRequest())
      .orderBy("fid").collect()
    assert(df.length == 2)
    assert(df.map(_.getAs[String]("tag")).toSeq == Seq("a", "b"))
    assert(GeomFunctions.readWkb(df(1).getAs[Array[Byte]]("geometry")).equalsExact(
      GeomFunctions.readWkt("POINT (3 4)")))
  }

  /** Hand-build an unindexed foreign file with the given columns and
    * per-feature property bytes (spec-legal: magic, header with
    * index_node_size=0, size-prefixed features). */
  private def writeForeign(tag: String, cols: Seq[(String, Int)],
      feats: Seq[(String, Array[Byte])]): String = {
    import FlatGeobuf._
    val hb = new Buf
    hb.u32(0)
    val ht = writeTable(hb, Seq[Option[Slot]](
      Some(stringRef(tag)), None, Some(U8S(GtPoint)),
      None, None, None, None,
      Some(tableVecRef(cols.map { case (n, ct) =>
        (bb: Buf) => writeTable(bb, Seq[Option[Slot]](
          Some(stringRef(n)), Some(U8S(ct))))
      })),
      Some(U64S(feats.length.toLong)), Some(U16S(0)),
      None))
    hb.patchU32(0, ht.toLong)
    val headerBody = hb.result()
    val out = java.nio.file.Files.createTempDirectory(s"fgb_$tag")
      .resolve(s"$tag.fgb")
    val os = new java.io.FileOutputStream(out.toFile)
    try {
      os.write(Magic)
      os.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(headerBody.length).array())
      os.write(headerBody)
      feats.foreach { case (wkt, props) =>
        val fb = new Buf
        fb.u32(0)
        val g = GeomFunctions.readWkt(wkt)
        val t = writeTable(fb, Seq[Option[Slot]](
          Some(RefS(geometryWriter(g))), Some(byteVecRef(props)), None))
        fb.patchU32(0, t.toLong)
        val f = fb.result()
        os.write(java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(f.length).array())
        os.write(f)
      }
    } finally os.close()
    out.toString
  }

  test("foreign fixed-width scalar columns decode at spec widths") {
    import FlatGeobuf._
    // an OGR-style file: Int fid + Float + Short + UByte + String — the
    // String after the scalars proves the property stream stays aligned
    val cols = Seq(("fid", CtInt), ("f32", CtFloat), ("s16", CtShort),
      ("u8", CtUByte), ("note", CtString))
    def props(fid: Int, f: Float, s: Short, u: Int, note: String): Array[Byte] = {
      val b = new Buf
      b.u16(0); b.u32(fid.toLong & 0xffffffffL)
      b.u16(1); b.u32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
      b.u16(2); b.u16(s & 0xffff)
      b.u16(3); b.u8(u)
      val utf = note.getBytes("UTF-8")
      b.u16(4); b.u32(utf.length.toLong); b.bytes(utf)
      b.result()
    }
    val path = writeForeign("scalars", cols, Seq(
      ("POINT (1 2)", props(101, 2.5f, -7, 200, "alpha")),
      ("POINT (3 4)", props(102, -0.125f, 300, 15, "beta"))))
    val df = FlatGeobufSource(path).frame(GeometryRequest())
      .orderBy("fid").collect()
    assert(df.length == 2)
    // the Int-typed fid column is adopted as the fid
    assert(df.map(_.getLong(0)).toSeq == Seq(101L, 102L))
    assert(df(0).getAs[Float]("f32") == 2.5f)
    assert(df(1).getAs[Float]("f32") == -0.125f)
    assert(df(0).getAs[Short]("s16") == (-7).toShort)
    assert(df(1).getAs[Short]("s16") == 300.toShort)
    assert(df(0).getAs[Short]("u8") == 200.toShort) // uint8 widens to int16
    assert(df(0).getAs[String]("note") == "alpha")
    assert(df(1).getAs[String]("note") == "beta")
  }

  test("a non-integral fid column is renamed, not duplicated") {
    import FlatGeobuf._
    val cols = Seq(("fid", CtDouble), ("name", CtString))
    def props(v: Double, name: String): Array[Byte] = {
      val b = new Buf
      b.u16(0); b.f64(v)
      val utf = name.getBytes("UTF-8")
      b.u16(1); b.u32(utf.length.toLong); b.bytes(utf)
      b.result()
    }
    val path = writeForeign("dblfid", cols, Seq(
      ("POINT (1 2)", props(0.5, "a")), ("POINT (3 4)", props(1.5, "b"))))
    val src = FlatGeobufSource(path)
    assert(src.columns.contains("fid_attr"))
    val df = src.frame(GeometryRequest())
    assert(df.schema.fieldNames.count(_ == "fid") == 1)
    val rows = df.orderBy("fid").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L)) // synthesized fids
    assert(rows.map(_.getAs[Double]("fid_attr")).toSeq == Seq(0.5, 1.5))
    // col("fid") filters resolve unambiguously
    assert(df.filter(col("fid") === 1L).count() == 1)
  }

  test("the spilled index build is byte-identical to the in-memory build") {
    import FlatGeobuf._
    // counts straddling node-size boundaries and level transitions
    for (n <- Seq(1, 2, 15, 16, 17, 255, 256, 257, 4096, 5000)) {
      val items = Array.tabulate(n)(i =>
        Node(i * 1.0, i * 2.0, i * 1.0 + 1, i * 2.0 + 1, i * 100L))
      val mem = buildIndex(items, NodeSize)
      val leaf = java.nio.file.Files.createTempFile("fgb_leaf", ".bin")
      val os = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(leaf))
      items.foreach(nd =>
        writeNodeRecord(os, nd.minX, nd.minY, nd.maxX, nd.maxY, nd.offset))
      os.close()
      val bos = new java.io.ByteArrayOutputStream()
      buildIndexSpilled(leaf, n, NodeSize, bos)
      assert(java.util.Arrays.equals(mem, bos.toByteArray), s"n=$n")
      java.nio.file.Files.deleteIfExists(leaf)
    }
  }

  test("non-fgb and truncated files fail with clear errors, not hangs") {
    val dir = java.nio.file.Files.createTempDirectory("fgb_bad")
    val notFgb = dir.resolve("x.fgb")
    java.nio.file.Files.write(notFgb, "PK definitely a zip".getBytes)
    val e = intercept[IllegalArgumentException](
      FlatGeobufSource(notFgb.toString).frame(GeometryRequest()))
    assert(e.getMessage.contains("FlatGeobuf"))
    val truncated = dir.resolve("t.fgb")
    java.nio.file.Files.write(truncated, FlatGeobuf.Magic ++ Array[Byte](0x10, 0, 0, 0))
    intercept[Exception](FlatGeobufSource(truncated.toString).frame(GeometryRequest()))
  }

  test("a 5k-feature file reads back distributed and complete") {
    val sp = spark
    val rows = (1 to 5000).map { i =>
      (i.toLong, GeometryFixtures.square(i % 100, i / 100, i % 100 + 1, i / 100 + 1), i * 0.5, "n" + i)
    }
    val out = tmpFgb("big")
    FlatGeobufSink.writeStream(SeqGeometrySource(rows).frame(GeometryRequest())(sp),
      "EPSG:28992", out)(sp)
    val df = FlatGeobufSource(out).frame(GeometryRequest())(sp)
    assert(df.count() == 5000)
    assert(df.select(sum("value")).head().getDouble(0) == (1 to 5000).map(_ * 0.5).sum)
    val r4999 = df.filter(col("fid") === 4999).head()
    assert(GeomFunctions.readWkb(r4999.getAs[Array[Byte]]("geometry")).equalsExact(
      GeomFunctions.readWkt(GeometryFixtures.square(4999 % 100, 49, 4999 % 100 + 1, 50))))
  }

  test("readRuns coalesces contiguous features into few ranged reads") {
    val data = Array.tabulate[Byte](1000)(i => (i * 7).toByte)
    final class Mem extends graft.io.PositionedReader {
      var calls = 0
      override def size(): Long = data.length
      override def read(dst: java.nio.ByteBuffer, position: Long): Int = {
        calls += 1
        if (position >= data.length) return -1
        val n = math.min(dst.remaining(), data.length - position.toInt)
        dst.put(data, position.toInt, n); n
      }
      override def close(): Unit = ()
    }
    // 10 contiguous features of 20 B at 100, then a gap, then 3 at 700
    val offs = Array.tabulate(10)(k => 100L + 20 * k) ++
      Array.tabulate(3)(k => 700L + 20 * k)
    val lens = Array.fill(13)(20)
    val r = new Mem
    val out = FgbMeta.readRuns(r, offs, lens).toSeq
    assert(out.length == 13)
    // 13 features, 2 contiguous runs -> 2 reads, not 13
    assert(r.calls == 2, s"${r.calls} reads")
    out.foreach { case (k, b) =>
      assert(b.toSeq == data.slice(offs(k).toInt, offs(k).toInt + 20).toSeq, s"feature $k")
    }
    // a run larger than maxRun splits
    val r2 = new Mem
    val big = FgbMeta.readRuns(r2, offs.take(10), lens.take(10), maxRun = 50).toSeq
    assert(big.length == 10 && r2.calls == 5) // 2 features of 20 B per 50 B run
  }

  test("positioned R-tree walk = in-memory search, touching only the " +
      "visited path's bytes") {
    val sp = spark
    import sp.implicits._
    val out = tmpFgb("idxwalk")
    // 1200 unit squares on a 40-column grid -> a 4-level packed tree
    val df = (0 until 1200).map { i =>
      val x = (i % 40) * 2.0; val y = (i / 40) * 2.0
      (i.toLong,
        s"POLYGON (($x $y, ${x + 1} $y, ${x + 1} ${y + 1}, $x ${y + 1}, $x $y))")
    }.toDF("fid", "wkt")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    FlatGeobufSink.writeStream(df, "EPSG:28992", out)(sp)
    val m = FgbMeta.read(out)
    val idxStart = 12L + m.header.length
    val idxBytes = FlatGeobuf.indexBytes(m.numItems, m.nodeSize)
    val full = {
      val r = graft.io.PositionedReader.open(out)
      try FgbMeta.readAt(r, idxStart, idxBytes.toInt) finally r.close()
    }
    final class Rec(under: graft.io.PositionedReader)
        extends graft.io.PositionedReader {
      var bytes = 0L
      override def size(): Long = under.size()
      override def read(dst: java.nio.ByteBuffer, position: Long): Int = {
        bytes += dst.remaining(); under.read(dst, position)
      }
      override def close(): Unit = under.close()
    }
    for (box <- Seq((10.1, 10.1, 14.9, 14.9), (0.0, 0.0, 80.0, 60.0),
        (79.5, 59.5, 81.0, 61.0), (-5.0, -5.0, -1.0, -1.0))) {
      val (x0, y0, x1, y1) = box
      val whole = FlatGeobuf.searchIndex(full, m.numItems, m.nodeSize,
        x0, y0, x1, y1).toSet
      val rec = new Rec(graft.io.PositionedReader.open(out))
      val walked = try FgbMeta.searchIndexPositioned(rec, idxStart,
        m.numItems, m.nodeSize, x0, y0, x1, y1).toSet finally rec.close()
      assert(walked == whole, s"box $box")
      // a selective box must touch a small fraction of the tree
      if (whole.size <= 10)
        assert(rec.bytes < idxBytes / 4,
          s"box $box read ${rec.bytes} of $idxBytes index bytes")
    }
  }
}
