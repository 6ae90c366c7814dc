package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  implicit def sp: SparkSession = spark

  test("synthetic PNGs decode back to the closed-form pixel statistics") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 17L, 63L).toDF("doc_id")
    val media = Multimodal.syntheticImageTable(ids)
    val stats = Multimodal.imageStats(media).collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(0L, 5L, 17L, 63L)) {
      val w = (id % 64 + 16).toInt; val h = (id % 48 + 16).toInt
      val pix = for { y <- 0 until h; x <- 0 until w } yield ((id * 31 + x * 7 + y * 13) % 256).toInt
      val s = stats(id)
      assert(s.width == w && s.height == h && s.channels == 1)
      assert(s.p_min == pix.min && s.p_max == pix.max)
      assert(math.abs(s.mean - pix.sum.toDouble / pix.size) < 1e-9)
    }
  }

  test("JPEG and BMP payloads decode; garbage falls back with sentinel dims") {
    import spark.implicits._
    // a real 10x7 RGB JPEG encoded in-process
    val img = new java.awt.image.BufferedImage(10, 7, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 7; x <- 0 until 10; b <- 0 until 3)
      img.getRaster.setSample(x, y, b, (x * 20 + y * 10 + b * 40) % 256)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, enc("jpg")), (2L, enc("bmp")), (3L, "not an image".getBytes))
      .toDF("doc_id", "payload")
    val stats = Multimodal.imageStats(media).collect().map(s => s.doc_id -> s).toMap
    assert(stats(1L).width == 10 && stats(1L).height == 7 && stats(1L).channels == 3)
    assert(stats(2L).width == 10 && stats(2L).height == 7 && stats(2L).channels == 3)
    // BMP is lossless: exact stats
    val pix = for (y <- 0 until 7; x <- 0 until 10; b <- 0 until 3) yield (x * 20 + y * 10 + b * 40) % 256
    assert(stats(2L).p_min == pix.min && stats(2L).p_max == pix.max)
    // garbage payload: fake-decode fallback, sentinel dimensions
    assert(stats(3L).width == -1 && stats(3L).channels == -1)
  }

  test("resize and frame sampling keep the partitioned kernel shape") {
    import spark.implicits._
    val media = Multimodal.mediaTable(
      Seq((0L, "abcdefghij"), (1L, "0123456789")).toDF("doc_id", "text"),
      "doc_id", "text")
    val resized = Multimodal.resize(media, 4).collect()
    assert(resized.forall(_.payload.length <= 4))
    val frames = Multimodal.sampleFrames(media, 5, 2)
    assert(frames.groupBy("doc_id").count().collect().forall(_.getLong(1) == 3))
  }

  test("animated GIF videos decode frame-exact against the closed form") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 23L)
    val out = Multimodal.videoFrameStats(
        Multimodal.syntheticGifTable(ids.toDF("doc_id")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == ids.length * 4)
    for (id <- ids; f <- 0 until 4) {
      val w = (id % 16 + 8).toInt; val h = (id % 12 + 8).toInt
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13 + f * 17) % 256).sum
      val (gw, gh, ps, np) = out((id, f))
      assert(gw == w && gh == h && np == w.toLong * h)
      assert(ps == want, s"id=$id frame=$f: $ps != $want")
    }
  }

  test("WAV codec round-trips PCM-16 exactly; chunk walk skips LIST") {
    import graft.pipeline.Wav
    val samples = Array.tabulate(300)(i =>
      ((i * 977) % 65536 - 32768).toShort)
    val bytes = Wav.encode(samples, 22050)
    val (rate, back) = Wav.decode(bytes)
    assert(rate == 22050 && back.sameElements(samples))
    // splice an unknown LIST chunk between fmt and data: decode skips it
    val head = bytes.take(36) // RIFF..fmt chunk end
    val tail = bytes.drop(36) // data chunk
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // odd size -> pad byte
    val spliced = head ++ list ++ tail
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate2, back2) = Wav.decode(spliced)
    assert(rate2 == 22050 && back2.sameElements(samples))
  }

  test("WAV failure modes are loud: magic, stereo, truncation, bits") {
    import graft.pipeline.Wav
    val good = Wav.encode(Array.tabulate(16)(_.toShort), 8000)
    val noMagic = good.clone(); noMagic(0) = 'X'
    assert(intercept[IllegalArgumentException](Wav.decode(noMagic))
      .getMessage.contains("RIFF"))
    val stereo = good.clone(); stereo(22) = 2
    assert(intercept[IllegalArgumentException](Wav.decode(stereo))
      .getMessage.contains("channels"))
    val bits8 = good.clone(); bits8(34) = 8
    assert(intercept[IllegalArgumentException](Wav.decode(bits8))
      .getMessage.contains("bits"))
    assert(intercept[IllegalArgumentException](Wav.decode(good.take(30)))
      .getMessage.contains("wav"))
  }

  test("wavFeatures computes integer stats through the binary column") {
    import graft.pipeline.Audio
    val sp = spark
    import sp.implicits._
    val out = Audio.wavFeatures(Audio.syntheticWavTable(
        Seq(0L, 1L, 7L).toDF("doc_id"), "doc_id", 160, 16000))
      .orderBy("doc_id").collect()
    for (r <- out) {
      val id = r.getLong(0)
      val samples = Array.tabulate(160)(i => Audio.sample(id, i))
      assert(r.getLong(1) == 160L)
      assert(r.getLong(2) == samples.map(s => s.toLong * s.toLong).sum)
      assert(r.getLong(3) == samples.map(s => math.abs(s.toLong)).max)
      assert(r.getLong(4) == 10L) // 160 samples at 16 kHz
    }
  }
}
