package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed by per-partition Scala kernels (the JVM
  * analogue of `mapInPandas` batches).
  *
  * IMAGE decode is REAL: `javax.imageio` ships with the JDK and reads
  * PNG/JPEG/BMP/GIF without native libraries — [[decodeImage]] feeds
  * per-partition batches through `ImageIO` and emits pixel statistics.
  * Audio/video codecs are NOT available in this environment, so those
  * modalities fall back to a clearly-marked DETERMINISTIC FAKE
  * (byte histograms / strided sampling); the Spark-side plumbing (schema,
  * partitioning, batch shape, kernel signature) is identical either way —
  * swap `fakeDecode` for a codec call in production.
  */
object Multimodal {

  // ImageIO's default DISK cache creates (and deletes) a temp file per
  // encode/decode — at millions of rows across 32 executor threads that
  // is filesystem-metadata contention, not codec work (the sf30 soak
  // measured x9 wall on x3 data until this). The payloads here are
  // kilobytes: the in-memory cache is strictly better at every scale.
  // Object init runs once per executor JVM (every kernel below touches
  // this object), so the global flag is set before any codec call.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int)
  case class FeatureRow(doc_id: Long, modality: String, feature: Array[Float],
      width: Int, height: Int)

  /** Build a media table from any binary-able column (here: text bytes as a
    * stand-in payload). */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      (when(col(idCol) % 3 === 0, "image"): org.apache.spark.sql.Column)
        .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      (col(idCol) % 64 + 16).cast("int").as("width"),
      (col(idCol) % 48 + 16).cast("int").as("height"))

  /** DETERMINISTIC FAKE decoder: 16-bin byte histogram, normalized.
    * Stand-in for image decode → pixel stats. */
  private[pipeline] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload == null || payload.isEmpty) return hist
    payload.foreach { b => hist((b & 0xff) / 16) += 1f }
    val n = payload.length.toFloat
    hist.map(_ / n)
  }

  /** Feature extraction over partition-sized batches of media rows —
    * the `mapPartitions` kernel shape a real decoder would use. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        FeatureRow(m.doc_id, m.modality, fakeDecode(m.payload), m.width, m.height)
      }
    }
  }

  case class ImageStatsRow(doc_id: Long, width: Int, height: Int,
      channels: Int, mean: Double, p_min: Int, p_max: Int)

  /** REAL image decode: `ImageIO.read` (PNG/JPEG/BMP/GIF — JDK built-in,
    * no native codecs needed) → per-band pixel statistics. Returns None for
    * payloads no installed reader understands (callers decide the
    * fallback). */
  private[pipeline] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double, Int, Int)] = {
    if (payload == null || payload.isEmpty) return None
    // NonFatal, not just IOException: ImageIO readers throw runtime
    // exceptions on corrupt-but-recognized payloads (CMMException on broken
    // ICC profiles, AIOOBE in PNGImageReader on truncation) and those must
    // take the fallback too, not kill the task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val r = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
    // bulk row transfer: getPixels fills one interleaved row at a time —
    // same sample values as the former per-(x,y,band) getSample loop,
    // without a virtual call + bounds checks per sample
    val row = new Array[Int](w * bands)
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var y = 0
    while (y < h) {
      r.getPixels(0, y, w, 1, row)
      var i = 0
      val n = w * bands
      while (i < n) {
        val v = row(i)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      y += 1
    }
    Some((w, h, bands, sum.toDouble / (w.toLong * h * bands), mn, mx))
  }

  /** Decode image payloads in partition batches and emit pixel statistics;
    * undecodable payloads fall back to the byte-histogram fake with
    * sentinel dimensions (-1) so they stay visible downstream rather than
    * being dropped silently. */
  def imageStats(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageStatsRow] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some((w, h, c, mean, mn, mx)) => ImageStatsRow(id, w, h, c, mean, mn, mx)
            case None =>
              val hist = fakeDecode(payload)
              ImageStatsRow(id, -1, -1, -1, hist.sum.toDouble, -1, -1)
          }
        }
      }
  }

  /** Deterministic synthetic images, REALLY encoded: one 8-bit grayscale
    * PNG per id with pixel(x, y) = (id·31 + x·7 + y·13) mod 256 and
    * dimensions (id mod 64 + 16) × (id mod 48 + 16). PNG is lossless, so
    * the decoded statistics have a closed form an external oracle can
    * compute without a codec — the end-to-end encode→decode round-trip is
    * what the engine is being tested on. */
  def syntheticImageTable(ids: DataFrame, idCol: String = "doc_id")
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      // one PNG writer per task (ImageIO.write does a registry lookup and
      // builds a fresh writer per call); same writer + default params →
      // byte-identical output
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val out = it.map { id =>
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        // TYPE_BYTE_GRAY backs a single byte bank with scanline stride w:
        // filling it directly writes the same sample values as setSample
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var y = 0
        while (y < h) {
          val row = y * w
          var x = 0
          while (x < w) {
            data(row + x) = ((id * 31 + x * 7 + y * 13) % 256).toByte
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(img)
        } finally {
          // reset per row like the GIF path: don't rely on setOutput
          // implicitly clearing writer-implementation-private state
          writer.reset()
          ios.close()
        }
        (id, bos.toByteArray)
      }
      out // writer.dispose() skipped: task-scoped, reclaimed with the task
    }.toDF("doc_id", "payload")
  }

  /** "Resize": strided byte sampling to a fixed target size (stand-in for a
    * pixel resample, keeps the partitioned binary-kernel shape). */
  def resize(media: DataFrame, target: Int)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val p = m.payload
        val out =
          if (p == null || p.length <= target) p
          else Array.tabulate(target)(i => p((i.toLong * p.length / target).toInt))
        MediaRow(m.doc_id, m.modality, out, target, target)
      }
    }
  }

  /** "Frame sampling" for video payloads: split the payload into `frames`
    * equal chunks and keep every `stride`-th chunk. */
  def sampleFrames(media: DataFrame, frames: Int, stride: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val p = if (m.payload == null) Array.empty[Byte] else m.payload
      val chunk = math.max(1, p.length / frames)
      (0 until frames by stride).map { f =>
        val from = f * chunk
        val until = math.min(p.length, from + chunk)
        (m.doc_id, f, if (from >= p.length) Array.empty[Byte] else p.slice(from, until))
      }
    }.toDF("doc_id", "frame", "chunk")
  }

  // ------------------------------------------------- video (animated GIF)

  /** REAL multi-frame video decode for one container: animated GIF via
    * the JDK's ImageIO sequence reader (no native libraries). Returns
    * per-frame integer statistics — pixel sum and count stay integers
    * so an oracle replays them without a codec. */
  private[pipeline] def decodeGifFrames(payload: Array[Byte])
      : Seq[(Int, Int, Int, Long)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val readers = javax.imageio.ImageIO.getImageReaders(in)
    require(readers.hasNext, "gif: no reader for payload")
    val reader = readers.next()
    try {
      reader.setInput(in)
      val n = reader.getNumImages(true)
      require(n >= 1 && n <= 4096, s"gif: $n frames")
      (0 until n).map { f =>
        val img = reader.read(f)
        val w = img.getWidth; val h = img.getHeight
        require(w.toLong * h <= (1L << 24), s"gif: frame $f is $w x $h")
        var sum = 0L
        img.getColorModel match {
          // GIF decodes to an indexed image: getRGB(x, y) & 0xFF is the
          // palette entry's blue byte looked up by the raster sample.
          // Precompute that 256-entry lookup once per frame and stream
          // the samples row-wise — identical values, no per-pixel color
          // model dispatch ("gray rides in every channel" unchanged)
          case icm: java.awt.image.IndexColorModel
              if img.getRaster.getNumBands == 1 =>
            val lut = new Array[Long](icm.getMapSize)
            var i = 0
            while (i < lut.length) { lut(i) = (icm.getRGB(i) & 0xFF).toLong; i += 1 }
            val r = img.getRaster
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              r.getSamples(0, y, w, 1, 0, row)
              var x = 0
              while (x < w) { sum += lut(row(x)); x += 1 }
              y += 1
            }
          case _ =>
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum += (img.getRGB(x, y) & 0xFF) // gray rides in every channel
                x += 1
              }
              y += 1
            }
        }
        (f, w, h, sum)
      }
    } finally { reader.dispose(); in.close() }
  }

  /** Per-frame statistics of an animated-GIF video column:
    * (doc_id, frame, width, height, pix_sum, n_pix). */
  def videoFrameStats(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload")
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeGifFrames(payload).map { case (f, w, h, sum) =>
            (id, f, w, h, sum, w.toLong * h)
          }
        }
      }.toDF("doc_id", "frame", "width", "height", "pix_sum", "n_pix")
  }

  /** Deterministic synthetic videos, REALLY encoded: one 4-frame
    * animated GIF per id, frames on an explicit 256-gray palette
    * (TYPE_BYTE_INDEXED — GIF stores indices exactly, so the decode has
    * the closed form pixel(x, y, f) = (id·31 + x·7 + y·13 + f·17) mod
    * 256 with dimensions (id mod 16 + 8) × (id mod 12 + 8)). */
  def syntheticGifTable(ids: DataFrame, idCol: String = "doc_id",
      frames: Int = 4)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      val grays = Array.tabulate(256)(i => (i | (i << 8) | (i << 16)).toInt)
      val palette = new java.awt.image.IndexColorModel(
        8, 256, grays, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
      // one GIF writer per task, reset between rows: the registry lookup
      // and writer construction per row cost more than the tiny encode
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      it.map { id =>
        val w = (id % 16 + 8).toInt
        val h = (id % 12 + 8).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val out = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(out)
          writer.prepareWriteSequence(null)
          for (f <- 0 until frames) {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
            // single byte bank, scanline stride w: direct fill writes the
            // same sample values as setSample
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var y = 0
            while (y < h) {
              val row = y * w
              var x = 0
              while (x < w) {
                data(row + x) =
                  ((id * 31 + x * 7 + y * 13 + f * 17) % 256).toByte
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
        } finally { writer.reset(); out.close() }
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }
}
