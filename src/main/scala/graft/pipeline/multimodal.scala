package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed by per-partition Scala kernels (the JVM
  * analogue of `mapInPandas` batches).
  *
  * The real decoders (JPEG/PNG/audio codecs) are NOT available in this
  * environment — the decode step is a clearly-marked DETERMINISTIC FAKE
  * (byte histograms / strided sampling) so the Spark-side plumbing (schema,
  * partitioning, batch shape, kernel signature) is real and testable; swap
  * `fakeDecode` for a codec call in production.
  */
object Multimodal {

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
}
