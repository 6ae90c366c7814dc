package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio for the multimodal column family: a from-scratch RIFF/
  * WAVE PCM-16 codec (the format needs no native library — it is a
  * chunked header over raw little-endian samples, public spec since
  * 1991), upgrading the audio modality from `Multimodal`'s documented
  * deterministic fake to an actual decode path. Images were already
  * real (ImageIO); video remains the documented stub.
  *
  * Scale shape: audio rides as an opaque `binary` column; encode/
  * decode/feature kernels are per-row and stateless, so the operator
  * is embarrassingly parallel — the only aggregates are per-document
  * integer statistics chosen to be engine-reproducible (no float
  * accumulation: sum of squares, peak, integer-division duration). */
object Wav {

  /** Mono PCM-16 RIFF/WAVE bytes. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
    b.putShort(1)                    // PCM
    b.putShort(1)                    // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2)         // byte rate
    b.putShort(2)                    // block align
    b.putShort(16)                   // bits per sample
    b.put("data".getBytes("US-ASCII")); b.putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Parse mono PCM-16 WAVE: (sampleRate, samples). Unknown chunks are
    * skipped (LIST/INFO tags are common); anything outside mono PCM-16
    * fails loudly, as do truncated or hostile chunk sizes. */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes != null && bytes.length >= 44, "wav: shorter than a header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(fourcc() == "RIFF", "wav: no RIFF magic")
    val riffLen = b.getInt
    require(riffLen >= 36 && riffLen.toLong + 8 <= bytes.length,
      s"wav: RIFF declares $riffLen bytes, file has ${bytes.length}")
    require(fourcc() == "WAVE", "wav: RIFF is not WAVE")
    var rate = -1
    var data: Array[Short] = null
    while (b.remaining() >= 8) {
      val id = fourcc()
      val len = b.getInt
      require(len >= 0 && len <= b.remaining(),
        s"wav: chunk '$id' declares $len bytes, ${b.remaining()} remain")
      id match {
        case "fmt " =>
          require(len >= 16, s"wav: fmt chunk of $len bytes")
          val fmt = b.getShort
          require(fmt == 1, s"wav: audio format $fmt (only PCM)")
          val channels = b.getShort
          require(channels == 1, s"wav: $channels channels (only mono)")
          rate = b.getInt
          require(rate > 0, "wav: non-positive sample rate")
          b.getInt; b.getShort // byte rate, block align
          val bits = b.getShort
          require(bits == 16, s"wav: $bits bits per sample (only 16)")
          b.position(b.position() + (len - 16))
        case "data" =>
          require(len % 2 == 0, s"wav: odd data chunk ($len bytes)")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = b.getShort; i += 1 }
          data = out
        case _ => // LIST, fact, cue, ...: skip (+pad byte on odd sizes)
          b.position(b.position() + len + (len & 1))
      }
    }
    require(rate > 0, "wav: missing fmt chunk")
    require(data != null, "wav: missing data chunk")
    (rate, data)
  }
}

object Audio {

  /** Deterministic synthetic sample: position-indexed (NOT a sequential
    * LCG) so a SQL oracle replays it with plain integer arithmetic. */
  def sample(docId: Long, i: Int): Short =
    (((docId * 7919L + i * 104729L) % 65536L) - 32768L).toShort

  /** One mono PCM-16 WAV payload per id — the multimodal binary column
    * (deterministic fake CONTENT, real CONTAINER). */
  def syntheticWavTable(ids: DataFrame, idCol: String = "doc_id",
      nSamples: Int = 160, sampleRate: Int = 16000): DataFrame = {
    require(nSamples > 0, "nSamples must be positive")
    val enc = udf { (id: Long) =>
      Wav.encode(Array.tabulate(nSamples)(i => sample(id, i)), sampleRate)
    }
    ids.select(col(idCol).cast("long").as("doc_id"),
      enc(col(idCol).cast("long")).as("wav"))
  }

  /** Decode the WAV column and emit engine-reproducible integer
    * features: sample count, sum of squares, peak magnitude, and
    * floor-division duration in milliseconds. */
  def wavFeatures(media: DataFrame, idCol: String = "doc_id",
      wavCol: String = "wav"): DataFrame = {
    val feats = udf { (bytes: Array[Byte]) =>
      val (rate, samples) = Wav.decode(bytes)
      var sumSq = 0L
      var peak = 0L
      samples.foreach { s =>
        sumSq += s.toLong * s.toLong
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
      }
      (samples.length.toLong, sumSq, peak,
        samples.length.toLong * 1000L / rate)
    }
    media.select(col(idCol), feats(col(wavCol)).as("f"))
      .select(col(idCol),
        col("f._1").as("n_samples"), col("f._2").as("sum_sq"),
        col("f._3").as("peak"), col("f._4").as("duration_ms"))
  }
}
