package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.geometry.{FlatGeobuf, FlatGeobufSink, GeomFunctions}

/** DSv2 write path for the `graft-fgb` connector:
  * `df.write.format("graft-fgb").option("srs", "EPSG:...").save(dir)`
  * emits ONE complete FlatGeobuf file per task —
  * `part-<writeId>-<partition>.fgb` under `dir` (the write-unique id
  * keeps successive appends from colliding) — with each file's own
  * packed Hilbert R-tree. The connector's read side lists the directory, so
  * write → read round-trips without a driver funnel: the single-file
  * `FlatGeobufSink` remains for the exchange-format contract (one
  * .fgb), this path is the archive-scale layout (a directory of
  * .fgb parts, each internally indexed and bbox-prunable).
  *
  * Schema contract: a `geometry` binary column (WKB; null allowed) —
  * every other column becomes a property (use an integral `fid`
  * column to carry stable ids through the read side's adoption rule).
  *
  * Task memory is O(features × ~56 B) bookkeeping: feature bodies are
  * extent-independent (see `encodeFeatureBody`) and spill to a task
  * temp as rows arrive; at commit the task computes its extent,
  * Hilbert-sorts the record table, streams bodies in sorted order
  * through a positioned copy, and publishes the finished file with a
  * rename — speculative duplicates abort and delete their temp. */
object GraftFgbWrite {
  case class Config(dir: String, srs: String)

  def config(dir: String, options: Map[String, String]): Config =
    Config(dir, options.getOrElse("srs", "EPSG:4326"))
}

class GraftFgbWriteBuilder(cfg: GraftFgbWrite.Config, schema: StructType)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftFgbBatchWrite(cfg, schema)
    /** `df.writeStream.format("graft-fgb")` — each micro-batch epoch
      * publishes its own indexed parts (`part-<epoch>-<partition>.fgb`),
      * rename-committed per epoch, so a concurrent batch or streaming
      * reader only ever lists complete containers. Append mode only
      * (containers are immutable once published). */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftFgbStreamingWrite(cfg, schema)
  }
}

class GraftFgbStreamingWrite(cfg: GraftFgbWrite.Config, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val geomIdx = schema.fieldNames.indexOf("geometry")
  require(geomIdx >= 0 &&
    schema.fields(geomIdx).dataType == BinaryType,
    "graft-fgb write: the frame needs a binary `geometry` column (WKB)")

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    GraftFgbStreamingWriterFactory(cfg, schema)

  /** IDEMPOTENT epoch commit: part names are deterministic per
    * (epoch, partition), so on a restart-replay of an epoch whose
    * commit crashed midway, a part that already made it to its final
    * name is the SAME content — treat it as published (drop the
    * replayed tmp) instead of failing the rename, so the query can
    * recover instead of crash-looping. Before dropping the tmp, VERIFY
    * the published file: on a backend whose "rename" is copy+delete
    * (object stores), the crash can leave a PARTIAL final file — its
    * length differs from the fully-written tmp, so re-publish from the
    * tmp on mismatch instead of keeping the truncated publish. */
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftFgbPartWritten(tmp, fin) if tmp.nonEmpty =>
        if (graft.io.FileIO.exists(fin)) {
          val complete = !graft.io.FileIO.exists(tmp) ||
            graft.io.FileIO.size(fin) == graft.io.FileIO.size(tmp)
          if (complete)
            try graft.io.FileIO.delete(tmp) catch { case _: Exception => () }
          else { // partial publish from a non-atomic rename: redo it
            graft.io.FileIO.delete(fin)
            graft.io.FileIO.rename(tmp, fin)
          }
        } else graft.io.FileIO.rename(tmp, fin)
      case _ => ()
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftFgbPartWritten(tmp, _) if tmp.nonEmpty =>
        try graft.io.FileIO.delete(tmp) catch { case _: Exception => () }
      case _ => ()
    }
}

case class GraftFgbStreamingWriterFactory(cfg: GraftFgbWrite.Config,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftFgbPartWriter(cfg, schema, partitionId, taskId,
      f"part-$epochId%06d-$partitionId%05d")
}

case class GraftFgbPartWritten(tmp: String, fin: String)
    extends WriterCommitMessage

class GraftFgbBatchWrite(cfg: GraftFgbWrite.Config, schema: StructType)
    extends BatchWrite {
  private val geomIdx = schema.fieldNames.indexOf("geometry")
  require(geomIdx >= 0 &&
    schema.fields(geomIdx).dataType == BinaryType,
    "graft-fgb write: the frame needs a binary `geometry` column (WKB)")

  // write-unique component in final part names (what Spark's file
  // sources do): successive `mode("append")` writes to the same
  // archive never collide on rename at job commit
  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new GraftFgbWriterFactory(cfg, schema, writeId)

  /** Publish: every task wrote its finished file to a `_tmp_` name in
    * the TARGET store; commit renames them into place (one metadata op
    * per part), so readers never see a half-written container. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftFgbPartWritten(tmp, fin) if tmp.nonEmpty =>
        graft.io.FileIO.rename(tmp, fin)
      case _ => ()
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftFgbPartWritten(tmp, _) if tmp.nonEmpty =>
        try graft.io.FileIO.delete(tmp) catch { case _: Exception => () }
      case _ => ()
    }
}

class GraftFgbWriterFactory(cfg: GraftFgbWrite.Config, schema: StructType,
    writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftFgbPartWriter(cfg, schema, partitionId, taskId,
      f"part-$writeId-$partitionId%05d")
}

class GraftFgbPartWriter(cfg: GraftFgbWrite.Config, schema: StructType,
    partitionId: Int, taskId: Long, stem: String = null)
    extends DataWriter[InternalRow] {
  private val nameStem =
    if (stem != null) stem else f"part-$partitionId%05d"
  import FlatGeobuf._

  private val geomIdx = schema.fieldNames.indexOf("geometry")
  private val attrIdx = schema.fields.indices.filter(_ != geomIdx)
  private val attrCols = attrIdx.map(schema.fields(_).name)
  private val colTypes = attrIdx.map(i =>
    FlatGeobuf.columnType(schema.fields(i).dataType))

  // raw (unordered) body spill + per-feature record table
  private val tmpRaw = java.nio.file.Files.createTempFile("fgb_task", ".raw")
  private val rawOut = new java.io.BufferedOutputStream(
    java.nio.file.Files.newOutputStream(tmpRaw))
  private case class Rec(off: Long, len: Int, minX: Double, minY: Double,
      maxX: Double, maxY: Double, hasGeom: Boolean)
  private val recs = scala.collection.mutable.ArrayBuffer[Rec]()
  private var rawBytes = 0L
  private var geomType = -1
  private var minX = Double.MaxValue; private var minY = Double.MaxValue
  private var maxX = -Double.MaxValue; private var maxY = -Double.MaxValue

  override def write(row: InternalRow): Unit = {
    val wkb = if (row.isNullAt(geomIdx)) null else row.getBinary(geomIdx)
    val g = if (wkb == null) null else GeomFunctions.readWkb(wkb)
    if (g != null) {
      val gt = geometryType(g)
      geomType = if (geomType == -1 || geomType == gt) gt else GtUnknown
    }
    val body = FlatGeobufSink.encodeFeatureBody(g,
      attrIdx.zipWithIndex.map { case (fi, i) =>
        (i, colTypes(i), if (row.isNullAt(fi)) null
          else fromCatalyst(row, fi, schema.fields(fi).dataType))
      })
    rawOut.write(body)
    val env = if (g == null) null else g.getEnvelopeInternal
    if (env != null) {
      minX = math.min(minX, env.getMinX); minY = math.min(minY, env.getMinY)
      maxX = math.max(maxX, env.getMaxX); maxY = math.max(maxY, env.getMaxY)
    }
    recs += Rec(rawBytes, body.length,
      if (env == null) 0 else env.getMinX,
      if (env == null) 0 else env.getMinY,
      if (env == null) 0 else env.getMaxX,
      if (env == null) 0 else env.getMaxY, env != null)
    rawBytes += body.length
  }

  private def fromCatalyst(row: InternalRow, i: Int, dt: DataType): Any =
    dt match {
      case StringType => row.getUTF8String(i).toString
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case ByteType => java.lang.Byte.valueOf(row.getByte(i))
      case ShortType => java.lang.Short.valueOf(row.getShort(i))
      case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType => java.lang.Long.valueOf(row.getLong(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case BinaryType => row.getBinary(i)
      case TimestampType => java.lang.Long.valueOf(row.getLong(i))
      case other => throw new IllegalArgumentException(
        s"graft-fgb write: unsupported property type $other " +
          s"for ${schema.fields(i).name}")
    }

  override def commit(): WriterCommitMessage = {
    rawOut.close()
    if (recs.isEmpty) {
      java.nio.file.Files.deleteIfExists(tmpRaw)
      return GraftFgbPartWritten("", "")
    }
    if (minX > maxX) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
    val w = math.max(maxX - minX, 1e-12); val h = math.max(maxY - minY, 1e-12)
    def hil(r: Rec): Long =
      if (!r.hasGeom) Long.MaxValue
      else {
        val cx = (((r.minX + r.maxX) / 2 - minX) / w * 65535.0).toInt
        val cy = (((r.minY + r.maxY) / 2 - minY) / h * 65535.0).toInt
        hilbert(math.min(math.max(cx, 0), 65535),
          math.min(math.max(cy, 0), 65535))
      }
    val order = recs.indices.sortBy(i => (hil(recs(i)), i))

    // sorted spills: leaf records + size-prefixed bodies (positioned
    // copy out of the raw spill)
    val tmpLeaf = java.nio.file.Files.createTempFile("fgb_task", ".l0")
    val tmpFeat = java.nio.file.Files.createTempFile("fgb_task", ".feat")
    val leafOut = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmpLeaf))
    val featOut = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmpFeat))
    val raw = java.nio.channels.FileChannel.open(tmpRaw,
      java.nio.file.StandardOpenOption.READ)
    var featBytes = 0L
    try {
      order.foreach { i =>
        val r = recs(i)
        // null geometry = NO envelope: the EMPTY box never intersects a
        // query window and folds out of parent/env-aggregate min/max
        writeNodeRecord(leafOut,
          if (r.hasGeom) r.minX else Double.PositiveInfinity,
          if (r.hasGeom) r.minY else Double.PositiveInfinity,
          if (r.hasGeom) r.maxX else Double.NegativeInfinity,
          if (r.hasGeom) r.maxY else Double.NegativeInfinity, featBytes)
        val body = java.nio.ByteBuffer.allocate(r.len)
        var p = r.off
        while (body.hasRemaining) {
          val k = raw.read(body, p)
          require(k > 0, s"task spill truncated at $p")
          p += k
        }
        val lp = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(r.len).array()
        featOut.write(lp); featOut.write(body.array())
        featBytes += 4L + r.len
      }
    } finally { raw.close(); leafOut.close(); featOut.close() }

    val fin = graft.io.FileIO.child(cfg.dir, s"$nameStem.fgb")
    val tmp = graft.io.FileIO.child(cfg.dir, s"_tmp_$nameStem-$taskId.tmp")
    val out = new java.io.BufferedOutputStream(
      graft.io.FileIO.createStream(tmp))
    try FlatGeobufSink.assemble(out, FlatGeobufSink.layerNameOf(fin),
      cfg.srs, attrCols, colTypes, geomType, recs.length,
      (minX, minY, maxX, maxY), tmpLeaf, tmpFeat,
      nGeoms = recs.count(_.hasGeom))
    finally {
      out.close()
      java.nio.file.Files.deleteIfExists(tmpRaw)
      java.nio.file.Files.deleteIfExists(tmpLeaf)
      java.nio.file.Files.deleteIfExists(tmpFeat)
    }
    GraftFgbPartWritten(tmp, fin)
  }

  override def abort(): Unit = {
    try rawOut.close() catch { case _: Exception => () }
    java.nio.file.Files.deleteIfExists(tmpRaw)
  }

  override def close(): Unit = ()
}
