package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import graft.io.FileIO
import graft.raster.{Bbox, DType, TileLayout, Zarr}

/** The `graft-raster` WRITE path: `df.write.format("graft-raster")`
  * over the connector's own tile-frame schema (t, ty, tx, values —
  * a `path` column, if present, is ignored) materializes a Zarr v3
  * SHARDED store with ONE SHARD PER FRAME:
  *
  *   - the plan requires rows CLUSTERED and SORTED by `t`
  *     ([[RequiresDistributionAndOrdering]]), so each executor task
  *     owns whole frames and assembles each frame's shard object
  *     (inner chunks + crc32c index) in one pass with one-frame
  *     memory;
  *   - every data byte is written BY THE TASK that owns the frame
  *     (`band1/c/<ti>/0/0`, one PUT per shard — no driver funnel);
  *   - the driver's commit writes only the store METADATA (group
  *     document, coordinate arrays, array `zarr.json`), a few KB.
  *
  * Frame identity: `ti = (t - time_first) / time_delta` (the
  * connector's read-side convention); frames never written stay
  * missing chunks = fill, the Zarr sparse-store contract. The store
  * round-trips through the connector's read path, whose AOI/tile
  * pushdown then opens only the written shards' byte ranges.
  *
  * Required options: `width`, `height`, `x0`, `y0` (world bbox origin
  * = lower-left), `cell` (pixel size), `projection`. Optional:
  * `nodata` (default NaN), `chunk` (inner chunk edge, default 256),
  * `time_first`/`time_delta` (default 0/3600000), `compress`
  * (zstd, default true). Append mode only.
  */
object GraftRasterWrite {
  val writableColumns = Seq("t", "ty", "tx", "values")

  case class Config(dir: String, w: Int, h: Int, x0: Double, y0: Double,
      cell: Double, projection: String, noData: Double, chunk: Int,
      timeFirst: Long, timeDelta: Long, compress: Boolean,
      varName: String) {
    def bbox: Bbox = Bbox(x0, y0, x0 + w * cell, y0 + h * cell)
    /** Inner chunk shape clamped to the grid — MUST mirror
      * `Zarr.writeStackMeta`'s clamping so the shard objects written
      * by tasks match the metadata the driver commits. */
    def chunkH: Int = math.min(chunk, h)
    def chunkW: Int = math.min(chunk, w)
    /** Metadata writes go through the local filesystem writer: accept
      * a bare path or a `file://` URL (shard objects already stream
      * through the Hadoop-capable FileIO). */
    def localDir: String =
      if (!FileIO.hasScheme(dir)) dir
      else {
        require(dir.startsWith("file:"),
          s"graft-raster write: store metadata writer supports local " +
            s"and file:// targets (got $dir)")
        new java.net.URI(dir).getPath
      }
  }

  def config(dir: String, options: Map[String, String]): Config = {
    def req(k: String): String = options.getOrElse(k,
      throw new IllegalArgumentException(
        s"graft-raster write: missing required option '$k' " +
          "(width, height, x0, y0, cell, projection)"))
    val c = Config(dir,
      req("width").toInt, req("height").toInt,
      req("x0").toDouble, req("y0").toDouble, req("cell").toDouble,
      req("projection"),
      options.get("nodata").map(_.toDouble).getOrElse(Double.NaN),
      options.get("chunk").map(_.toInt).getOrElse(256),
      options.get("time_first").map(_.toLong).getOrElse(0L),
      options.get("time_delta").map(_.toLong).getOrElse(3600000L),
      options.get("compress").forall(_.toBoolean),
      options.getOrElse("var", "band1"))
    require(c.w > 0 && c.h > 0 && c.w.toLong * c.h <= (1L << 27),
      s"graft-raster write: ${c.w}x${c.h} frame (max 2^27 pixels)")
    require(c.cell > 0, s"graft-raster write: cell ${c.cell}")
    require(c.chunk > 0, s"graft-raster write: chunk ${c.chunk}")
    require(c.timeDelta > 0, s"graft-raster write: time_delta ${c.timeDelta}")
    c
  }
}

class GraftWriteBuilder(cfg: GraftRasterWrite.Config, schema: StructType)
    extends WriteBuilder {
  override def build(): Write = new GraftWrite(cfg, schema)
}

class GraftWrite(cfg: GraftRasterWrite.Config, schema: StructType)
    extends Write with RequiresDistributionAndOrdering {
  // every row of one frame in one task, frames arriving whole and in
  // order: one-frame writer memory and one PUT per shard
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("t")))
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.identity("t"),
      SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new GraftBatchWrite(cfg, schema)

  /** `df.writeStream.format("graft-raster")` — each micro-batch epoch
    * lands its frames as shard objects and the commit EXTENDS the
    * store's time axis to cover them. Shard paths derive from the
    * ABSOLUTE time index, so an epoch replay after failure rewrites
    * the same objects — idempotent, exactly-once by construction. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftZarrStreamingWrite(cfg, schema)
}

class GraftZarrStreamingWrite(cfg: GraftRasterWrite.Config,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val idx = GraftRasterWrite.writableColumns.map { c =>
      c -> schema.fieldIndex(c)
    }.toMap
    GraftZarrStreamingWriterFactory(cfg, idx("t"), idx("ty"), idx("tx"),
      idx("values"))
  }

  /** Per-epoch metadata commit: the time axis becomes the union of the
    * store's existing span and this epoch's frames (a few KB of JSON —
    * the ONLY driver-side write). Readers between commits see the
    * previous consistent axis; the new shard objects are invisible
    * until the axis covers them. */
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val tis = messages.collect { case GraftFramesWritten(t) => t }.flatten
    if (tis.isEmpty) return // an idle micro-batch commits nothing
    require(tis.distinct.length == tis.length,
      s"graft-raster stream write: frame(s) ${tis.diff(tis.distinct)
        .distinct.mkString(",")} written by more than one task in " +
        s"epoch $epochId (the clustered distribution contract was violated)")
    val existingT =
      if (FileIO.exists(FileIO.child(cfg.dir, "zarr.json")))
        Zarr.readMeta(cfg.dir).timesMs.length
      else 0
    val nT = math.max(existingT, tis.max + 1)
    Zarr.writeStackMeta(cfg.dir, cfg.w, cfg.h, cfg.bbox, cfg.noData,
      cfg.projection,
      (0 until nT).map(i => cfg.timeFirst + i.toLong * cfg.timeDelta),
      varName = cfg.varName, chunkH = cfg.chunk, chunkW = cfg.chunk,
      compress = cfg.compress)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftFramesWritten(t) => t }.flatten
      .foreach { ti =>
        FileIO.delete(FileIO.child(cfg.dir, s"${cfg.varName}/c/$ti/0/0"))
        ()
      }
}

case class GraftZarrStreamingWriterFactory(cfg: GraftRasterWrite.Config,
    tIdx: Int, tyIdx: Int, txIdx: Int, valuesIdx: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftShardWriter(cfg, tIdx, tyIdx, txIdx, valuesIdx)
}

case class GraftFramesWritten(tis: Seq[Int]) extends WriterCommitMessage

class GraftBatchWrite(cfg: GraftRasterWrite.Config, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val idx = GraftRasterWrite.writableColumns.map { c =>
      val i = schema.fieldIndex(c) // throws by name if absent
      c -> i
    }.toMap
    new GraftShardWriterFactory(cfg, idx("t"), idx("ty"), idx("tx"),
      idx("values"))
  }

  /** Driver-side: a few KB of JSON + coordinate arrays. The time axis
    * spans [time_first, last written frame]; unwritten frames in
    * between stay missing chunks = fill. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tis = messages.collect { case GraftFramesWritten(t) => t }.flatten
    require(tis.nonEmpty, "graft-raster write: no frames written")
    require(tis.distinct.length == tis.length,
      s"graft-raster write: frame(s) ${tis.diff(tis.distinct).distinct
        .mkString(",")} written by more than one task (the clustered " +
        "distribution contract was violated)")
    val nT = tis.max + 1
    Zarr.writeStackMeta(cfg.dir, cfg.w, cfg.h, cfg.bbox, cfg.noData,
      cfg.projection,
      (0 until nT).map(i => cfg.timeFirst + i.toLong * cfg.timeDelta),
      varName = cfg.varName, chunkH = cfg.chunk, chunkW = cfg.chunk,
      compress = cfg.compress)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftFramesWritten(t) => t }.flatten
      .foreach { ti =>
        FileIO.delete(FileIO.child(cfg.dir, s"${cfg.varName}/c/$ti/0/0"))
        ()
      }
}

class GraftShardWriterFactory(cfg: GraftRasterWrite.Config, tIdx: Int,
    tyIdx: Int, txIdx: Int, valuesIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftShardWriter(cfg, tIdx, tyIdx, txIdx, valuesIdx)
}

/** One executor task: receives whole frames in t order (the plan's
  * required distribution + ordering), accumulates ONE frame buffer,
  * and flushes each completed frame as one shard object. */
class GraftShardWriter(cfg: GraftRasterWrite.Config, tIdx: Int,
    tyIdx: Int, txIdx: Int, valuesIdx: Int)
    extends DataWriter[InternalRow] {
  private val shardShape = Zarr.frameShardShape(cfg.w, cfg.h, cfg.chunkH,
    cfg.chunkW)
  private val padH = shardShape(1); private val padW = shardShape(2)
  private val nTiles = TileLayout.numTiles(cfg.w, cfg.h)
  private val dt = DType.F8
  private val comp: Zarr.Compression =
    if (cfg.compress) Zarr.Zstd else Zarr.NoComp

  private var curTi = -1
  private var tilesSeen = 0
  private val tileSeen = new java.util.BitSet(nTiles)
  private var buf: Array[Double] = null
  private val written = scala.collection.mutable.ArrayBuffer[Int]()

  private def flush(): Unit = if (curTi >= 0) {
    require(tilesSeen == nTiles,
      s"graft-raster write: frame $curTi received $tilesSeen of " +
        s"$nTiles tiles (every tile of a frame must be present " +
        "exactly once)")
    val bytes = Zarr.shardObjectBytes(buf, shardShape,
      Seq(1, cfg.chunkH, cfg.chunkW), dt, comp)
    FileIO.writeAll(
      FileIO.child(cfg.dir, s"${cfg.varName}/c/$curTi/0/0"), bytes)
    written += curTi
    curTi = -1; tilesSeen = 0
  }

  override def write(row: InternalRow): Unit = {
    val t = row.getLong(tIdx)
    require(t >= cfg.timeFirst && (t - cfg.timeFirst) % cfg.timeDelta == 0,
      s"graft-raster write: t=$t does not land on the " +
        s"time_first=${cfg.timeFirst}/time_delta=${cfg.timeDelta} grid")
    val ti = ((t - cfg.timeFirst) / cfg.timeDelta).toInt
    if (ti != curTi) {
      require(curTi < 0 || ti > curTi,
        s"graft-raster write: frame $ti arrived after frame $curTi " +
          "(the sorted-by-t contract was violated)")
      flush()
      curTi = ti
      tileSeen.clear()
      buf = Array.fill(padH * padW)(cfg.noData)
    }
    val ty = row.getInt(tyIdx); val tx = row.getInt(txIdx)
    val tw = TileLayout.tileW(cfg.w, tx)
    val th = TileLayout.tileH(cfg.h, ty)
    require(ty >= 0 && tx >= 0 && tw > 0 && th > 0,
      s"graft-raster write: tile ($ty, $tx) outside the " +
        s"${cfg.w}x${cfg.h} grid")
    val tileId = ty * TileLayout.tilesX(cfg.w) + tx
    require(!tileSeen.get(tileId),
      s"graft-raster write: tile ($ty, $tx) of frame $curTi written twice")
    tileSeen.set(tileId)
    val vals = row.getArray(valuesIdx).toDoubleArray()
    require(vals.length == tw * th,
      s"graft-raster write: tile ($ty, $tx) holds ${vals.length} " +
        s"values, the ${cfg.w}x${cfg.h} grid expects ${tw * th}")
    var r = 0
    while (r < th) {
      System.arraycopy(vals, r * tw, buf,
        (ty * TileLayout.TILE + r) * padW + tx * TileLayout.TILE, tw)
      r += 1
    }
    tilesSeen += 1
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GraftFramesWritten(written.toSeq)
  }

  override def abort(): Unit =
    written.foreach { ti =>
      FileIO.delete(FileIO.child(cfg.dir, s"${cfg.varName}/c/$ti/0/0"))
      ()
    }

  override def close(): Unit = ()
}
