package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.raster.{GeoTiff, Grib, TileLayout, Zarr}

/** DataSource V2 connector `graft-raster`: EXECUTOR-side decode of the
  * cloud-scale raster formats (GRIB2, GeoTIFF and Zarr v2/v3 — the
  * codecs with pure-JVM frame APIs). The block API (`RasterFileSource`)
  * decodes a file on the driver and broadcasts — right for one mosaic
  * tile, wrong for a directory of 10,000 GFS files. This connector
  * plans ONE InputPartition PER (file, frame): metadata (headers only)
  * is read at planning time on the driver, every data byte is decoded
  * in the executors, so a 100 TB archive scales with the cluster, not
  * the driver.
  *
  * Schema: (path string, t long epoch-ms, ty int, tx int, values
  * array<double>) — the engine's tile-frame shape (TileLayout.TILE)
  * plus the source path, so downstream reshapes match `RasterFrames`.
  *
  * Pushdown: temporal predicates on `t` (=, <, <=, >, >=) prune whole
  * (file, frame) partitions at planning time — the DSv2 rendering of
  * the codecs' field/chunk pruning (`.explain` shows the pushed range;
  * unreferenced frames never open their byte ranges).
  *
  * Usage: `spark.read.format("graft-raster").load(paths...)` — each
  * path a .grib2/.grb2 file, a Zarr store directory, or a directory
  * scanned (non-recursively) for GRIB files / Zarr stores. Unknown
  * layouts fail loudly by name.
  */
class GraftRasterSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-raster"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRasterTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftRasterTable(GraftRasterTable.resolvePaths(properties))
}

object GraftRasterTable {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("ty", IntegerType, nullable = false),
    StructField("tx", IntegerType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** `load(...)` paths arrive as the `paths` JSON list (multi) or the
    * `path` entry (single). */
  def resolvePaths(properties: JMap[String, String]): Seq[String] = {
    val m = properties.asScala
    val multi = m.get("paths").map { js =>
      graft.core.Json.parse(js) match {
        case l: List[_] => l.map(_.toString)
        case other => throw new IllegalArgumentException(
          s"graft-raster: bad paths option '$other'")
      }
    }.getOrElse(Nil)
    val single = m.get("path").toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "graft-raster: no path given")
    all
  }

  private def isZarrStore(dir: java.nio.file.Path): Boolean =
    java.nio.file.Files.exists(dir.resolve("zarr.json")) ||
      java.nio.file.Files.exists(dir.resolve(".zgroup")) ||
      java.nio.file.Files.exists(dir.resolve(".zmetadata"))

  private def isGrib(p: java.nio.file.Path): Boolean = {
    val n = p.getFileName.toString.toLowerCase
    n.endsWith(".grib2") || n.endsWith(".grb2")
  }

  private def isTif(p: java.nio.file.Path): Boolean = {
    val n = p.getFileName.toString.toLowerCase
    n.endsWith(".tif") || n.endsWith(".tiff")
  }

  /** Expand user paths to concrete (kind, path) datasets. A plain
    * directory expands one level to its GRIB files and Zarr stores. */
  def datasets(paths: Seq[String]): Seq[(String, String)] = paths.flatMap { s =>
    val p = java.nio.file.Paths.get(s)
    require(java.nio.file.Files.exists(p), s"graft-raster: $s does not exist")
    if (java.nio.file.Files.isDirectory(p)) {
      if (isZarrStore(p)) Seq(("zarr", s))
      else {
        val members = java.nio.file.Files.list(p).iterator().asScala.toSeq
        val found = (members.filter(isGrib).map(f => ("grib", f.toString)) ++
          members.filter(isTif).map(f => ("tif", f.toString)) ++
          members.filter(d => java.nio.file.Files.isDirectory(d) &&
            isZarrStore(d)).map(d => ("zarr", d.toString))).sortBy(_._2)
        require(found.nonEmpty,
          s"graft-raster: directory $s holds no GRIB files, GeoTIFFs or " +
            "Zarr stores")
        found
      }
    } else if (isGrib(p)) Seq(("grib", s))
    else if (isTif(p)) Seq(("tif", s))
    else throw new IllegalArgumentException(
      s"graft-raster: $s is not a .grib2/.grb2/.tif file or Zarr store " +
        "(supported: GRIB2, GeoTIFF, Zarr v2/v3)")
  }
}

class GraftRasterTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-raster(${paths.mkString(",")})"
  override def schema(): StructType = GraftRasterTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(paths,
      Option(options.get("time_first")).map(_.toLong).getOrElse(0L),
      Option(options.get("time_delta")).map(_.toLong).getOrElse(3600000L))
}

class GraftScanBuilder(paths: Seq[String], timeFirst: Long, timeDelta: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var tMin = Long.MinValue
  private var tMax = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftRasterTable.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("t", _: Long) => true
      case GreaterThanOrEqual("t", _: Long) => true
      case LessThanOrEqual("t", _: Long) => true
      case GreaterThan("t", _: Long) => true
      case LessThan("t", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("t", v: Long) =>
        tMin = math.max(tMin, v); tMax = math.min(tMax, v)
      case GreaterThanOrEqual("t", v: Long) => tMin = math.max(tMin, v)
      case LessThanOrEqual("t", v: Long)    => tMax = math.min(tMax, v)
      case GreaterThan("t", v: Long) => tMin = math.max(tMin, v + 1)
      case LessThan("t", v: Long)    => tMax = math.min(tMax, v - 1)
      case _ =>
    }
    pushed = accepted
    // t-filters are fully enforced by partition pruning, but returning
    // them as residual is harmless and keeps semantics obvious
    residual ++ accepted
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new GraftScan(paths, tMin, tMax, required, timeFirst, timeDelta)
}

/** One frame of one dataset — everything the executor needs. For GRIB
  * the planned [[Grib.Field]] (all byte coordinates) rides along, so
  * the reader seeks straight to its bitmap + data ranges instead of
  * re-scanning the file's section heads per partition (which would be
  * O(frames²) per file across an archive's readers). */
case class GraftFramePartition(kind: String, path: String, frameIdx: Int,
    tMs: Long, w: Int, h: Int, gribField: Grib.Field = null)
    extends InputPartition

/** One GeoTIFF FILE (all surviving bands): bands share one decode, so
  * the partition unit is the file — parallelism comes from the archive
  * having many files, which is the multi-file scale case anyway. */
case class GraftTifPartition(path: String, frames: Array[Int],
    times: Array[Long], w: Int, h: Int) extends InputPartition

class GraftScan(paths: Seq[String], tMin: Long, tMax: Long,
    required: StructType, timeFirst: Long, timeDelta: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-raster pushed t in [$tMin, $tMax], " +
      s"columns [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // planning reads ONLY headers/metadata per dataset (GRIB section
    // heads, Zarr JSON + coordinate arrays) — no data payload bytes
    GraftRasterTable.datasets(paths).flatMap {
      case ("grib", p) =>
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(p),
          java.nio.file.StandardOpenOption.READ)
        try {
          val m = Grib.readMeta(ch, p)
          m.timesMs.zipWithIndex.collect {
            case (t, i) if t >= tMin && t <= tMax =>
              GraftFramePartition("grib", p, i, t, m.w, m.h, m.fields(i))
          }
        } finally ch.close()
      case ("zarr", p) =>
        val m = Zarr.readMeta(p)
        m.timesMs.zipWithIndex.collect {
          case (t, i) if t >= tMin && t <= tMax =>
            GraftFramePartition("zarr", p, i, t, m.w, m.h)
        }
      case ("tif", p) =>
        // header-only: IFD tag tables, no tile payload (GeoTIFF has no
        // embedded time axis — bands map to the time_first/time_delta
        // options, the RasterFileSource convention)
        val m = GeoTiff.readMeta(p)
        val sel = (0 until m.bandCount)
          .map(i => (i, timeFirst + i * timeDelta))
          .filter { case (_, t) => t >= tMin && t <= tMax }
        if (sel.isEmpty) Nil
        else Seq(GraftTifPartition(p, sel.map(_._1).toArray,
          sel.map(_._2).toArray, m.w, m.h))
      case (k, p) => throw new IllegalArgumentException(
        s"graft-raster: unknown dataset kind $k for $p")
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required.fieldNames)
}

class GraftReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftFramePartition => new GraftPartitionReader(p, columns)
      case p: GraftTifPartition   => new GraftTifReader(p, columns)
      case other => throw new IllegalArgumentException(
        s"graft-raster: unknown partition $other")
    }
}

/** Executor-side GeoTIFF reader: one decode serves every surviving
  * band; tiles stream out per (band, tile). */
class GraftTifReader(p: GraftTifPartition, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private lazy val bands: Seq[Array[Double]] = GeoTiff.read(p.path).bands
  private val nTx = TileLayout.tilesX(p.w)
  private val nTiles = TileLayout.numTiles(p.w, p.h)
  private val total = nTiles * p.frames.length
  private var i = -1
  private val pathU = UTF8String.fromString(p.path)

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    val f = i / nTiles
    val tile = i % nTiles
    val ty = tile / nTx
    val tx = tile % nTx
    new GenericInternalRow(columns.map[Any] {
      case "path" => pathU
      case "t"    => p.times(f)
      case "ty"   => ty
      case "tx"   => tx
      case "values" =>
        val frame = bands(p.frames(f))
        val tw = TileLayout.tileW(p.w, tx)
        val th = TileLayout.tileH(p.h, ty)
        val out = new Array[Double](tw * th)
        var r = 0
        while (r < th) {
          System.arraycopy(frame, (ty * TileLayout.TILE + r) * p.w +
            tx * TileLayout.TILE, out, r * tw, tw)
          r += 1
        }
        ArrayData.toArrayData(out)
      case other => throw new IllegalArgumentException(
        s"graft-raster: unknown column $other")
    })
  }

  override def close(): Unit = ()
}

/** Executor-side: decode ONE frame (only its byte ranges — GRIB fields
  * and Zarr chunks are independently addressable) and emit its tiles.
  * Column pruning reaches the payload: when `values` is not required
  * (a count, a time listing), NO data byte of the file is read — only
  * the per-frame tile geometry from the planned metadata. */
class GraftPartitionReader(p: GraftFramePartition, columns: Array[String])
    extends PartitionReader[InternalRow] {

  private lazy val frame: Array[Double] = p.kind match {
    case "grib" =>
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(p.path),
        java.nio.file.StandardOpenOption.READ)
      // the planned Field carries every byte coordinate: no metadata
      // re-scan, straight to this frame's bitmap + data ranges
      try Grib.decode(ch, p.gribField, Double.MaxValue)
      finally ch.close()
    case _ =>
      // zarr metadata (a few KB of JSON + 1-D coordinate arrays) is
      // re-read per partition: ArrayMeta carries filesystem Paths and
      // does not serialize, and the read is milliseconds against a
      // frame decode — unlike the GRIB case there is no per-frame
      // byte-coordinate table to ship
      val m = Zarr.readMeta(p.path)
      Zarr.readFrames(m, Seq(p.frameIdx)).head
  }

  private val nTx = TileLayout.tilesX(p.w)
  private val nTiles = TileLayout.numTiles(p.w, p.h)
  private var tile = -1
  private val pathU = UTF8String.fromString(p.path)

  override def next(): Boolean = { tile += 1; tile < nTiles }

  override def get(): InternalRow = {
    val ty = tile / nTx
    val tx = tile % nTx
    new GenericInternalRow(columns.map[Any] {
      case "path" => pathU
      case "t"    => p.tMs
      case "ty"   => ty
      case "tx"   => tx
      case "values" =>
        val tw = TileLayout.tileW(p.w, tx)
        val th = TileLayout.tileH(p.h, ty)
        val out = new Array[Double](tw * th)
        var i = 0
        while (i < th) {
          System.arraycopy(frame, (ty * TileLayout.TILE + i) * p.w +
            tx * TileLayout.TILE, out, i * tw, tw)
          i += 1
        }
        ArrayData.toArrayData(out)
      case other => throw new IllegalArgumentException(
        s"graft-raster: unknown column $other")
    })
  }

  override def close(): Unit = ()
}
