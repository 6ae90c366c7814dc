package graft.raster

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Block

/** Base trait of the temporal-raster Block family
  * (reference dask_geomodeling/raster/base.py:9-46).
  *
  * Plan metadata (period / timeDelta / extent / dtype / projection) is eager
  * and computed from children, as in the reference. Evaluation lowers to a
  * Spark DataFrame of tile rows on the *request* grid:
  *
  *   t: Long (epoch ms frame label) | ty, tx: Int | values: Array[Double]
  *
  * with the `TileLayout` tiling and row-major `values` per tile. The
  * reference's two-phase `get_sources_and_requests`/`process` becomes: each
  * operator rewrites the request for its children (pushdown / halo / clamp)
  * and declares the combination as DataFrame transforms — Catalyst owns the
  * physical plan.
  */
trait RasterBlock extends Block with RasterOps {

  /** (start, stop) instants of first/last frame; None when empty. */
  def period: Option[(Instant, Instant)]

  /** Frame spacing in ms; None if non-equidistant or non-temporal. */
  def timeDeltaMs: Option[Long]

  /** Data footprint in native projection; None when empty. */
  def extent: Option[Bbox]

  def projection: String

  def dtype: DType

  /** Whether results carry a real time axis (reference `temporal`). */
  def temporal: Boolean

  /** Native pixel size in projection units, when the block has one (used by
    * zonal statistics to pick a default sampling grid). */
  def cellSize: Option[Double] = None

  /** The nodata sentinel: dtype max by convention (utils.py:67-76);
    * overridable for deliberate out-of-range sentinels (HillShade's 256). */
  def noDataValue: Double = dtype.noDataValue

  /** All frame instants, ascending. Metadata-level — the reference obtains
    * this via `mode="time"` sub-requests during planning (SURVEY §3.1); in
    * the Spark design it is an eager plan-metadata function. */
  def allTimes: Seq[Instant]

  /** `snap_start_stop` (reference utils.py:848-915): both None → latest
    * frame; only start → single frame nearest to start; both → all frames in
    * the closed interval. */
  final def timesIn(start: Option[Instant], stop: Option[Instant]): Seq[Instant] = {
    val ts = allTimes
    if (ts.isEmpty) Seq.empty
    else (start, stop) match {
      case (None, _)        => Seq(ts.last)
      case (Some(s), None)  =>
        Seq(ts.minBy(t => (math.abs(t.toEpochMilli - s.toEpochMilli), t.toEpochMilli)))
      case (Some(s), Some(e)) =>
        ts.filter(t => !t.isBefore(s) && !t.isAfter(e))
    }
  }

  /** Per-frame metadata strings for the given frames (`mode="meta"`
    * responses, reference raster/base.py:37-46); None when the block type
    * carries no metadata. Propagated from the first metadata-bearing
    * source by the wrapper blocks. */
  def metaFor(times: Seq[Instant]): Option[Seq[String]] = None

  /** `mode="meta"` request: metadata of the snapped frames. */
  final def getMeta(req: RasterRequest): Option[Seq[String]] =
    metaFor(timesIn(req.start, req.stop))

  /** Nested meta: one list of contributing source meta strings per output
    * frame — the reference's `mode="meta"` shape for restructuring operators
    * (TemporalAggregate regroups meta per bin, temporal.py:716-720;
    * Cumulative accumulates within the bin, temporal.py:945-957). Blocks
    * that map frames 1:1 inherit singleton groups of `metaFor`. */
  def metaGroupsFor(times: Seq[Instant]): Option[Seq[Seq[String]]] =
    metaFor(times).map(_.map(Seq(_)))

  final def getMetaGroups(req: RasterRequest): Option[Seq[Seq[String]]] =
    metaGroupsFor(timesIn(req.start, req.stop))

  /** Lower `(this, request)` to the tile DataFrame described above. The
    * result has exactly `timesIn(start, stop).size × TileLayout.numTiles`
    * rows. Implementations must be pure plan construction (no actions). */
  def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame

  /** Collect a request into dense frame arrays — the `get_data` of the
    * single-request API, used by tests and exports. */
  final def getData(req: RasterRequest)(implicit spark: SparkSession): Option[RasterResult] = {
    val reqTimes = timesIn(req.start, req.stop)
    if (reqTimes.isEmpty) return None
    // the reference's request-size guards protect exactly this in-memory
    // materialization point (config.py:4-12); the distributed frame() plan
    // itself has no single-process materialization to protect
    RequestGuards.checkRaster(req, reqTimes.size)
    val rows = frame(req).collect()
    if (rows.isEmpty) return None
    // derive output times from the produced frames — operators like
    // TemporalSum restructure the time axis relative to their metadata
    val times = rows.map(_.getLong(0)).distinct.sorted.toSeq.map(Instant.ofEpochMilli)
    val byTime = rows.groupBy(_.getLong(0))
    val frames = times.map { t =>
      val full = Array.fill(req.width * req.height)(noDataValue)
      byTime.getOrElse(t.toEpochMilli, Array.empty[Row]).foreach { r =>
        val ty = r.getInt(1); val tx = r.getInt(2)
        val vals = r.getSeq[Double](3)
        val tw = TileLayout.tileW(req.width, tx)
        val th = TileLayout.tileH(req.height, ty)
        var i = 0
        while (i < th) {
          var j = 0
          while (j < tw) {
            full((ty * TileLayout.TILE + i) * req.width + (tx * TileLayout.TILE + j)) =
              vals(i * tw + j)
            j += 1
          }
          i += 1
        }
      }
      full
    }
    Some(RasterResult(times, req.width, req.height, frames.toArray, noDataValue))
  }
}

/** Row shape of the native tile format. */
case class TileRow(t: Long, ty: Int, tx: Int, values: Array[Double])

object RasterFrames {

  /** Distributed generation of a tile frame: one task group per tile range,
    * values produced by `gen(timeMs, ty, tx)` — used by sources and
    * rasterizers. Parallelism comes from `spark.range` over time×tile ids.
    */
  def generate(
      req: RasterRequest,
      times: Seq[Instant],
      gen: (Long, Int, Int) => Array[Double]
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nTx = TileLayout.tilesX(req.width)
    val nTiles = TileLayout.numTiles(req.width, req.height)
    val timesMs = times.map(_.toEpochMilli).toArray
    val n = timesMs.length.toLong * nTiles
    spark.range(n)
      .mapPartitions { it =>
        it.map { id =>
          val t = timesMs((id / nTiles).toInt)
          val tile = (id % nTiles).toInt
          val ty = tile / nTx
          val tx = tile % nTx
          TileRow(t, ty, tx, gen(t, ty, tx))
        }
      }
      .toDF("t", "ty", "tx", "values")
  }

  /** Align two frames of the same request for elementwise combination.
    * Sources with identical time axes join on (t, ty, tx); a single-frame
    * (non-temporal) operand is broadcast across the other side's time axis
    * (reference elemwise semantics, raster/elemwise.py:146-191). Returns the
    * joined frame with columns t, ty, tx, va, vb.
    */
  def align(a: DataFrame, aFrames: Int, b: DataFrame, bFrames: Int): DataFrame = {
    val an = a.select(col("t"), col("ty"), col("tx"), col("values").as("va"))
    val bn = b.select(col("t").as("t_b"), col("ty"), col("tx"), col("values").as("vb"))
    if (bFrames == 1)
      an.join(bn.drop("t_b"), Seq("ty", "tx"))
    else if (aFrames == bFrames)
      an.join(bn.withColumnRenamed("t_b", "t"), Seq("t", "ty", "tx"))
    else if (aFrames == 1)
      an.drop("t").join(bn.withColumnRenamed("t_b", "t"), Seq("ty", "tx"))
        .select(col("t"), col("ty"), col("tx"), col("va"), col("vb"))
    else
      throw new IllegalArgumentException(
        s"cannot align temporal rasters with $aFrames vs $bFrames frames")
  }
}
