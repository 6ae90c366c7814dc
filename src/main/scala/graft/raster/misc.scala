package graft.raster

import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Miscellaneous raster blocks, after `dask_geomodeling/raster/misc.py`. */

/** Smallest uint dtype that can represent `v` (reference utils.py:100-108). */
object MiscDTypes {
  def uintFor(v: Double): DType =
    if (v <= 255) DType.U1 else if (v <= 65535) DType.U2
    else if (v <= 4294967295L) DType.U4 else DType.U8
  def intFor(v: Double): DType =
    if (v >= -128 && v <= 127) DType.I1
    else if (v >= -32768 && v <= 32767) DType.I2
    else if (v >= Int.MinValue && v <= Int.MaxValue) DType.I4 else DType.I8
}

/** Single-store block: metadata passes through from the store; the kernel is
  * a per-cell `transform` over the tile arrays (the reference's BaseSingle
  * pattern, raster/base.py). */
trait BaseSingleRaster extends RasterBlock {
  def store: RasterBlock
  override def period: Option[(Instant, Instant)] = store.period
  override def timeDeltaMs: Option[Long] = store.timeDeltaMs
  override def extent: Option[Bbox] = store.extent
  override def projection: String = store.projection
  override def temporal: Boolean = store.temporal
  override def dtype: DType = store.dtype
  override def allTimes: Seq[Instant] = store.allTimes
  override def cellSize: Option[Double] = store.cellSize
  override def metaFor(times: Seq[Instant]): Option[Seq[String]] = store.metaFor(times)

  /** Per-cell transform; identity by default (blocks overriding `frame`
    * directly don't use it). */
  protected def kernel(v: Column): Column = v

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame =
    store.frame(req).select(col("t"), col("ty"), col("tx"),
      transform(col("values"), v => kernel(v)).as("values"))
}

/** Clip `store` to the data footprint of `source`: cells where `source` has
  * nodata (or False for boolean sources) become nodata
  * (misc.py:30-166). */
case class Clip(store: RasterBlock, source: RasterBlock) extends RasterBlock {
  require(store.temporal == source.temporal,
    "The values raster and clipping mask must both be temporal or both non-temporal. Consider using Snap.")
  require(!store.temporal || store.timeDeltaMs == source.timeDeltaMs,
    "Time resolution of the clipping mask does not match that of the values raster. Consider using Snap.")

  override def period: Option[(Instant, Instant)] =
    Elemwise.periodIntersection(Seq(store, source))
  override def timeDeltaMs: Option[Long] = store.timeDeltaMs
  override def extent: Option[Bbox] = Elemwise.extentIntersection(Seq(store, source))
  override def projection: String = store.projection
  override def temporal: Boolean = store.temporal
  override def dtype: DType = store.dtype
  override def cellSize: Option[Double] = store.cellSize
  override def allTimes: Seq[Instant] = period match {
    case None => Seq.empty
    case Some((p0, p1)) => store.allTimes.filter(t => !t.isBefore(p0) && !t.isAfter(p1))
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val nd = noDataValue
    val counts = Seq(store.timesIn(req.start, req.stop).size,
      source.timesIn(req.start, req.stop).size)
    val joined = RasterFrames.align(store.frame(req), counts(0), source.frame(req), counts(1))
    val maskNoData: Column => Column =
      if (source.dtype == DType.Bool) (m: Column) => m === 0.0
      else (m: Column) => m === source.noDataValue
    joined.select(col("t"), col("ty"), col("tx"),
      zip_with(col("va"), col("vb"),
        (v, m) => when(maskNoData(m), lit(nd)).otherwise(v)).as("values"))
  }
}

/** Replace all data values with one constant; nodata sentinel becomes
  * 1 when value==0 else 0 (misc.py:169-222). */
case class Mask(store: RasterBlock, value: Double) extends BaseSingleRaster {
  override def dtype: DType =
    if (!value.isWhole) DType.F4
    else if (value >= 0) MiscDTypes.uintFor(value)
    else MiscDTypes.intFor(value)
  private def fill: Double = if (value == 0) 1.0 else 0.0
  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val (nd, f, v) = (store.noDataValue, fill, value)
    store.frame(req).select(col("t"), col("ty"), col("tx"),
      transform(col("values"), x => when(x === nd, lit(f)).otherwise(lit(v))).as("values"))
  }
  override protected def kernel(v: Column): Column = v // unused; frame overridden
  /** The sentinel deviates from dtype-max here (misc.py:192-194). */
  def maskNoDataValue: Double = fill
}

/** Cells strictly below `value` become nodata (misc.py:225-251). */
case class MaskBelow(store: RasterBlock, value: Double) extends BaseSingleRaster {
  override protected def kernel(v: Column): Column =
    when(v < value && v =!= store.noDataValue, lit(store.noDataValue)).otherwise(v)
}

/** Step function: left if x<value, at if x==value, right if x>value;
  * nodata preserved (misc.py:254-328). */
case class Step(
    store: RasterBlock,
    left: Double = 0,
    right: Double = 1,
    value: Double = 0,
    atOpt: Option[Double] = None
) extends BaseSingleRaster {
  def at: Double = atOpt.getOrElse((left + right) / 2)
  override protected def kernel(v: Column): Column =
    when(v === store.noDataValue, v)
      .when(v < value, lit(left))
      .when(v === value, lit(at))
      .otherwise(lit(right))
}

/** `np.digitize` binning: returns the bin index, 0 = below the first edge,
  * len(bins) = above the last; output dtype is the smallest uint fitting
  * len(bins)+2 and nodata maps to its max (misc.py:331-399). */
case class Classify(store: RasterBlock, bins: Seq[Double], right: Boolean = false)
    extends BaseSingleRaster {
  require(bins.nonEmpty && bins.sliding(2).forall(p => p.size < 2 || p(0) < p(1)),
    "'bins' should be monotonic increasing")
  override def dtype: DType = MiscDTypes.uintFor(bins.size + 2)
  override protected def kernel(v: Column): Column = {
    val nd = noDataValue
    // np.digitize: right=False → index of first edge > v; right=True → >= v
    val idx = bins.foldLeft(lit(0)) { (acc, edge) =>
      acc + (if (right) when(v > edge, 1).otherwise(0)
             else when(v >= edge, 1).otherwise(0))
    }
    when(v === store.noDataValue, lit(nd)).otherwise(idx.cast("double"))
  }
}

/** Map listed [from, to] pairs; unlisted cells keep their value, or become
  * nodata when `select` (misc.py:402-515). Output dtype follows the target
  * values (all-integral → int64, otherwise float64, as numpy infers). */
case class Reclassify(store: RasterBlock, data: Seq[(Double, Double)], select: Boolean = false)
    extends BaseSingleRaster {
  require(store.dtype == DType.Bool || store.dtype.isInt,
    "The store must be of boolean or integer datatype")
  require(data.map(_._1).distinct.size == data.size,
    "There are duplicates in the reclassify values")
  override def dtype: DType =
    if (data.forall(_._2.isWhole)) DType.I8 else DType.F8

  override protected def kernel(v: Column): Column = {
    val nd = noDataValue
    val mapped = data.foldLeft(when(v === store.noDataValue, lit(nd))) {
      case (acc, (from, to)) => acc.when(v === from, lit(to))
    }
    if (select) mapped.otherwise(lit(nd)) else mapped.otherwise(v)
  }
}
