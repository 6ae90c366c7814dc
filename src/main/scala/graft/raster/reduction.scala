package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stack-reduction statistics, after `dask_geomodeling/raster/reduction.py`.
  *
  * All statistics skip nodata. Cells with no data contributions yield 0 for
  * sum/count and nodata for everything else (reduce_rasters,
  * reduction.py:77-83). Percentiles use numpy's linear interpolation
  * (np.nanpercentile), reproduced exactly with sort + lerp expressions —
  * everything stays inside whole-stage codegen (no UDFs/UDAFs).
  */
object Statistics {

  val known: Set[String] = Set("first", "last", "count", "sum", "mean", "min",
    "max", "argmin", "argmax", "std", "var", "median", "product")

  /** Parse "p<number>" percentile statistics (reference utils
    * parse_percentile_statistic). */
  def percentileOf(statistic: String): Option[Double] =
    if (statistic.startsWith("p")) statistic.drop(1).toDoubleOption else None

  def validate(statistic: String): Unit =
    require(known.contains(statistic) || percentileOf(statistic).isDefined,
      s"""Unknown statistic "$statistic"""")

  /** Value for cells with zero data contributions (reduction.py:77-83). */
  def emptyValue(statistic: String, noData: Double): Double =
    if (statistic == "sum" || statistic == "count") 0.0 else noData

  /** Exact linear-interpolation percentile of a sorted array column. */
  private def percentileExpr(sorted: Column, n: Column, q: Double): Column = {
    val idx = (n - 1).cast("double") * (q / 100.0)
    val lo = floor(idx).cast("int")
    val frac = idx - lo.cast("double")
    val vLo = element_at(sorted, lo + 1)
    val vHi = element_at(sorted, least(lo + 2, n))
    vLo + (vHi - vLo) * frac
  }

  /** Fast path for folding a collected stack of tile arrays (array of
    * array<double>, in stack order) cellwise without materializing a
    * per-cell vector: a chain of `zip_with` folds, fully codegen-friendly.
    * Returns None for statistics that need the whole per-cell vector
    * (median/percentile/argmin/argmax/std/var) — callers fall back to the
    * generic per-cell path. */
  def foldStack(stack: Column, stat: String, nd: Double): Option[Column] = {
    def zeros = transform(element_at(stack, 1), _ => lit(0.0))
    def nds = transform(element_at(stack, 1), _ => lit(nd))
    def dataFold(merge: (Column, Column) => Column, init: Column): Column =
      aggregate(stack, init, (acc, arr) => zip_with(acc, arr, merge))
    def counts = dataFold((a, x) => a + when(x === nd, 0.0).otherwise(1.0), zeros)
    def sums = dataFold((a, x) => a + when(x === nd, 0.0).otherwise(x), zeros)
    stat match {
      case "sum" => Some(sums)
      case "count" => Some(counts)
      case "min" => Some(dataFold((a, x) =>
        when(x === nd, a).when(a === nd, x).otherwise(least(a, x)), nds))
      case "max" => Some(dataFold((a, x) =>
        when(x === nd, a).when(a === nd, x).otherwise(greatest(a, x)), nds))
      case "mean" => Some(zip_with(sums, counts,
        (s, c) => when(c === 0.0, lit(nd)).otherwise(s / c)))
      case "last" => Some(dataFold((a, x) => when(x === nd, a).otherwise(x), nds))
      case "first" => Some(dataFold((a, x) =>
        when(a === nd && x =!= nd, x).otherwise(a), nds))
      case _ => None
    }
  }

  /** Statistic over `data` (array with nodata already removed, in stack
    * order); `full` is the original array including nodata sentinels (used
    * by argmin/argmax to recover stack positions). */
  def over(data: Column, full: Column, statistic: String, noData: Double): Column = {
    val n = size(data)
    val stat = statistic match {
      case "first"   => element_at(data, 1)
      case "last"    => element_at(data, -1)
      case "count"   => n.cast("double")
      case "sum"     => aggregate(data, lit(0.0), (acc, x) => acc + x)
      case "product" => aggregate(data, lit(1.0), (acc, x) => acc * x)
      case "min"     => array_min(data)
      case "max"     => array_max(data)
      case "mean"    => aggregate(data, lit(0.0), (acc, x) => acc + x) / n
      case "var" =>
        val mean = aggregate(data, lit(0.0), (acc, x) => acc + x) / n
        aggregate(data, lit(0.0), (acc, x) => acc + (x - mean) * (x - mean)) / n
      case "std" =>
        val mean = aggregate(data, lit(0.0), (acc, x) => acc + x) / n
        sqrt(aggregate(data, lit(0.0), (acc, x) => acc + (x - mean) * (x - mean)) / n)
      case "median"  => percentileExpr(array_sort(data), n, 50.0)
      case "argmin"  => (array_position(full, array_min(data)) - 1).cast("double")
      case "argmax"  => (array_position(full, array_max(data)) - 1).cast("double")
      case other =>
        percentileOf(other) match {
          case Some(q) => percentileExpr(array_sort(data), n, q)
          case None => throw new IllegalArgumentException(s"Unknown statistic $other")
        }
    }
    when(n === 0, lit(emptyValue(statistic, noData))).otherwise(stat)
  }
}

/** Reduce a stack of aligned rasters cellwise with a statistic, skipping
  * nodata (BaseReduction, reduction.py:122-212). Extent is the *union* of
  * sources; period the intersection (via BaseElementwise). */
trait BaseReduction extends ElemwiseBase {
  def rasters: Seq[RasterBlock]
  def statistic: String
  override def operands: Seq[Any] = rasters
  override def extent: Option[Bbox] = {
    val es = rasters.flatMap(_.extent)
    if (es.isEmpty) None else Some(es.reduce(_ union _))
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val creq = clamp(req)
    val nd = noDataValue
    val counts = sourceFrameCounts(creq)
    // normalize each source's sentinel to the output sentinel, then fold an
    // aligned join accumulating one array column per source
    val frames = rasters.zip(counts).map { case (r, c) =>
      val rNd = r.noDataValue
      val f = r.frame(creq).select(col("t"), col("ty"), col("tx"),
        (if (r.dtype == DType.Bool) col("values")
         else transform(col("values"), x => when(x === rNd, lit(nd)).otherwise(x))).as("values"))
      (f, c)
    }
    // n-ary aligned join on (t, ty, tx); single-frame sources broadcast
    // across the time axis of the temporal ones
    var df = frames.head._1.withColumnRenamed("values", "v0")
    var count = frames.head._2
    frames.tail.zipWithIndex.foreach { case ((f, c), i) =>
      val fi = f.withColumnRenamed("values", s"v${i + 1}")
      df =
        if (c == count && c > 1) df.join(fi, Seq("t", "ty", "tx"))
        else if (c == 1) df.join(fi.drop("t"), Seq("ty", "tx"))
        else if (count == 1) df.drop("t").join(fi, Seq("ty", "tx"))
        else throw new IllegalArgumentException("cannot align reduction sources")
      count = math.max(count, c)
    }
    reduceColumns(df, rasters.indices.map(i => col(s"v$i")), nd)
  }

  private def reduceColumns(df: DataFrame, vs: Seq[Column], nd: Double): DataFrame = {
    val stat = statistic
    val out = transform(vs.head, (x0, i) => {
      val full = array(x0 +: vs.tail.map(v => element_at(v, i + 1)): _*)
      val data = filter(full, x => x =!= nd)
      Statistics.over(data, full, stat, nd)
    })
    df.select(col("t"), col("ty"), col("tx"), out.as("values"))
  }
}

/** Cellwise maximum of rasters, ignoring nodata — the reference's only
  * public reduction block (reduction.py:215-230). Keeps the plain promoted
  * dtype (no int32 bump). */
case class Max(rasters: Seq[RasterBlock]) extends BaseReduction {
  require(rasters.nonEmpty, "Max needs at least one raster")
  override def statistic: String = "max"
  override def dtype: DType = Elemwise.promoteAll(rasters)
}

/** General reduction with any supported statistic — exposed in this engine
  * beyond the reference's public API (reduce_rasters as an operator). */
case class Reduce(rasters: Seq[RasterBlock], statistic: String) extends BaseReduction {
  require(rasters.nonEmpty, "Reduce needs at least one raster")
  Statistics.validate(statistic)
  override def dtype: DType =
    DType.statResult(Elemwise.promoteAll(rasters), statistic)
}
