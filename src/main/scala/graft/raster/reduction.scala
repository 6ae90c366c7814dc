package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stack-reduction statistics, after `dask_geomodeling/raster/reduction.py`.
  *
  * All statistics skip nodata. Cells with no data contributions yield 0 for
  * sum/count and nodata for everything else (reduce_rasters,
  * reduction.py:77-83). Percentiles use numpy's linear interpolation
  * (np.nanpercentile). The fold runs as a per-tile primitive-loop kernel:
  * Spark's higher-order `aggregate`/`zip_with` evaluate interpreted, so a
  * single while-loop pass over the stack beats the HOF chain by an order
  * of magnitude on 64k-cell tiles (the measured r1 per-row-kernel lesson).
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

  /** One-pass primitive kernel over a stack of equal-length tile arrays:
    * per output cell, fold every stack entry with while loops. Spark's
    * higher-order `aggregate`/`zip_with` folds evaluate interpreted (outside
    * whole-stage codegen) and re-walk the accumulator array per stack entry
    * — the measured per-row-kernel lesson (NOTES r1: 200× on MinHash)
    * applies equally here. Handles every known statistic plus `"rawsum"`,
    * the nodata-oblivious plain sum of `TemporalSum` (temporal.py:239-255).
    */
  def stackKernel(stat: String, nd: Double): Column => Column = {
    val q: Double = stat match {
      case "median" => 50.0
      case other    => percentileOf(other).getOrElse(Double.NaN)
    }
    val empty = emptyValue(stat, nd)
    val f = udf { (stack: Seq[Seq[Double]]) =>
      val m = stack.length
      val arrs = new Array[Array[Double]](m)
      var i = 0
      while (i < m) { arrs(i) = stack(i).toArray; i += 1 }
      val n = if (m == 0) 0 else arrs(0).length
      val out = new Array[Double](n)
      val buf = new Array[Double](m) // percentile gather scratch
      var j = 0
      while (j < n) {
        var cnt = 0; var sum = 0.0; var raw = 0.0; var prod = 1.0
        var min = Double.MaxValue; var max = -Double.MaxValue
        var argmin = -1; var argmax = -1
        var firstV = nd; var lastV = nd
        var hasNaN = false; var firstNaN = -1
        i = 0
        while (i < m) {
          val v = arrs(i)(j)
          raw += v
          if (v != nd) {
            if (firstV == nd && cnt == 0) firstV = v
            lastV = v
            sum += v; prod *= v
            if (v.isNaN) {
              // SQL ordering treats NaN as greater than any value: max/
              // argmax select it, min/argmin never do (unless all-NaN)
              if (!hasNaN) { hasNaN = true; firstNaN = i }
            } else {
              if (v < min) { min = v; argmin = i }
              if (v > max) { max = v; argmax = i }
            }
            buf(cnt) = v
            cnt += 1
          }
          i += 1
        }
        if (hasNaN) {
          max = Double.NaN
          argmax = firstNaN
          if (argmin < 0) { min = Double.NaN; argmin = firstNaN }
        }
        out(j) =
          if (stat == "rawsum") raw
          else if (cnt == 0) empty
          else stat match {
            case "sum"     => sum
            case "count"   => cnt.toDouble
            case "mean"    => sum / cnt
            case "min"     => min
            case "max"     => max
            case "first"   => firstV
            case "last"    => lastV
            case "product" => prod
            case "argmin"  => argmin.toDouble
            case "argmax"  => argmax.toDouble
            case "var" | "std" =>
              val mean = sum / cnt
              var ss = 0.0; var k = 0
              while (k < cnt) { val d = buf(k) - mean; ss += d * d; k += 1 }
              if (stat == "var") ss / cnt else math.sqrt(ss / cnt)
            case _ => // median / pXX: numpy linear interpolation
              java.util.Arrays.sort(buf, 0, cnt)
              val idx = (cnt - 1) * (q / 100.0)
              val lo = math.floor(idx).toInt
              val hi = math.min(lo + 1, cnt - 1)
              buf(lo) + (buf(hi) - buf(lo)) * (idx - lo)
          }
        j += 1
      }
      out
    }
    (c: Column) => f(c)
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
    // stack the aligned source arrays and fold with the primitive kernel —
    // the nested HOF formulation (transform + filter + aggregate per cell)
    // evaluates interpreted and re-derives the per-cell vector repeatedly
    val out = Statistics.stackKernel(statistic, nd)(array(vs: _*))
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
