package graft.raster

import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Elementwise raster blocks, after `dask_geomodeling/raster/elemwise.py`.
  *
  * Semantics reproduced from the reference:
  *  - period / extent are the *intersection* of the sources
  *    (elemwise.py:96-132); a vals request with both start and stop is
  *    clamped to the own period (:64-78);
  *  - dtype promotes to at least int32 / float32 for math
  *    (elemwise.py:134-144); Divide and Exp/Log to at least float32
  *    (:374-380, :765-777); comparisons/logicals → bool (:204-232);
  *  - nodata propagates: any-input-nodata → output nodata; comparisons
  *    yield False on nodata except NotEqual which yields True; non-finite
  *    results (inf/nan, e.g. log of negatives) become nodata
  *    (wrap_math_process_func, elemwise.py:235-299).
  *
  * On Spark everything stays inside whole-stage codegen: the per-cell kernel
  * is a `zip_with` / `transform` higher-order expression over the tile
  * `values` arrays — no UDFs on the hot path.
  */
object Elemwise {

  def rasterOperands(ops: Seq[Any]): Seq[RasterBlock] =
    ops.collect { case r: RasterBlock => r }

  /** numpy-NEP50-style contribution of a scalar operand to promotion:
    * a whole number acts as a weak int (no promotion); a fractional one as
    * a weak float64. */
  def scalarDType(v: Double): Option[DType] =
    if (v.isWhole && !v.isInfinite) None else Some(DType.F8)

  def operandDType(op: Any): Option[DType] = op match {
    case r: RasterBlock => Some(r.dtype)
    case b: Boolean     => Some(DType.Bool)
    case n: Int         => scalarDType(n.toDouble)
    case n: Long        => scalarDType(n.toDouble)
    case n: Double      => scalarDType(n)
    case n: Float       => scalarDType(n.toDouble)
    case other => throw new IllegalArgumentException(s"operand $other not allowed")
  }

  /** Numeric value of a scalar operand; Boolean maps to 1/0 (numpy bool
    * arithmetic), matching what `operandDType` accepts for promotion. */
  def scalarValue(s: Any): Double = s match {
    case b: Boolean => if (b) 1.0 else 0.0
    case other      => other.toString.toDouble
  }

  def promoteAll(ops: Seq[Any]): DType = {
    val ds = ops.flatMap(operandDType)
    require(ds.nonEmpty, "need at least one raster operand")
    ds.reduce(DType.promote)
  }

  /** Math result dtype: promote to ≥ int32 / float32 (elemwise.py:134-144). */
  def mathDType(ops: Seq[Any]): DType = {
    val d = promoteAll(ops)
    if (d.isFloat) DType.promote(d, DType.F4) else DType.promote(d, DType.I4)
  }

  def periodIntersection(srcs: Seq[RasterBlock]): Option[(Instant, Instant)] = {
    if (srcs.size == 1) return srcs.head.period
    val ps = srcs.map(_.period)
    if (ps.exists(_.isEmpty)) return None
    val start = ps.flatten.map(_._1).max
    val stop = ps.flatten.map(_._2).min
    if (stop.isBefore(start)) None else Some((start, stop))
  }

  def extentIntersection(srcs: Seq[RasterBlock]): Option[Bbox] = {
    if (srcs.size == 1) srcs.head.extent
    else {
      val es = srcs.map(_.extent)
      if (es.exists(_.isEmpty)) None
      else es.flatten.tail.foldLeft(Option(es.flatten.head)) { (acc, b) =>
        acc.flatMap(_.intersect(b))
      }
    }
  }

  def commonDelta(srcs: Seq[RasterBlock]): Option[Long] = {
    val ds = srcs.map(_.timeDeltaMs)
    if (srcs.size == 1) ds.head
    else if (ds.exists(_.isEmpty)) None
    else ds.head
  }
}

/** Shared metadata of all elementwise blocks. */
trait ElemwiseBase extends RasterBlock {
  def operands: Seq[Any]
  final def srcs: Seq[RasterBlock] = Elemwise.rasterOperands(operands)

  override def temporal: Boolean = srcs.head.temporal
  override def timeDeltaMs: Option[Long] = Elemwise.commonDelta(srcs)
  override def period: Option[(Instant, Instant)] = Elemwise.periodIntersection(srcs)
  override def extent: Option[Bbox] = Elemwise.extentIntersection(srcs)
  override def projection: String = srcs.head.projection
  override def cellSize: Option[Double] = srcs.flatMap(_.cellSize).headOption
  override def metaFor(times: Seq[Instant]): Option[Seq[String]] =
    srcs.view.flatMap(s => s.metaFor(times)).headOption

  override def allTimes: Seq[Instant] = period match {
    case None => Seq.empty
    case Some((p0, p1)) =>
      val ref = srcs.find(_.temporal).getOrElse(srcs.head)
      ref.allTimes.filter(t => !t.isBefore(p0) && !t.isAfter(p1))
  }

  /** Clamp a request with both start and stop to the own period
    * (elemwise.py:64-78). */
  protected def clamp(req: RasterRequest): RasterRequest = (req.start, req.stop, period) match {
    case (Some(s), Some(e), Some((p0, p1))) =>
      req.copy(start = Some(if (s.isBefore(p0)) p0 else s),
               stop = Some(if (e.isAfter(p1)) p1 else e))
    case _ => req
  }

  /** Number of frames each source contributes for the (clamped) request. */
  protected def sourceFrameCounts(req: RasterRequest): Seq[Int] =
    srcs.map(_.timesIn(req.start, req.stop).size)
}

/** Binary math/comparison base: one or both operands are rasters, the other
  * may be a scalar (BaseMath, elemwise.py:194-201). */
trait BinaryElemwise extends ElemwiseBase {
  def a: Any
  def b: Any
  override def operands: Seq[Any] = Seq(a, b)

  /** The per-cell kernel on data (non-nodata) values. */
  protected def kernel(x: Column, y: Column): Column
  /** Value produced where any input is nodata. */
  protected def atNoData: Double = noDataValue
  /** Whether non-finite kernel results map to nodata (math ops do). */
  protected def guardNonFinite: Boolean = true

  private def operandNoData(op: Any): Option[Double] = op match {
    case r: RasterBlock if r.dtype != DType.Bool => Some(r.noDataValue)
    case _ => None
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val creq = clamp(req)
    val outNd = atNoData
    def guarded(x: Column, y: Column, nds: Seq[Double]): Column = {
      val r = kernel(x, y)
      val base =
        if (guardNonFinite)
          when(isnan(r) || r === Double.PositiveInfinity || r === Double.NegativeInfinity
            || (if (dtype == DType.F4) abs(r) > Float.MaxValue.toDouble else lit(false)),
            lit(outNd)).otherwise(r)
        else r
      nds.foldLeft(base)((acc, nd) => when(x === nd || y === nd, lit(outNd)).otherwise(acc))
    }
    (a, b) match {
      case (ra: RasterBlock, rb: RasterBlock) =>
        val counts = sourceFrameCounts(creq)
        val joined = RasterFrames.align(ra.frame(creq), counts(0), rb.frame(creq), counts(1))
        val ndA = operandNoData(ra)
        val ndB = operandNoData(rb)
        joined.select(col("t"), col("ty"), col("tx"),
          zip_with(col("va"), col("vb"), (x, y) => {
            val r = kernel(x, y)
            val base =
              if (guardNonFinite)
                when(isnan(r) || r === Double.PositiveInfinity || r === Double.NegativeInfinity
                  || (if (dtype == DType.F4) abs(r) > Float.MaxValue.toDouble else lit(false)),
                  lit(outNd)).otherwise(r)
              else r
            val withA = ndA.map(nd => when(x === nd, lit(outNd)).otherwise(base)).getOrElse(base)
            ndB.map(nd => when(y === nd, lit(outNd)).otherwise(withA)).getOrElse(withA)
          }).as("values"))
      case (ra: RasterBlock, s) =>
        val sv = lit(Elemwise.scalarValue(s))
        val ndA = operandNoData(ra)
        ra.frame(creq).select(col("t"), col("ty"), col("tx"),
          transform(col("values"), x => guarded(x, sv, ndA.toSeq)).as("values"))
      case (s, rb: RasterBlock) =>
        val sv = lit(Elemwise.scalarValue(s))
        val ndB = operandNoData(rb)
        rb.frame(creq).select(col("t"), col("ty"), col("tx"),
          transform(col("values"), y => guarded(sv, y, ndB.toSeq)).as("values"))
      case _ => throw new IllegalArgumentException("at least one operand must be a raster")
    }
  }
}

trait BinaryMath extends BinaryElemwise {
  override def dtype: DType = Elemwise.mathDType(operands)
}

/** Comparisons: bool result; nodata → False except NotEqual → True
  * (elemwise.py:204-232, 278-283). */
trait BinaryComparison extends BinaryElemwise {
  override def dtype: DType = DType.Bool
  protected def cmp(x: Column, y: Column): Column
  override protected final def kernel(x: Column, y: Column): Column =
    when(cmp(x, y), 1.0).otherwise(0.0)
  override protected def atNoData: Double = 0.0
  override protected def guardNonFinite: Boolean = false
}

case class Add(a: Any, b: Any) extends BinaryMath {
  protected def kernel(x: Column, y: Column): Column = x + y
}
case class Subtract(a: Any, b: Any) extends BinaryMath {
  protected def kernel(x: Column, y: Column): Column = x - y
}
case class Multiply(a: Any, b: Any) extends BinaryMath {
  protected def kernel(x: Column, y: Column): Column = x * y
}
case class Divide(a: Any, b: Any) extends BinaryMath {
  override def dtype: DType = DType.promote(DType.F4, Elemwise.promoteAll(operands))
  protected def kernel(x: Column, y: Column): Column = x / y
}
case class Power(a: Any, b: Any) extends BinaryMath {
  override def dtype: DType = {
    // negative integer exponents are cast to float (elemwise.py:383-406)
    val bAdj: Any = b match {
      case i: Int if i < 0     => i.toDouble + 0.5 // force float contribution
      case l: Long if l < 0    => l.toDouble + 0.5
      case d: Double if d < 0 && d.isWhole => d + 0.5
      case other               => other
    }
    Elemwise.mathDType(Seq(a, bAdj))
  }
  protected def kernel(x: Column, y: Column): Column = pow(x, y)
}

case class Equal(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x === y
}
case class NotEqual(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x =!= y
  override protected def atNoData: Double = 1.0
}
case class Greater(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x > y
}
case class GreaterEqual(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x >= y
}
case class Less(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x < y
}
case class LessEqual(a: Any, b: Any) extends BinaryComparison {
  protected def cmp(x: Column, y: Column): Column = x <= y
}

/** Logical ops on boolean rasters (elemwise.py:641-697). */
trait BinaryLogic extends BinaryElemwise {
  override def dtype: DType = DType.Bool
  override protected def atNoData: Double = 0.0
  override protected def guardNonFinite: Boolean = false
}
case class And(a: Any, b: Any) extends BinaryLogic {
  protected def kernel(x: Column, y: Column): Column =
    when(x =!= 0.0 && y =!= 0.0, 1.0).otherwise(0.0)
}
case class Or(a: Any, b: Any) extends BinaryLogic {
  protected def kernel(x: Column, y: Column): Column =
    when(x =!= 0.0 || y =!= 0.0, 1.0).otherwise(0.0)
}
case class Xor(a: Any, b: Any) extends BinaryLogic {
  protected def kernel(x: Column, y: Column): Column =
    when((x =!= 0.0) =!= (y =!= 0.0), 1.0).otherwise(0.0)
}

/** Unary elementwise over one raster source. */
trait UnaryElemwise extends ElemwiseBase {
  def x: RasterBlock
  override def operands: Seq[Any] = Seq(x)
  protected def kernel(v: Column): Column

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame =
    x.frame(clamp(req)).select(col("t"), col("ty"), col("tx"),
      transform(col("values"), v => kernel(v)).as("values"))
}

/** Invert a boolean raster (~, elemwise.py:551-579). */
case class Invert(x: RasterBlock) extends UnaryElemwise {
  require(x.dtype == DType.Bool, "input must have boolean dtype")
  override def dtype: DType = DType.Bool
  protected def kernel(v: Column): Column = when(v === 0.0, 1.0).otherwise(0.0)
}

/** True where data (elemwise.py:582-638). */
case class IsData(x: RasterBlock) extends UnaryElemwise {
  override def dtype: DType = DType.Bool
  protected def kernel(v: Column): Column =
    if (x.dtype == DType.Bool) lit(1.0)
    else when(v === x.noDataValue, 0.0).otherwise(1.0)
}

/** True where nodata. */
case class IsNoData(x: RasterBlock) extends UnaryElemwise {
  override def dtype: DType = DType.Bool
  protected def kernel(v: Column): Column =
    if (x.dtype == DType.Bool) lit(0.0)
    else when(v === x.noDataValue, 1.0).otherwise(0.0)
}

trait BaseLogExp extends UnaryElemwise {
  require(x.dtype != DType.Bool, "input block must not have boolean dtype")
  override def dtype: DType = DType.promote(DType.F4, Elemwise.promoteAll(Seq(x)))
  protected def fn(v: Column): Column
  override protected final def kernel(v: Column): Column = {
    val r = fn(v)
    val nd = noDataValue
    // SQL log/log10 yield NULL on non-positive input (numpy yields nan/-inf);
    // both map to nodata here, hence the coalesce.
    coalesce(
      when(v === x.noDataValue, lit(nd))
        .when(isnan(r) || r === Double.PositiveInfinity || r === Double.NegativeInfinity
          || (if (dtype == DType.F4) abs(r) > Float.MaxValue.toDouble else lit(false)), lit(nd))
        .otherwise(r),
      lit(nd))
  }
}
case class Exp(x: RasterBlock) extends BaseLogExp {
  protected def fn(v: Column): Column = exp(v)
}
case class Log(x: RasterBlock) extends BaseLogExp {
  protected def fn(v: Column): Column = log(v)
}
case class Log10(x: RasterBlock) extends BaseLogExp {
  protected def fn(v: Column): Column = log10(v)
}

/** N-ary coalesce: paints sources left→right, nodata transparent, so the
  * *rightmost* data value wins (elemwise.py:700-757). */
case class FillNoData(rasters: Seq[RasterBlock]) extends ElemwiseBase {
  require(rasters.nonEmpty, "FillNoData needs at least one raster")
  override def operands: Seq[Any] = rasters
  override def dtype: DType = Elemwise.promoteAll(rasters)

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val creq = clamp(req)
    val outNd = noDataValue
    val counts = sourceFrameCounts(creq)
    val first = rasters.head.frame(creq).select(col("t"), col("ty"), col("tx"),
      transform(col("values"),
        x => when(x === rasters.head.noDataValue, lit(outNd)).otherwise(x)).as("values"))
    rasters.tail.zip(counts.tail).zip(rasters.tail.map(_.noDataValue))
      .foldLeft((first, counts.head)) { case ((accDf, accFrames), ((r, rFrames), rNd)) =>
        val joined = RasterFrames.align(accDf, accFrames, r.frame(creq), rFrames)
        val merged = joined.select(col("t"), col("ty"), col("tx"),
          zip_with(col("va"), col("vb"),
            (acc, x) => when(x === rNd, acc).otherwise(x)).as("values"))
        (merged, math.max(accFrames, rFrames))
      }._1
  }
}
