package graft.geometry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometry field operations (column algebra), after
  * `dask_geomodeling/geometry/field_operations.py`. Missing values follow
  * pandas semantics via SQL NULL; note the reproduced quirks: Python modulo
  * takes the divisor's sign, `Round` uses banker's rounding (np.around →
  * `bround`), and `Where`/`Mask` interpret a non-boolean condition as
  * not-null.
  */
trait BaseFieldOperation extends SeriesBlock {
  def a: Any
  def b: Any
  override def root: GeometryBlock = SeriesBlock.rootOf(Seq(a, b))
  protected def op(x: Column, y: Column): Column
  override final def column(df: DataFrame): Column =
    op(SeriesBlock.colOf(a, df), SeriesBlock.colOf(b, df))
}

object FieldOps {
  case class Add(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x + y
  }
  case class Subtract(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x - y
  }
  case class Multiply(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x * y
  }
  case class Divide(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x / y
  }
  case class FloorDivide(a: Any, b: Any) extends BaseFieldOperation {
    // np.floor_divide on float64 yields float64; Spark's floor() yields
    // BIGINT, so cast back to keep the numpy output dtype.
    protected def op(x: Column, y: Column): Column = floor(x / y).cast("double")
  }
  case class Power(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = pow(x, y)
  }
  case class Modulo(a: Any, b: Any) extends BaseFieldOperation {
    // Python %: result carries the divisor's sign
    protected def op(x: Column, y: Column): Column = ((x % y) + y) % y
  }
  case class Equal(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x === y
  }
  case class NotEqual(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x =!= y
  }
  case class Greater(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x > y
  }
  case class GreaterEqual(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x >= y
  }
  case class Less(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x < y
  }
  case class LessEqual(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x <= y
  }
  case class And(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x && y
  }
  case class Or(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = x || y
  }
  case class Xor(a: Any, b: Any) extends BaseFieldOperation {
    protected def op(x: Column, y: Column): Column = (x || y) && !(x && y)
  }

  case class Invert(source: SeriesBlock) extends SeriesBlock {
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = !source.column(df)
  }

  /** Keep source where cond holds, else `other`; non-boolean cond → notnull
    * (field_operations.py:577-619). */
  case class Where(source: SeriesBlock, cond: SeriesBlock, other: Any) extends SeriesBlock {
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = {
      val c = cond.column(df)
      when(coalesce(c.cast("boolean"), lit(false)), source.column(df))
        .otherwise(SeriesBlock.colOf(other, df))
    }
  }

  /** Replace where cond holds (field_operations.py:622-664). */
  case class Mask(source: SeriesBlock, cond: SeriesBlock, other: Any) extends SeriesBlock {
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = {
      val c = cond.column(df)
      when(coalesce(c.cast("boolean"), lit(false)), SeriesBlock.colOf(other, df))
        .otherwise(source.column(df))
    }
  }

  /** np.around → banker's rounding (field_operations.py:667-687). */
  case class Round(source: SeriesBlock, decimals: Int = 0) extends SeriesBlock {
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = bround(source.column(df), decimals)
  }

  /** pd.cut-style binning with label lookup; open bounds when
    * len(labels) == len(bins)+1 (field_operations.py:48-139). */
  case class Classify(source: SeriesBlock, bins: Seq[Double], labels: Seq[Any],
      right: Boolean = true) extends SeriesBlock {
    require(labels.size == bins.size - 1 || labels.size == bins.size + 1,
      s"Expected ${bins.size - 1} or ${bins.size + 1} labels, got ${labels.size}")
    require(labels.distinct.size == labels.size, "Labels should be unique")
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = {
      val v = source.column(df)
      val open = labels.size == bins.size + 1
      val edges: Seq[Double] =
        if (open) Double.NegativeInfinity +: bins :+ Double.PositiveInfinity else bins
      def labelLit(l: Any): Column = l match {
        case n: Int => lit(n.toDouble); case n: Long => lit(n.toDouble)
        case n: Double => lit(n); case s: String => lit(s)
        case other => lit(other.toString)
      }
      // interval membership ((a,b] when right, [a,b) otherwise)
      val chain = labels.zipWithIndex.foldLeft(when(v.isNull, lit(null))) {
        case (acc, (l, i)) =>
          val lo = edges(i); val hi = edges(i + 1)
          val cond =
            if (right) (lit(lo) === Double.NegativeInfinity || v > lo) && v <= hi
            else v >= lo && (lit(hi) === Double.PositiveInfinity || v < hi)
          acc.when(cond, labelLit(l))
      }
      chain.otherwise(lit(null))
    }
  }

  /** Per-row bin edges taken from other columns
    * (field_operations.py:142-252). */
  case class ClassifyFromColumns(source: GeometryBlock, valueColumn: String,
      binColumns: Seq[String], labels: Seq[Any], right: Boolean = true)
      extends SeriesBlock {
    require(labels.size == binColumns.size - 1 || labels.size == binColumns.size + 1,
      s"Expected ${binColumns.size - 1} or ${binColumns.size + 1} labels, got ${labels.size}")
    override def root: GeometryBlock = source
    override def column(df: DataFrame): Column = {
      val v = col(valueColumn)
      // index = count of edges the value lies beyond
      val idx = binColumns.foldLeft(lit(0)) { (acc, bc) =>
        acc + (if (right) when(v > col(bc), 1).otherwise(0)
               else when(v >= col(bc), 1).otherwise(0))
      }
      def labelLit(l: Any): Column = l match {
        case n: Int => lit(n.toDouble); case n: Long => lit(n.toDouble)
        case n: Double => lit(n); case s: String => lit(s)
        case other => lit(other.toString)
      }
      val open = labels.size == binColumns.size + 1
      val shifted = if (open) idx else idx - 1
      val chain = labels.zipWithIndex.foldLeft(when(v.isNull, lit(null))) {
        case (acc, (l, i)) => acc.when(shifted === i, labelLit(l))
      }
      chain.otherwise(lit(null))
    }
  }

  /** np.interp with left/right fills (field_operations.py:690-723). */
  case class Interp(source: SeriesBlock, xp: Seq[Double], fp: Seq[Double],
      left: Option[Double] = None, right: Option[Double] = None) extends SeriesBlock {
    require(xp.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)),
      "xp must be monotonically increasing")
    require(xp.size == fp.size, "xp and fp must have the same length")
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = {
      val v = source.column(df)
      val lo = left.getOrElse(fp.head)
      val hi = right.getOrElse(fp.last)
      var chain = when(v.isNull, lit(null)).when(isnan(v), lit(Double.NaN))
        .when(v < xp.head, lit(lo))
      for (i <- 0 until xp.size - 1) {
        val (x0, x1, f0, f1) = (xp(i), xp(i + 1), fp(i), fp(i + 1))
        val seg =
          if (x1 == x0) lit(f1)
          else lit(f0) + (v - x0) * ((f1 - f0) / (x1 - x0))
        chain = chain.when(v >= x0 && v < x1, seg)
      }
      chain.when(v === xp.last, lit(fp.last)).otherwise(lit(hi))
    }
  }

  /** Select per row among N series by integer selector; out-of-range → null
    * (field_operations.py:726-771). */
  case class Choose(source: SeriesBlock, choices: Seq[SeriesBlock]) extends SeriesBlock {
    require(choices.size >= 2, "The number of choices must be greater than one.")
    override def root: GeometryBlock = source.root
    override def column(df: DataFrame): Column = {
      val sel = source.column(df)
      choices.zipWithIndex.foldLeft(when(lit(false), lit(null))) {
        case (acc, (c, i)) => acc.when(sel === i, c.column(df))
      }.otherwise(lit(null))
    }
  }
}

/** Area of each feature in a target projection
  * (geometry/geom_operations.py:15-55): planar area after reprojecting each
  * coordinate through the Proj kernel (EPSG 4326/3857/28992). */
case class Area(source: GeometryBlock, targetProjection: String) extends SeriesBlock {
  override def root: GeometryBlock = source
  override def column(df: DataFrame): Column = {
    val from = graft.raster.Proj.normalize(source.projection)
    val to = graft.raster.Proj.normalize(targetProjection)
    if (from == to) GeomFunctions.stArea(col("geometry"))
    else GeomFunctions.stAreaInProjection(col("geometry"), lit(from), lit(to))
  }
}
