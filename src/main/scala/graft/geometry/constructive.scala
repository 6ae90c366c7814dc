package graft.geometry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constructive and set-theoretic geometry blocks, after
  * `dask_geomodeling/geometry/constructive.py` and `set_operations.py`.
  * Kernels run on JTS (shapely's JVM counterpart). */

/** Buffer each geometry by `distance` (quadrant-segment resolution as in
  * shapely, constructive.py:13-89). */
case class Buffer(source: GeometryBlock, distance: Double,
    bufferProjection: String, resolution: Int = 16) extends GeometryBlock {
  override def columns: Set[String] = source.columns
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    // grow the spatial filter so buffered geometries at the edge still match
    val expanded = req.copy(geometryWkt = None)
    source.frame(expanded).withColumn("geometry",
      GeomFunctions.stBuffer(col("geometry"), lit(distance), lit(resolution)))
  }
}

/** Douglas-Peucker simplification; tolerance defaults to the request
  * min_size (constructive.py:92-139). */
case class Simplify(source: GeometryBlock, tolerance: Option[Double] = None,
    preserveTopology: Boolean = true) extends GeometryBlock {
  override def columns: Set[String] = source.columns
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val tol = tolerance.orElse(req.minSize).getOrElse(0.0)
    source.frame(req.copy(minSize = None)).withColumn("geometry",
      GeomFunctions.stSimplify(col("geometry"), lit(tol), lit(preserveTopology)))
  }
}

/** Per-fid `a.difference(b)`; rows missing in `other` keep their geometry
  * (A - None = A, set_operations.py:12-81). */
case class Difference(source: GeometryBlock, other: GeometryBlock) extends GeometryBlock {
  override def columns: Set[String] = source.columns
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val l = source.frame(req)
    val r = other.frame(req.copy(filters = Map.empty))
      .select(col("fid"), col("geometry").as("geometry_other"))
    l.join(r, Seq("fid"), "left")
      .withColumn("geometry",
        GeomFunctions.stDifference(col("geometry"), col("geometry_other")))
      .drop("geometry_other")
  }
}

/** Clip every geometry to the request geometry
  * (Intersection, set_operations.py:84-136). */
case class Intersection(source: GeometryBlock) extends GeometryBlock {
  override def columns: Set[String] = source.columns
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val df = source.frame(req)
    req.geometryWkt match {
      case Some(wkt) =>
        df.withColumn("geometry",
          GeomFunctions.stIntersectionWkt(col("geometry"), lit(wkt)))
      case None => df
    }
  }
}
