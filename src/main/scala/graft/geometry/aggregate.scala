package graft.geometry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.raster.{RasterBlock, RasterRequest, Bbox, TileLayout, EnvelopeCells}

/** Zonal statistics: per feature, a statistic over the raster cells whose
  * center falls inside the feature geometry, after the reference
  * `AggregateRaster` (dask_geomodeling/geometry/aggregate.py:255-587).
  *
  * Spark-first formulation (SURVEY §2.10): instead of rasterizing feature
  * labels, the raster is exploded to cell-center rows and joined spatially —
  * features explode to the exact pixel indices their envelope covers
  * (EnvelopeCells) and equi-join the value cells on (px, py), then an exact
  * JTS point-in-polygon residual predicate. Overlapping features need no
  * bucketization (the reference's trick, :75-110) — the join handles them
  * natively. Small features that catch no cell center fall back to the cell
  * containing their centroid (:561-571). The `max_pixels` budget with
  * optional automatic pixel-size coarsening + extensive-statistic rescaling
  * (:436-452, :573-577) is reproduced. At cluster scale every stage here is
  * an equi-join or hash aggregation — no broadcast of the raster, no
  * nested-loop join.
  */
private[geometry] object ZonalStats {

  def exactStat(statistic: String, v: Column): Column = statistic match {
    case "sum"    => sum(v)
    case "count"  => count(v).cast("double")
    case "min"    => min(v)
    case "max"    => max(v)
    case "mean"   => avg(v)
    case "median" => call_function("percentile", v, lit(0.5))
    case p        => call_function("percentile", v, lit(p.drop(1).toDouble / 100))
  }

  def compute(
      source: GeometryBlock,
      raster: RasterBlock,
      statistic: String,
      pixelSize: Option[Double],
      maxPixels: Option[Long],
      autoPixelSize: Boolean,
      columnName: String,
      thresholdName: Option[String],
      projection: String,
      req: GeometryRequest
  )(implicit spark: SparkSession): DataFrame = {
    // localCheckpoint, not cache(): the feature frame is reused four times
    // (extent probe, grid join, centroid fallback, final join) but must not
    // outlive the query — a cache() entry pins the plan in the session
    // CacheManager forever, while a localCheckpoint RDD is reclaimed by the
    // ContextCleaner once the returned frame is dropped. Lazy: the extent
    // probe right below is the first action and materializes it.
    val feats = source.frame(req).localCheckpoint(eager = false)
    // the aggregation runs in `projection` (the reference's agg projection,
    // aggregate.py:426-434); a feature source living in a different CRS has
    // its geometries transformed into the aggregation CRS for the spatial
    // work, while the returned frame keeps the source-CRS geometry — the
    // stat column is the only addition
    val srcProj = graft.raster.Proj.normalize(source.projection)
    val aggProj = graft.raster.Proj.normalize(projection)
    val work =
      if (srcProj == aggProj) feats
      else feats.withColumn("geometry",
        GeomFunctions.stTransform(col("geometry"), lit(srcProj), lit(aggProj)))
    val ps0 = pixelSize.orElse(raster.cellSize).getOrElse(
      throw new IllegalArgumentException("Pixel size is required"))

    // bbox of all features, snapped to the pixel grid (aggregate.py:454-469)
    val ext = work.agg(
      min(GeomFunctions.stEnvMinX(col("geometry"))), min(GeomFunctions.stEnvMinY(col("geometry"))),
      max(GeomFunctions.stEnvMaxX(col("geometry"))), max(GeomFunctions.stEnvMaxY(col("geometry")))
    ).head()
    if (ext.isNullAt(0)) return feats.withColumn(columnName, lit(null).cast("double"))

    var ps = ps0
    var x1 = math.floor(ext.getDouble(0) / ps) * ps
    var y1 = math.floor(ext.getDouble(1) / ps) * ps
    var x2 = math.ceil(ext.getDouble(2) / ps) * ps
    var y2 = math.ceil(ext.getDouble(3) / ps) * ps
    def w = math.max(1, math.round((x2 - x1) / ps).toInt)
    def h = math.max(1, math.round((y2 - y1) / ps).toInt)
    // pixel budget guard with optional coarsening (aggregate.py:436-452)
    maxPixels.foreach { mp =>
      if (w.toLong * h > mp && !autoPixelSize)
        throw new IllegalArgumentException(
          s"The required raster size for the aggregation exceeds the maximum of $mp pixels")
      while (w.toLong * h > mp) {
        ps *= 2
        x1 = math.floor(x1 / ps) * ps; y1 = math.floor(y1 / ps) * ps
        x2 = math.ceil(x2 / ps) * ps; y2 = math.ceil(y2 / ps) * ps
      }
    }
    // extensive statistics rescale when the grid was coarsened (:573-577)
    val rescale = if (ps != ps0 && statistic == "sum") (ps / ps0) * (ps / ps0) else 1.0

    val rreq = RasterRequest(Bbox(x1, y1, x2, y2), projection, w, h, req.start, req.stop)
    val nd = raster.noDataValue
    val tile = TileLayout.TILE
    val (bx1, by2, cps, gw) = (x1, y2, ps, w)

    // raster cells with world center coordinates
    val cells = raster.frame(rreq)
      .select(col("t"), col("ty"), col("tx"), posexplode(col("values")).as(Seq("pos", "v")))
      .withColumn("tw", least(lit(tile), lit(gw) - col("tx") * tile))
      .withColumn("px", col("tx") * tile + col("pos") % col("tw"))
      .withColumn("py", col("ty") * tile + (col("pos") / col("tw")).cast("int"))
      .withColumn("cx", lit(bx1) + (col("px") + 0.5) * cps)
      .withColumn("cy", lit(by2) - (col("py") + 0.5) * cps)
      .select(col("t"), col("px"), col("py"), col("cx"), col("cy"), col("v"))

    // features explode to the cells whose centers their envelope covers
    // (shared EnvelopeCells helper — exact center comparisons, candidate
    // rows O(Σ envelope cells)) and equi-join the value cells on the
    // exact (px, py) key, with no block join paying a full block of
    // candidates per tiny feature
    val thrCols = thresholdName.map(t => col(t)).toSeq
    val fb = work.select(Seq(col("fid"), col("geometry"),
      GeomFunctions.stEnvMinX(col("geometry")).as("fx1"),
      GeomFunctions.stEnvMinY(col("geometry")).as("fy1"),
      GeomFunctions.stEnvMaxX(col("geometry")).as("fx2"),
      GeomFunctions.stEnvMaxY(col("geometry")).as("fy2")) ++ thrCols: _*)
    val keyedFeats = EnvelopeCells.explode(fb, bx1, by2, cps, cps, w, h)
      .drop("cx", "cy") // the joined cell rows carry the identical centers

    def applyThreshold(df: DataFrame): DataFrame = thresholdName match {
      case Some(t) => df.filter(col("v") >= col(t))
      case None    => df
    }

    val matched = applyThreshold(
      cells.join(keyedFeats, Seq("px", "py"))
        .filter(GeomFunctions.stContainsPoint(col("geometry"), col("cx"), col("cy")))
        .filter(col("v") =!= nd))

    // temporal rasters produce a per-feature time-series cell (the
    // reference's list wrapper, aggregate.py:581-585); non-temporal ones a
    // scalar
    val temporal = raster.temporal && raster.timesIn(req.start, req.stop).size > 1
    def aggregatePerFid(df: DataFrame, out: String): DataFrame = {
      val series = df.groupBy(col("fid"), col("t"))
        .agg(exactStat(statistic, col("v")).as("stat_v"))
        .groupBy(col("fid"))
        .agg(sort_array(collect_list(struct(col("t"), col("stat_v"))))
          .getField("stat_v").as("sv"))
      if (temporal)
        series.select(col("fid"), transform(col("sv"), v => v * rescale).as(out))
      else
        series.select(col("fid"), (element_at(col("sv"), -1) * rescale).as(out))
    }

    val perFid = aggregatePerFid(matched, "agg_value")

    // centroid fallback for features that caught no cell center (:561-571)
    val centroids = fb.select(Seq(col("fid"),
      floor((GeomFunctions.stCentroidX(col("geometry")) - bx1) / cps).cast("int").as("px"),
      floor((lit(by2) - GeomFunctions.stCentroidY(col("geometry"))) / cps).cast("int").as("py"))
      ++ thrCols: _*)
    val fallback = aggregatePerFid(
      applyThreshold(centroids.join(cells, Seq("px", "py")).filter(col("v") =!= nd)),
      "fb_value")

    val default =
      if (temporal) lit(null)
      else if (statistic == "sum" || statistic == "count") lit(0.0)
      else lit(null).cast("double")
    feats.join(perFid, Seq("fid"), "left")
      .join(fallback, Seq("fid"), "left")
      .withColumn(columnName, coalesce(col("agg_value"), col("fb_value"), default))
      .drop("agg_value", "fb_value")
  }
}

case class AggregateRaster(
    source: GeometryBlock,
    raster: RasterBlock,
    statistic: String = "sum",
    aggProjection: Option[String] = None,
    pixelSize: Option[Double] = None,
    maxPixels: Option[Long] = None,
    columnName: String = "agg",
    autoPixelSize: Boolean = false
) extends GeometryBlock {
  require(Set("sum", "count", "min", "max", "mean", "median").contains(statistic)
    || statistic.matches("p\\d+(\\.\\d+)?"), s"Unknown statistic '$statistic'")
  override def columns: Set[String] = source.columns + columnName
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame =
    ZonalStats.compute(source, raster, statistic, pixelSize, maxPixels,
      autoPixelSize, columnName, None, aggProjection.getOrElse(projection), req)
}

/** Same, but each feature first masks the raster with its own per-row
  * threshold column (aggregate.py:590-646). */
case class AggregateRasterAboveThreshold(
    source: GeometryBlock,
    raster: RasterBlock,
    statistic: String = "sum",
    aggProjection: Option[String] = None,
    pixelSize: Option[Double] = None,
    maxPixels: Option[Long] = None,
    columnName: String = "agg",
    thresholdName: String = "threshold"
) extends GeometryBlock {
  override def columns: Set[String] = source.columns + columnName
  override def projection: String = source.projection
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame =
    ZonalStats.compute(source, raster, statistic, pixelSize, maxPixels,
      autoPixelSize = false, columnName, Some(thresholdName),
      aggProjection.getOrElse(projection), req)
}
