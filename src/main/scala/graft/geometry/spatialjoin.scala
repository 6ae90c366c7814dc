package graft.geometry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spatial (intersects) join of two geometry frames — the
  * classic scale-geo operator the reference delegates to geopandas on a
  * single partition (dask_geomodeling has no distributed sjoin block;
  * its zonal path in geometry/aggregate.py is raster-specific).
  *
  * Shape: each geometry's envelope explodes onto a fixed grid of
  * `cellSize` cells; candidate pairs MEET in a hash equi-join on the
  * cell id (never a cross join); a JTS `intersects` refines; and each
  * surviving pair is emitted exactly ONCE — at the cell containing the
  * min corner of the envelope intersection (the standard report-once
  * rule) — so no global dedup pass follows the join. At 100 TB this is
  * one explode per side + one shuffle on the cell key; skewed cells can
  * be salted exactly like any hot hash key. `cellSize` trades explode
  * fan-out against candidate precision; a geometry whose envelope
  * covers more than `maxCellsPerGeom` cells fails loudly (raise the
  * cell size) instead of silently exploding the plan.
  */
object SpatialJoin {

  private def cellId(cx: Long, cy: Long): Long =
    ((cx + (1L << 30)) << 31) | (cy + (1L << 30))

  /** Pairs (a_fid, b_fid) whose geometries intersect (boundary contact
    * counts, JTS semantics). Inputs are geometry frames (`fid` +
    * `geometry` WKB). */
  def intersects(left: DataFrame, right: DataFrame, cellSize: Double,
      maxCellsPerGeom: Int = 4096): DataFrame =
    join(left, right, cellSize, "intersects", maxCellsPerGeom)

  /** Grid-bucketed join under a JTS predicate: "intersects",
    * "within" (left within right) or "contains" (left contains right).
    * All three imply envelope intersection, so the same candidate
    * generation + report-once rule applies; only the refinement
    * predicate changes. */
  def join(left: DataFrame, right: DataFrame, cellSize: Double,
      predicate: String, maxCellsPerGeom: Int = 4096): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(Seq("intersects", "within", "contains").contains(predicate),
      s"unknown predicate '$predicate' (intersects, within, contains)")
    val cellsUdf = udf { (wkb: Array[Byte]) =>
      val e = GeomFunctions.readWkb(wkb).getEnvelopeInternal
      val cx0 = math.floor(e.getMinX / cellSize).toLong
      val cx1 = math.floor(e.getMaxX / cellSize).toLong
      val cy0 = math.floor(e.getMinY / cellSize).toLong
      val cy1 = math.floor(e.getMaxY / cellSize).toLong
      val n = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
      require(n <= maxCellsPerGeom,
        s"geometry envelope covers $n grid cells (> $maxCellsPerGeom): " +
          "raise cellSize")
      (for (cx <- cx0 to cx1; cy <- cy0 to cy1)
        yield cellId(cx, cy)).toArray
    }
    val l = left.select(col("fid").as("a_fid"),
        col("geometry").as("a_geom"))
      .withColumn("cell", explode(cellsUdf(col("a_geom"))))
    val r = right.select(col("fid").as("b_fid"),
        col("geometry").as("b_geom"))
      .withColumn("cell", explode(cellsUdf(col("b_geom"))))
    val refine = udf { (aw: Array[Byte], bw: Array[Byte], cell: Long) =>
      val a = GeomFunctions.readWkb(aw)
      val b = GeomFunctions.readWkb(bw)
      val ea = a.getEnvelopeInternal; val eb = b.getEnvelopeInternal
      if (!ea.intersects(eb)) false
      else {
        // report-once: only the cell holding the envelope-intersection
        // min corner emits the pair
        val ix = math.max(ea.getMinX, eb.getMinX)
        val iy = math.max(ea.getMinY, eb.getMinY)
        cellId(math.floor(ix / cellSize).toLong,
          math.floor(iy / cellSize).toLong) == cell && (predicate match {
          case "within"   => a.within(b)
          case "contains" => a.contains(b)
          case _          => a.intersects(b)
        })
      }
    }
    l.join(r, "cell")
      .filter(refine(col("a_geom"), col("b_geom"), col("cell")))
      .select(col("a_fid"), col("b_fid"))
  }
}
