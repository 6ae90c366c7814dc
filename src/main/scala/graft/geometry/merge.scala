package graft.geometry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join two feature tables by fid — the reference's only relational join
  * (MergeGeometryBlocks, dask_geomodeling/geometry/merge.py:12-145):
  * `how` ∈ {left, right, inner, outer}, with suffixes applied to colliding
  * column names. */
case class MergeGeometryBlocks(
    left: GeometryBlock,
    right: GeometryBlock,
    how: String = "inner",
    suffixes: (String, String) = ("", "_right")
) extends GeometryBlock {
  require(Set("left", "right", "inner", "outer").contains(how), s"invalid how '$how'")

  private def collisions: Set[String] = left.columns intersect right.columns
  override def columns: Set[String] =
    (left.columns -- collisions) ++ (right.columns -- collisions) ++
      collisions.flatMap(c => Set(c + suffixes._1, c + suffixes._2))
  override def projection: String = left.projection

  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val coll = collisions
    def renamed(df: DataFrame, suffix: String): DataFrame =
      coll.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix))
    val l = renamed(left.frame(req), suffixes._1)
    val r = renamed(right.frame(req), suffixes._2)
    val sparkHow = if (how == "outer") "full_outer" else how
    l.join(r, Seq("fid"), sparkHow)
  }
}

/** Parse a `key=value`-pair text column into typed columns
  * (ParseTextColumn, dask_geomodeling/geometry/text.py:35-124). The
  * reference autocasts each value to null/bool/float/str per cell; with a
  * static Spark schema the mapping carries an explicit type per key:
  * "double" | "boolean" | "string" (autocast-equivalent for homogeneous
  * columns). */
case class ParseTextColumn(
    source: GeometryBlock,
    sourceColumn: String,
    keyMapping: Seq[(String, String, String)], // (key, outColumn, type)
    pairSep: String = " ",
    kvSep: String = "="
) extends GeometryBlock {
  override def columns: Set[String] = source.columns ++ keyMapping.map(_._2)
  override def projection: String = source.projection

  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val df = source.frame(req)
    val kv = str_to_map(col(sourceColumn), lit(pairSep), lit(kvSep))
    keyMapping.foldLeft(df) { case (d, (key, out, typ)) =>
      val raw = element_at(kv, key)
      val casted = typ match {
        case "double"  => when(lower(raw) === "null", lit(null)).otherwise(raw.cast("double"))
        case "boolean" => when(lower(raw) === "true", true)
          .when(lower(raw) === "false", false).otherwise(lit(null))
        case _         => when(lower(raw) === "null", lit(null)).otherwise(raw)
      }
      d.withColumn(out, casted)
    }
  }
}
