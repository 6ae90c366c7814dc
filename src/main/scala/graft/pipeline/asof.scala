package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time ("as-of") join: for each left row, attach the latest
  * right row of the same key with rightTime <= leftTime (inclusive) — the
  * feature-attribution primitive of training-data pipelines (join each
  * event to the state that was current when it happened).
  *
  * Plan shape: tag and union both sides, then ONE window pass per key
  * ordered by (time, side) with right rows sorting first at equal times,
  * carrying the last non-null right payload forward. A single shuffle on
  * the key — never the range-join row explosion (each left row would
  * otherwise pair with every earlier right row before aggregation).
  * Equivalent to DuckDB's native `ASOF LEFT JOIN` (the q15 oracle).
  */
object AsOfJoin {

  /** Backward as-of left join. The right side must be unique per
    * (key, time) — pre-deduplicate otherwise (ties would be
    * nondeterministic under shuffle). Column names must not collide
    * across the two sides. */
  def backward(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String): DataFrame = {
    val lType = StructType(left.schema)
    val rType = StructType(right.schema)
    // cast through TIMESTAMP: parquet TIMESTAMP_NTZ columns otherwise fail
    // unix_micros (identity under a UTC session timezone)
    val lTagged = left.select(
      col(leftKey).cast("long").as("_k"),
      unix_micros(col(leftTime).cast("timestamp")).as("_t"),
      lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      col(rightKey).cast("long").as("_k"),
      unix_micros(col(rightTime).cast("timestamp")).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(lType).as("_l"),
      struct(right.columns.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val rightCols: Seq[Column] =
      right.columns.toSeq.map(c => col("_match").getField(c).as(c))
    out.select(left.columns.toSeq.map(c => col("_l").getField(c).as(c)) ++
      rightCols: _*)
  }
}
