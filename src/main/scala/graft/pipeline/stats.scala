package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus statistics a training-data pipeline wants at 100 TB
  * without a global sort of the raw rows. */
object Stats {

  /** EXACT discrete quantiles of a numeric column per group — the value
    * at 1-based rank max(1, ceil(q·n)) of the group's sorted values
    * (DuckDB `quantile_disc` semantics, rank arithmetic in IEEE doubles
    * so any engine reproduces it bit-for-bit). Spark's built-in
    * `percentile_approx` is approximate; this is exact.
    *
    * Scale shape: the corpus compresses to one row per (group, value)
    * in a map-side-combined hash aggregate BEFORE anything is sorted —
    * the window then runs over the distinct-value frame, partitioned by
    * group (never a single global partition). Cost is the distinct
    * count, not the corpus: integer-like and rounded columns (token
    * counts, quality scores at fixed precision) compress by orders of
    * magnitude. For a truly continuous column at extreme scale,
    * pre-bucket (round) the value or binary-search the value domain
    * with count passes; this operator states its contract instead of
    * silently approximating. */
  def exactQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
    val totals = cum.groupBy("grp").agg(max(col("cum")).as("n"))
    cum.join(broadcast(totals), "grp")
      .select(col("grp"), col("v"), col("cnt"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("rank", greatest(lit(1L),
        ceil(col("q") * col("n").cast("double"))))
      // the value whose cumulative block covers the rank
      .filter(col("cum") >= col("rank") &&
        col("cum") - col("cnt") < col("rank"))
      .select(col("grp").as(groupCol), col("q"), col("v").as("value"))
  }
}
