package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryLib

/** Structured Streaming variants of the temporal aggregations (SURVEY
  * §2.11: a natural extension, not a port requirement — the reference is
  * batch-only). Tumbling-window statistic over an event stream with
  * watermarked late-data handling; the batch and streaming plans share the
  * same transform so results agree.
  */
object EventStream {

  /** The events table stores nanosecond timestamps; Spark reads them as raw
    * longs (legacy.parquet.nanosAsLong) — the stream schema mirrors that and
    * `normalize` converts back to a microsecond timestamp. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))

  /** The shared transform: tumbling window per event_type. */
  def windowedAgg(df: DataFrame, windowLength: String): DataFrame =
    df.groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Batch form (used by the oracle-checked query). */
  def batch(spark: SparkSession, dir: String, windowLength: String = "1 hour"): DataFrame =
    windowedAgg(QueryLib.tbl(spark, dir, "events"), windowLength)

  /** Streaming form: file-source stream over a *directory* of events
    * parquet files, 10-minute watermark, windowed aggregation. */
  def streaming(spark: SparkSession, dir: String, windowLength: String = "1 hour"): DataFrame =
    windowedAgg(
      normalize(spark.readStream.schema(eventSchema).parquet(dir))
        .withWatermark("ts", "10 minutes"),
      windowLength)
}
