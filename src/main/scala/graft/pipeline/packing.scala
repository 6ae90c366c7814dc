package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: the corpus token
  * stream (all documents concatenated in id order) is cut into fixed-size
  * context windows of `ctx` tokens, and each document is mapped to the
  * global token offset and window span it lands in — the bookkeeping a
  * pack-and-split dataloader needs (GPT-style "concatenate everything,
  * split every ctx tokens").
  *
  * Scale: the global cumulative sum is a two-level prefix sum, the only
  * shape that survives 100 TB. Documents are bucketed into id ranges with
  * a deterministic expression (no sampled range partitioner — the bucket
  * of a row must be identical across the two passes that use it), the
  * cumsum runs per bucket (a window partitioned by bucket), and the
  * per-bucket totals — one row per bucket — are collected, prefix-summed
  * on the driver, and broadcast back as offsets. No single-partition
  * global window anywhere; driver traffic is O(buckets), not O(rows).
  */
object Packing {

  /** Per-document packing map: `idCol, n_tokens, tok_start, first_seq,
    * last_seq, n_seqs` with sequences of `ctx` tokens cut from the
    * id-ordered corpus token stream. Zero-token documents carry the
    * offset they would occupy and `n_seqs = 0`.
    *
    * `tokens` is the per-document token count expression (e.g.
    * [[TextAnalysis.tokenCount]]).
    *
    * `buckets <= 0` (the default) auto-scales the bucket count to the
    * input: ~[[RowsPerBucket]] rows per bucket with a floor of 64, so the
    * per-bucket window sort state stays bounded at 10⁹+ documents instead
    * of growing as rows/64. Any positive value pins the count; results
    * are identical for every bucket count (asserted in PackingSpec).
    */
  val RowsPerBucket: Long = 4000000L

  /** Bucket count for `rows` input rows: explicit `buckets` if positive,
    * else the rows-per-bucket target with a floor of 64. */
  def autoBuckets(rows: Long, buckets: Int): Int =
    if (buckets > 0) buckets
    else math.max(64L, (rows + RowsPerBucket - 1) / RowsPerBucket)
      .min(Int.MaxValue.toLong).toInt

  def packSequences(df: DataFrame, idCol: String, tokens: Column, ctx: Int,
      buckets: Int = 0): DataFrame = {
    require(ctx > 0, "ctx must be positive")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("_id"),
      tokens.cast("long").as("n_tokens"))

    // deterministic id-range buckets from the (tiny) global id span; the
    // same aggregate also counts rows for the bucket auto-scale
    val bounds = base.agg(min("_id"), max("_id"), count(lit(1))).head()
    if (bounds.isNullAt(0)) return emptyResult(spark, idCol)
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(maxId - minId + 1, 1L)
    val nB = autoBuckets(bounds.getLong(2), buckets)
    val bucket = least(lit(nB - 1L), greatest(lit(0L),
      floor((col("_id") - minId).cast("double") * nB / span).cast("long")))
    val withB = base.withColumn("_b", bucket)

    // level 1: cumsum within each bucket (exclusive — offset of the doc)
    val w = Window.partitionBy("_b").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withB.withColumn("_loc",
      coalesce(sum("n_tokens").over(w), lit(0L)))

    // level 2: bucket totals → driver prefix sum → broadcast offsets.
    // O(buckets) rows; recomputed from the same deterministic bucket
    // expression, so the two passes cannot disagree on membership.
    val totals = withB.groupBy("_b").agg(sum("n_tokens").as("_tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, tot) =>
      val off = acc; acc += tot; (b, off)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("_b", "_off")

    local.join(broadcast(offDf), "_b")
      .withColumn("tok_start", col("_off") + col("_loc"))
      .withColumn("first_seq", expr(s"tok_start div $ctx"))
      .withColumn("last_seq", when(col("n_tokens") > 0,
        expr(s"(tok_start + n_tokens - 1) div $ctx"))
        .otherwise(col("first_seq")))
      .withColumn("n_seqs", when(col("n_tokens") > 0,
        col("last_seq") - col("first_seq") + 1).otherwise(lit(0L)))
      .select(col("_id").as(idCol), col("n_tokens"), col("tok_start"),
        col("first_seq"), col("last_seq"), col("n_seqs"))
  }

  private def emptyResult(spark: org.apache.spark.sql.SparkSession,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = Seq(idCol, "n_tokens", "tok_start", "first_seq",
      "last_seq", "n_seqs").map(StructField(_, LongType))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(fields))
  }
}
