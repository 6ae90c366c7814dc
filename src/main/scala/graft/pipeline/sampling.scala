package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible corpus sampling for training-data pipelines.
  *
  * `rand()`-based sampling is neither stable across runs/partitionings nor
  * consistent across engines; content-keyed sampling is both: a document
  * is kept iff a hash of its text falls under the rate threshold. The
  * same document is therefore kept in every run, on every engine, and in
  * every derived table (sampling decisions survive joins) — the standard
  * reproducible-split trick.
  *
  * The hash is the first 8 hex chars of md5(text): lowercase hex compares
  * lexicographically in numeric order, so the filter is a plain string
  * comparison that DuckDB/any SQL engine reproduces bit-for-bit.
  */
object Sampling {

  /** Threshold prefix for a sampling rate (8 hex chars of the 2^32 cut). */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    val cut = math.min((rate * 4294967296.0).toLong, 4294967295L)
    f"$cut%08x"
  }

  /** Keep-predicate for content-keyed sampling at `rate`. */
  def keep(textCol: Column, rate: Double): Column =
    substring(md5(textCol), 1, 8) < lit(thresholdHex(rate))

  /** Deterministic sample of `rate` of the rows by text content. */
  def deterministicSample(df: DataFrame, textCol: String, rate: Double): DataFrame =
    df.filter(keep(col(textCol), rate))

  /** Disjoint deterministic train/holdout split at `holdoutRate`:
    * (train, holdout) — membership is a pure function of the text. */
  def split(df: DataFrame, textCol: String, holdoutRate: Double)
      : (DataFrame, DataFrame) = {
    val k = keep(col(textCol), holdoutRate)
    (df.filter(!k), df.filter(k))
  }
}
