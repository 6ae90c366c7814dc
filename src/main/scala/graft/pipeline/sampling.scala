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

  /** Deterministic stratified balancing: down-sample every stratum to the
    * size of the smallest one, with the same content-keyed rule as
    * [[deterministicSample]] so membership is reproducible across runs
    * and engines (language-balancing a multilingual corpus is the
    * canonical use).
    *
    * Per-stratum rate = min_count / count; a row is kept iff the first 8
    * hex chars of md5(text) fall below the stratum's 2^32 cut. The cut is
    * computed per stratum as an expression (`floor(min/cnt · 2^32)` → hex
    * string), so the keep-decision is a broadcast join against the tiny
    * per-stratum table plus one string compare — no rand(), no global
    * sort. The smallest stratum (rate 1.0, whose cut would need 9 hex
    * digits) keeps every row explicitly.
    *
    * Scale: one groupBy over the stratum column (map-side combinable) and
    * one broadcast join; the stratum table is O(distinct strata).
    */
  def stratifiedBalance(df: DataFrame, stratumCol: String,
      textCol: String): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_cnt"))
    val minDf = counts.agg(min("_cnt").as("_min"))
    val cuts = counts.crossJoin(broadcast(minDf))
      .withColumn("_thr", lpad(lower(hex(
        floor(col("_min").cast("double") / col("_cnt") * 4294967296.0)
          .cast("long"))), 8, "0"))
      .select(col(stratumCol), col("_cnt"), col("_min"), col("_thr"))
    df.join(broadcast(cuts), stratumCol)
      .filter(col("_cnt") === col("_min") ||
        substring(md5(col(textCol)), 1, 8) < col("_thr"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Temperature-based domain mixing (the Pile/DoReMi-style resampling):
    * domain d with n_d documents keeps rate (n_min/n_d)^(1−1/T), which
    * realizes mixture weights ∝ n_d^(1/T) by pure downsampling — T=1 is
    * the natural mixture (no-op), T→∞ is the uniform mixture (exactly
    * [[stratifiedBalance]]). Membership is the same content-keyed md5 cut
    * as the other samplers: deterministic, engine-reproducible, no
    * rand(). Broadcast join against the O(domains) cut table — one
    * map-side filter at any corpus size. */
  def temperatureMix(df: DataFrame, domainCol: String, textCol: String,
      temperature: Double): DataFrame = {
    require(temperature >= 1.0, "temperature must be >= 1 (downsampling only)")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("_cnt"))
    val minDf = counts.agg(min("_cnt").as("_min"))
    val expo = 1.0 - 1.0 / temperature
    val cuts = counts.crossJoin(broadcast(minDf))
      .withColumn("_cut",
        floor(pow(col("_min").cast("double") / col("_cnt"), expo) *
          4294967296.0).cast("long"))
      .withColumn("_thr", lpad(lower(hex(col("_cut"))), 8, "0"))
      .select(col(domainCol), col("_cut"), col("_thr"))
    // rate 1.0 overflows the 8-hex cut (2^32 = 9 hex digits): keep those
    // domains whole explicitly — at T=1 that is EVERY domain
    df.join(broadcast(cuts), domainCol)
      .filter(col("_cut") >= 4294967296L ||
        substring(md5(col(textCol)), 1, 8) < col("_thr"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how target-like its hashed-bigram profile is.
    * Bigrams hash into `buckets` (a power of two, so the bucket is the
    * hash's low bits — identical for signed and unsigned arithmetic, the
    * property the SQL oracle relies on); a bag-of-buckets model is
    * fitted to the target slice (p̂) and the full corpus (q̂) with
    * add-one smoothing, and the document's log importance weight is
    * Σ_b c_b · (ln p̂_b − ln q̂_b).
    *
    * Engine-reproducible the same way as [[Lm.bigramPerplexity]]: each
    * per-bucket log-ratio becomes an INTEGER micro-nat term, so the
    * per-document sum is order-independent integer arithmetic; the one
    * float division happens last on identical integers.
    *
    * Scale shape: one explode into a per-(doc,bucket) hash aggregate
    * (map-side combined); BOTH models are ≤`buckets` rows by
    * construction — the paper's point — so scoring is a broadcast join,
    * never a shuffle of the corpus against a model. */
  private[pipeline] def dsirBucketsUdf(buckets: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val mask = (buckets - 1).toLong
    udf { (t: String) =>
      val ws = Dedup.tokenizeWords(t)
      if (ws.length < 2) Array.empty[Long]
      else Array.tabulate(ws.length - 1)(i =>
        Dedup.fnv64(ws(i) + " " + ws(i + 1)) & mask)
    }
  }

  /** Fit the two hashed-bigram bucket models: one row per bucket with
    * target count, raw count, and the (broadcastable) totals attached —
    * everything [[dsirScore]] needs to score any frame, including a
    * STREAM (the model is a static side of a stream-static join). */
  def dsirModel(docs: DataFrame, idCol: String, textCol: String,
      targetCond: Column, buckets: Int = 4096): DataFrame = {
    val bUdf = dsirBucketsUdf(buckets)
    // BOTH bucket counts in ONE map-side-combined aggregate straight off
    // the position stream: rb = all instances per bucket (≡ the former
    // sum over per-doc counts), tb = target instances (when(is_target)
    // ≡ the former filter branch, including null-cond rows counting 0).
    // The former shape ran the corpus explode once per derived branch
    // (rb, tb) and — because the returned plan was lazy — every consumer
    // of the model (the totals pull, the broadcast side of the scoring
    // join) re-ran those passes again: five corpus passes per score.
    // The model is ≤`buckets` rows BY CONSTRUCTION (the paper's point),
    // so materializing it is O(buckets) at any corpus size and the
    // whole fit is ONE corpus pass; totals derive from the materialized
    // table.
    val model0 = docs
      .select(targetCond.as("is_target"),
        explode(bUdf(col(textCol))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("rb"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tb"))
      .localCheckpoint()
    model0.crossJoin(broadcast(
      model0.agg(sum("rb").as("tr"), sum("tb").as("tt"))))
  }

  /** Score a document frame (batch OR stream) against a fitted model:
    * broadcast join on the bucket, integer micro-nat terms, per-doc sum.
    * On a stream this is a stream-static join + an update-mode
    * aggregation keyed by document. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int = 4096): DataFrame = {
    val bUdf = dsirBucketsUdf(buckets)
    // the totals are corpus constants: one bounded 1-row driver pull
    // from the STATIC model side (legal under streaming — `docs` may be
    // a stream, the fitted model never is), so unseen buckets can carry
    // them without depending on a matched model row
    val tRow = model.select(col("tr"), col("tt")).take(1)
    val (tr, tt) =
      if (tRow.isEmpty) (0L, 0L)
      else (tRow(0).getLong(0), tRow(0).getLong(1))
    // per-position join against the BROADCAST model is map-side (no
    // position ever crosses a shuffle) and the ONE aggregation keeps the
    // plan legal for Structured Streaming (two chained stateful
    // aggregations would trip the global-watermark correctness check).
    // LEFT join: a bucket absent from the model — possible exactly when
    // scoring a stream or a new corpus — contributes the add-one
    // smoothed term ln((0+1)(tr+B) / ((0+1)(tt+B))) instead of being
    // silently dropped from n_bigrams.
    val terms = docs
      .select(col(idCol).as("doc_id"), explode(bUdf(col(textCol))).as("b"))
      .join(broadcast(model.select(col("b"), col("rb"), col("tb"))),
        Seq("b"), "left")
      .select(col("doc_id"),
        floor(log(
          ((coalesce(col("tb"), lit(0L)) + 1L).cast("double") *
            lit((tr + buckets.toLong).toDouble)) /
          ((coalesce(col("rb"), lit(0L)) + 1L).cast("double") *
            lit((tt + buckets.toLong).toDouble))) *
          lit(1000000.0)).as("tm"))
    terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("tm")).as("logw_micro"))
      // integer micro-nat average: floor of an IEEE division of identical
      // integers is bit-exact across engines; round()ed floats are not
      .withColumn("avg_logw_micro",
        floor(col("logw_micro").cast("double") /
          col("n_bigrams").cast("double")))
  }

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetCond: Column, buckets: Int = 4096): DataFrame =
    dsirScore(docs, idCol, textCol,
      dsirModel(docs, idCol, textCol, targetCond, buckets), buckets)

  /** Per-source document cap (the FineWeb-style host/dump balancing
    * move): each source keeps at most `cap` documents, chosen by a
    * deterministic content-free hash order (md5 of the id rendered as
    * text — engine-reproducible, no float, no RNG state). Output:
    * every input row plus `src_rank` (1-based position within its
    * source) and `kept` — filtering on `kept` is the caller's move so
    * the statistics of what a cap WOULD drop stay queryable.
    *
    * 100 TB: one shuffle on the source key; per-source windows only
    * (state bounded by one source's rows, and a pathologically hot
    * source is exactly what the cap is for). */
  def sourceCap(docs: DataFrame, idCol: String, srcCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, "cap must be at least 1")
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(md5(encode(col(idCol).cast("string"), "UTF-8")),
        col(idCol))
    docs.withColumn("src_rank",
        org.apache.spark.sql.functions.row_number().over(rank).cast("long"))
      .withColumn("kept", col("src_rank") <= cap)
  }
}
