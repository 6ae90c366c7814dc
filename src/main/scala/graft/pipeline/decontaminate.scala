package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination: flag training documents that share long word
  * n-grams with an evaluation set (the standard leakage guard in LLM data
  * pipelines — e.g. GPT-3 used 13-gram overlap; Brown et al. 2020 §C).
  *
  * Plan shape for 100 TB: the evaluation side is SMALL by construction
  * (benchmarks, not corpora), so its distinct n-grams broadcast and the
  * check is a broadcast equi-join on the exploded corpus n-grams — the
  * corpus is scanned once, never shuffled on raw text, and no pair join
  * with the corpus itself exists. */
object Decontaminate {

  /** Per corpus document: the number of distinct word `n`-grams it shares
    * with ANY document of `evalDocs`, and a contamination flag. Every
    * corpus document appears (zero-overlap docs included). */
  def overlap(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    val corpusGrams = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val shared = corpusGrams
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
    docs.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[overlap]] with a Bloom-filter prefilter — the shape that survives
    * an evaluation side too large to broadcast as strings (hundreds of
    * benchmarks, 10^7-10^8 distinct n-grams: gigabytes as UTF-8, tens of
    * megabytes at ~14 bits/element in the filter). The corpus-side
    * n-grams are gated MAP-SIDE by the broadcast sketch, so only true
    * overlaps plus the fpp sliver ever reach a shuffle; the exact join
    * that follows removes false positives, so the result is bit-identical
    * to [[overlap]] for every fpp — the filter changes the plan, never
    * the answer. The verify join is deliberately NOT broadcast-hinted:
    * both sides are candidate-sized after the gate, and at the scale
    * where this variant matters the eval grams by definition did not
    * fit a broadcast.
    *
    * The membership probe is a Scala UDF over the broadcast sketch
    * (Spark's `BloomFilter.mightContainString`, Murmur3 over UTF-8 —
    * deterministic across JVMs); no builtin expression exposes a
    * driver-built Bloom filter, and the UDF gates rows before the only
    * shuffle, where codegen friendliness matters least. */
  def overlapBloom(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 13, fpp: Double = 0.001): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp must be in (0, 1)")
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val nGrams = evalGrams.count() // one scalar aggregate, sizes the sketch
    val bf = evalGrams.stat.bloomFilter("gram", math.max(nGrams, 1L), fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bc.value.mightContainString(g))
    val candidates = docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .filter(mightContain(col("gram")))
    val shared = candidates
      .join(evalGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
    docs.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** The cleaned corpus: documents with zero eval overlap. */
  def clean(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    val flagged = overlap(docs, evalDocs, idCol, textCol, n)
      .filter(!col("contaminated")).select(col("doc_id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_semi")
  }
}
