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

  /** The cleaned corpus: documents with zero eval overlap. */
  def clean(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    val flagged = overlap(docs, evalDocs, idCol, textCol, n)
      .filter(!col("contaminated")).select(col("doc_id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_semi")
  }
}
