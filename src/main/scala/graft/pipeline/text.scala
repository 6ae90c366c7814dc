package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification and document
  * fingerprinting — all as codegen'd Column expressions (no UDFs), designed
  * to run as a single projection over a 100 TB `documents` table.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: every run of ≤4 letters, digit, or single
    * punctuation char counts as one token (a cheap stand-in for a real BPE
    * vocabulary with SQL-reproducible semantics). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct lowercase words. */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "was", "it", "for", "on", "with", "as", "at", "by")

  /** Quality score in [0,1]: blend of length, punctuation ratio, stopword
    * ratio and mean word length — the standard cheap heuristics. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val stopRatio = size(array_intersect(ws, typedLit(stopwords))).cast("double") /
      greatest(nWords, lit(1.0))
    val punct = (nChars - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))) /
      greatest(nChars, lit(1.0))
    val meanWordLen = aggregate(ws, lit(0.0), (acc, w) => acc + length(w)) /
      greatest(nWords, lit(1.0))
    val lengthScore = least(nChars / 1000.0, lit(1.0))
    round(
      lengthScore * 0.3 +
        least(stopRatio * 3, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punct * 5, lit(1.0))) * 0.2 +
        least(meanWordLen / 8.0, lit(1.0)) * 0.2, 6)
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with lexicographic tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is", "with", "not"),
    "es" -> Seq("el", "la", "los", "y", "no", "con", "es"),
    "fr" -> Seq("le", "la", "les", "et", "ne", "avec", "est"),
    "zh" -> Seq("de", "shi", "bu", "he", "zai", "le", "wo"))

  /** Language id: the language whose marker words occur most (count of
    * occurrences, not distinct), ties to the lexicographically first. */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scores = langMarkers.map { case (lang, markers) =>
      struct(size(filter(ws, w => w.isInCollection(markers))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, reversed-lang) → max score, lexicographically first
    val best = scores.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    best.getField("lang")
  }

  /** Rolling polynomial fingerprint over words, using only arithmetic +
    * ascii/length primitives so an independent SQL engine can reproduce it
    * bit-for-bit: acc = (acc*31 + len(w)*7 + ascii(w[0])) mod 2^31-1. */
  def fingerprint(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => pmod(acc * 31 + length(w) * 7 + ascii(substring(w, 0, 1)), lit(2147483647L)))
}
