package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich, Haddow, Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL): learn a
  * merge list over the corpus word-frequency table, then segment words
  * into subword tokens by replaying the merges in rank order — the
  * token-accounting core of an LLM training-data pipeline.
  *
  * Word convention matches the engine's other text kernels (lowercase,
  * `[^a-z0-9]+` separators) so SQL engines can mirror the word layer;
  * the last character of each word carries the `</w>` end-of-word marker
  * (the paper's convention), which keeps token concatenation lossless
  * and makes word counts recoverable from the token stream.
  *
  * Scale: training follows the reference implementation's structure —
  * the CORPUS-sized work is one distributed word-frequency aggregation
  * (the corpus compresses to its distinct-word dictionary, map-side
  * combined); merge learning then runs on the dictionary with
  * incremental pair-count updates (only words containing the merged
  * pair are touched per step — not the whole dictionary). A dictionary
  * cap fails loudly instead of silently collecting an unbounded
  * driver-side state. `encode` is a stateless per-row kernel with the
  * broadcast merge-rank table: one map at any corpus size, stream-safe.
  */
object Bpe {

  /** Ordered merge list; earlier = higher priority during encode. */
  case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private def wordsOf(t: String): Array[String] =
    if (t == null) Array.empty
    else t.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Initial symbol sequence of a word: one symbol per char, the last
    * carrying the end-of-word marker. */
  private def initSymbols(w: String): Vector[String] = {
    val cs = w.map(_.toString).toVector
    cs.init :+ (cs.last + "</w>")
  }

  /** Learn `numMerges` merges from the corpus. The distributed step is
    * the word-frequency aggregation; `maxDictWords` bounds the collected
    * dictionary (loud failure, never a silent sample). Ties in pair
    * frequency break lexicographically — fully deterministic. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxDictWords: Int = 5000000): Model = {
    val wordsUdf = udf(wordsOf _)
    val freqRows = docs
      .select(explode(wordsUdf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("w")) // deterministic driver-side order
      .limit(maxDictWords + 1)
      .collect()
    require(freqRows.length <= maxDictWords,
      s"BPE dictionary exceeds $maxDictWords distinct words — raise " +
        "maxDictWords or pre-filter the corpus")
    // dictionary: symbol sequences + frequencies
    val words = freqRows.map(r => initSymbols(r.getString(0))).toArray
    val freqs = freqRows.map(_.getLong(1))
    // pair -> total count, and pair -> set of word indices containing it
    val pairCount = scala.collection.mutable.Map.empty[(String, String), Long]
    val pairWords = scala.collection.mutable
      .Map.empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWordPairs(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(i)
        if (c <= 0) { pairCount.remove(p); pairWords.get(p).foreach(_.remove(i)) }
        else {
          pairCount(p) = c
          if (sign > 0) pairWords.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty) += i
        }
        j += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var step = 0
    while (step < numMerges && pairCount.nonEmpty) {
      // most frequent pair; ties by lexicographic pair order
      val best = pairCount.foldLeft(null.asInstanceOf[((String, String), Long)]) {
        case (acc, kv) =>
          if (acc == null || kv._2 > acc._2 ||
            (kv._2 == acc._2 &&
              (kv._1._1 < acc._1._1 ||
                (kv._1._1 == acc._1._1 && kv._1._2 < acc._1._2)))) kv
          else acc
      }._1
      merges += best
      val touched = pairWords.getOrElse(best,
        scala.collection.mutable.Set.empty[Int]).toArray
      touched.foreach { i =>
        addWordPairs(i, -1L) // retract this word's pair contributions
        val s = words(i)
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
            merged += s(j) + s(j + 1); j += 2
          } else { merged += s(j); j += 1 }
        }
        words(i) = merged.toVector
        addWordPairs(i, 1L)
      }
      pairCount.remove(best)
      pairWords.remove(best)
      step += 1
    }
    Model(merges.toSeq)
  }

  /** Segment one word by replaying merges in rank order (the standard
    * encode: repeatedly merge the lowest-rank adjacent pair). */
  def encodeWord(model: Model, w: String): Seq[String] = {
    var s = initSymbols(w)
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var j = 0
      while (j < s.length - 1) {
        model.ranks.get((s(j), s(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) done = true
      else s = (s.take(bestAt) :+ (s(bestAt) + s(bestAt + 1))) ++
        s.drop(bestAt + 2)
    }
    s
  }

  /** Per-document token stream: `(idCol, tokens, n_tokens)`. One map with
    * the broadcast merge ranks — stream-safe. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val enc = udf { (t: String) =>
      wordsOf(t).flatMap(encodeWord(model, _))
    }
    docs.select(col(idCol), enc(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Oracle-checkable invariants of the token stream: token concatenation
    * is lossless (`n_chars` = summed subword lengths without markers =
    * the corpus character count of the word layer) and every word ends in
    * exactly one marker token (`n_words`). `n_tokens` rides along for the
    * engine-side consumers (specs pin its correctness; SQL engines cannot
    * replay merges). */
  def invariants(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    encode(docs, idCol, textCol, model)
      .select(col(idCol),
        col("n_tokens"),
        size(filter(col("tokens"), t => t.endsWith("</w>")))
          .cast("long").as("n_words"),
        aggregate(transform(col("tokens"),
            t => length(regexp_replace(t, lit("</w>"), lit(""))).cast("long")),
          lit(0L), (a, x) => a + x).as("n_chars"))
}
