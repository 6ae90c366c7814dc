package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification and document
  * fingerprinting — each a single projection over a 100 TB `documents`
  * table. The word-level folds run as per-row primitive kernels: Spark's
  * higher-order `aggregate`/`filter` array expressions evaluate interpreted
  * (outside whole-stage codegen), and the one-pass kernel form measured
  * ~5× faster on the documents table. Every kernel reproduces its DuckDB
  * oracle SQL bit-for-bit (same tokenization, same fold order).
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

  /** Lowercase words (kernel-side tokenizer; equals
    * `filter(split(lower(text), "[^a-z0-9]+"), length > 0)`). */
  private def tokenize(t: String): Array[String] =
    if (t == null) Array.empty
    else t.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Distinct-free lowercase word array as a Column (kept for callers that
    * compose word-level expressions, e.g. shingles). */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)

  private val stopwordSeq = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "was", "it", "for", "on", "with", "as", "at", "by")
  private val stopwordSet = stopwordSeq.toSet

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1: repetitious
    * documents are low-quality): for word n-grams of size `n`,
    *  - `topNgramCharFrac`: characters covered by the MOST frequent n-gram
    *    (count × n-gram length over the normalized text length); ties break
    *    to the lexicographically smallest n-gram so the statistic is
    *    engine-reproducible;
    *  - `dupNgramCharFrac`: characters covered by all n-grams occurring
    *    more than once (overlaps double-counted, like the cheap form of the
    *    Gopher filter; may exceed 1 for degenerate text).
    * Normalized length = length of the single-space-joined word list. One
    * per-row kernel pass; both mirror the DuckDB oracle exactly. */
  def repetitionStats(text: Column, topN: Int, dupN: Int): Column = {
    val f = udf { (t: String) =>
      val ws = tokenize(t)
      var totalChars = math.max(ws.length - 1, 0)
      ws.foreach(totalChars += _.length)
      def charFracs(n: Int): (Double, Double) = {
        if (ws.length < n || totalChars == 0) return (0.0, 0.0)
        val counts = new scala.collection.mutable.HashMap[String, Int]
        var i = 0
        while (i <= ws.length - n) {
          val g = ws.slice(i, i + n).mkString(" ")
          counts.update(g, counts.getOrElse(g, 0) + 1)
          i += 1
        }
        var topG: String = null
        var topC = 0
        var dupChars = 0L
        counts.foreach { case (g, c) =>
          if (c > topC || (c == topC && (topG == null || g < topG))) { topG = g; topC = c }
          if (c > 1) dupChars += c.toLong * g.length
        }
        (topC.toDouble * topG.length / totalChars, dupChars.toDouble / totalChars)
      }
      val top = charFracs(topN)._1
      val dup = charFracs(dupN)._2
      Array(top, dup)
    }
    f(text)
  }

  /** Quality score in [0,1]: blend of length, punctuation ratio, stopword
    * ratio and mean word length — the standard cheap heuristics. The blend
    * arithmetic matches the oracle SQL term-for-term, left-to-right. */
  def qualityScore(text: Column): Column = {
    val f = udf { (t: String) =>
      val s = if (t == null) "" else t
      val ws = tokenize(s)
      // code POINTS, not UTF-16 units: SQL length()/regexp count
      // codepoints, so a non-BMP char (emoji) must count once
      val nChars = s.codePointCount(0, s.length).toDouble
      val nWords = ws.length.toDouble
      // distinct stopwords present (list_distinct(list_intersect(...)))
      val seen = new scala.collection.mutable.HashSet[String]
      var stopHits = 0
      var lenSum = 0.0
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        lenSum += w.codePointCount(0, w.length)
        if (stopwordSet.contains(w) && seen.add(w)) stopHits += 1
        i += 1
      }
      var punct = 0
      i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val keep = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= '0' && cp <= '9') || cp == ' '
        if (!keep) punct += 1
        i += Character.charCount(cp)
      }
      val stopRatio = stopHits / math.max(nWords, 1.0)
      val punctRatio = punct / math.max(nChars, 1.0)
      val meanWordLen = lenSum / math.max(nWords, 1.0)
      val lengthScore = math.min(nChars / 1000.0, 1.0)
      lengthScore * 0.3 +
        math.min(stopRatio * 3, 1.0) * 0.3 +
        (1.0 - math.min(punctRatio * 5, 1.0)) * 0.2 +
        math.min(meanWordLen / 8.0, 1.0) * 0.2
    }
    round(f(text), 6)
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with lexicographic tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is", "with", "not"),
    "es" -> Seq("el", "la", "los", "y", "no", "con", "es"),
    "fr" -> Seq("le", "la", "les", "et", "ne", "avec", "est"),
    "zh" -> Seq("de", "shi", "bu", "he", "zai", "le", "wo"))

  private val markerSets: Array[(String, Set[String])] =
    langMarkers.map { case (l, ms) => (l, ms.toSet) }.toArray

  /** Language id: the language whose marker words occur most (count of
    * occurrences, not distinct), ties to the lexicographically first
    * (later language replaces only on strictly greater score). */
  def langId(text: Column): Column = {
    val f = udf { (t: String) =>
      val ws = tokenize(t)
      var bestLang = markerSets(0)._1
      var bestScore = -1
      var k = 0
      while (k < markerSets.length) {
        val (lang, set) = markerSets(k)
        var score = 0
        var i = 0
        while (i < ws.length) { if (set.contains(ws(i))) score += 1; i += 1 }
        if (score > bestScore) { bestScore = score; bestLang = lang }
        k += 1
      }
      bestLang
    }
    f(text)
  }

  /** PII scrubbing patterns in APPLICATION ORDER (the order is load-
    * bearing: IP before PHONE because dotted digit groups would otherwise
    * parse as phone numbers; long digit runs (card/account numbers) before
    * PHONE because a bare 13+-digit run matches the phone shape). Patterns
    * are the RE2∩java.util.regex common subset — no backrefs, no
    * lookaround — so the DuckDB oracle replays them verbatim. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{13,19}\\b" -> "<NUMBER>",
    "(\\+?\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}" -> "<PHONE>")

  /** Redact emails, IPv4 addresses, card/account digit runs and phone
    * numbers — the standard pre-training scrub pass. A chain of codegen'd
    * `regexp_replace` column expressions: stateless per row, so the same
    * column works unchanged on a readStream frame, and at 100 TB it is a
    * pure map stage (no shuffle). */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Corpus TF-IDF with the top-`k` terms per document: the classic
    * two-exchange distributed text statistic. Plan shape at 100 TB:
    *  - explode → groupBy(doc, term) — one hash exchange, map-side combined;
    *  - document frequency = groupBy(term) over the (doc, term) pairs —
    *    second exchange, orders of magnitude smaller (vocab × docs pairs);
    *  - corpus size joins in as a broadcast single-row aggregate (no
    *    separate driver action);
    *  - per-doc top-k via row_number over (tfidf DESC, term ASC) — scores
    *    rounded to 6 decimals so the rank order is reproducible across
    *    engines (ties break on the term).
    * idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val wordRows = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("term"))
    val tf = wordRows.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rnk"))
  }

  /** Corpus-familiarity quality signal from character trigrams: the
    * fraction of a document's char trigrams (over `lower(text)`) that
    * occur at least `minDf` times corpus-wide. Low familiarity flags
    * boilerplate-free gibberish, encoding damage and wrong-language
    * fragments — an LM-perplexity stand-in built from integer counts and
    * one IEEE division only, so an independent SQL engine reproduces it
    * bit-for-bit (no transcendentals whose libm rounding could differ).
    *
    * Plan shape at 100 TB: explode trigrams → groupBy(trigram) builds the
    * model table (bounded by the observed trigram alphabet, ≪ corpus, and
    * map-side combined); the doc-side explode joins against it and groups
    * back by document — two hash exchanges total, the same shape as
    * TF-IDF. Documents shorter than 3 chars have no trigrams and drop out
    * (mirrored by the oracle's inner join).
    */
  /** Char trigrams of the lowercased text (kernel-side; both p27 physical
    * strategies derive trigrams through THIS function, so they cannot
    * diverge on any input). Iterates by CODE POINT, not UTF-16 unit: SQL
    * engines' `length`/`substr` count codepoints, so a surrogate-pair
    * character (emoji) must be one trigram position, not two. */
  private def trigramSeq(t: String): Array[String] =
    if (t == null) Array.empty
    else {
      val s = t.toLowerCase(java.util.Locale.ROOT)
      val cps = s.codePoints().toArray
      if (cps.length < 3) Array.empty
      else Array.tabulate(cps.length - 2)(i => new String(cps, i, 3))
    }

  def trigramFamiliarity(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int, broadcastLimit: Long = 2000000L): DataFrame = {
    // Model pass: per-partition hash combine (the word-count combiner
    // pattern) — only each partition's DISTINCT trigrams reach the
    // shuffle, not one row per corpus position. At 100 TB that is the
    // difference between shuffling ~corpus-size rows and shuffling
    // ~alphabet³-bounded partial counts.
    val texts = docs.select(col(textCol)).rdd
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    val common = texts.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      it.foreach(t => trigramSeq(t).foreach(tg =>
        m.merge(tg, 1L, (a, b) => a + b)))
      import scala.jdk.CollectionConverters._
      m.asScala.iterator
    }.reduceByKey(_ + _).filter(_._2 >= minDf).map(_._1)
    // Two physical strategies for the same result. The common-trigram set
    // is bounded by the observed character alphabet cubed — in practice a
    // few hundred thousand strings — so the fast path broadcasts it and
    // scores each document in ONE map. A pathological corpus whose common
    // set exceeds the limit falls back to an explode + equi-join shape,
    // which scales regardless of model size.
    val probe = common.take(
      ((broadcastLimit min (Int.MaxValue - 1).toLong) + 1).toInt)
    if (probe.length <= broadcastLimit) {
      val bc = docs.sparkSession.sparkContext.broadcast(probe.toSet)
      val score = udf { (t: String) =>
        val a = trigramSeq(t)
        if (a.isEmpty) null
        else {
          var c = 0L
          var i = 0
          while (i < a.length) { if (bc.value.contains(a(i))) c += 1; i += 1 }
          Array(a.length.toLong, c)
        }
      }
      docs.select(col(idCol).as("doc_id"), score(col(textCol)).as("nc"))
        .where(col("nc").isNotNull)
        .select(col("doc_id"), col("nc")(0).as("n_trigrams"),
          col("nc")(1).as("n_common"))
        .withColumn("familiarity",
          round(col("n_common").cast("double") / col("n_trigrams"), 6))
    } else {
      val tgUdf = udf(trigramSeq _)
      // pre-aggregate to (doc_id, tg, cnt) BEFORE the model join: the join
      // input shrinks by the per-document trigram repetition factor, and
      // the model itself falls out of the same aggregate for free
      val gAgg = docs.select(col(idCol).as("doc_id"),
          explode(tgUdf(col(textCol))).as("tg"))
        .groupBy("doc_id", "tg").agg(count(lit(1)).as("cnt"))
      val model = gAgg.groupBy("tg").agg(sum(col("cnt")).as("c"))
      gAgg.join(model, "tg")
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_trigrams"),
          sum(when(col("c") >= minDf, col("cnt")).otherwise(0L)).as("n_common"))
        .withColumn("familiarity",
          round(col("n_common").cast("double") / col("n_trigrams"), 6))
    }
  }

  /** Gopher-style document-quality rules (the repetition/shape filters of
    * the Gopher/MassiveText cleaning recipe, re-expressed over this
    * engine's tokenizer): word count, mean word length, distinct-word
    * fraction, symbol ratio, and the composite pass/fail gate. Integer
    * counts and single IEEE divisions only — no transcendentals — so an
    * independent SQL engine reproduces every value bit-for-bit; the gate
    * compares the ROUNDED statistics, keeping the boolean reproducible
    * too. Stateless per-row projection: one map stage at 100 TB, works
    * unchanged on a readStream frame. */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws).cast("long")
    val meanLen = when(nWords > 0, round(
      aggregate(transform(ws, w => length(w).cast("long")), lit(0L),
        (a, x) => a + x).cast("double") / nWords, 6))
    val fracUnique = when(nWords > 0,
      round(size(array_distinct(ws)).cast("double") / nWords, 6))
    val lt = lower(col(textCol))
    val symbolFrac = when(length(lt) > 0, round(
      length(regexp_replace(lt, "[a-z0-9\\s]", "")).cast("double") /
        length(lt), 6))
    docs.select(col(idCol).as("doc_id"), nWords.as("n_words"),
      meanLen.as("mean_word_len"), fracUnique.as("frac_unique"),
      symbolFrac.as("symbol_frac"))
      .withColumn("passes",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_unique") >= 0.2)
  }

  /** Rolling polynomial fingerprint over words, using only arithmetic +
    * ascii/length primitives so an independent SQL engine can reproduce it
    * bit-for-bit: acc = (acc*31 + len(w)*7 + ascii(w[0])) mod 2^31-1. */
  def fingerprint(text: Column): Column = {
    val f = udf { (t: String) =>
      val ws = tokenize(t)
      var acc = 0L
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        acc = java.lang.Math.floorMod(
          acc * 31 + w.length.toLong * 7 + w.charAt(0).toLong, 2147483647L)
        i += 1
      }
      acc
    }
    f(text)
  }
}
