package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Packing, Sampling, TextAnalysis}

class PackingSpec extends SparkSpec {

  test("packSequences maps documents onto fixed context windows") {
    import spark.implicits._
    // token counts 3, 5, 0, 6, 2 → stream offsets 0, 3, 8, 8, 14
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g h"), (2L, ""),
      (3L, "i j k l m n"), (4L, "o p")).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), ctx = 4, buckets = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L, 8L, 8L, 14L))
    // doc 1: tokens 3..7 → seqs 0..1; doc 3: tokens 8..13 → seqs 2..3
    assert(out(1).getLong(3) == 0L && out(1).getLong(4) == 1L &&
      out(1).getLong(5) == 2L)
    assert(out(3).getLong(3) == 2L && out(3).getLong(4) == 3L)
    // the empty doc occupies its offset with zero sequences
    assert(out(2).getLong(1) == 0L && out(2).getLong(5) == 0L)
    // doc 4: tokens 14..15 stay inside seq 3
    assert(out(4).getLong(3) == 3L && out(4).getLong(5) == 1L)
  }

  test("packSequences two-level prefix sum is bucket-count invariant") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, ("w " * (i % 7).toInt).trim))
      .toDF("doc_id", "text")
    def run(b: Int) = Packing.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), ctx = 16, buckets = b)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5))).toSeq
    assert(run(1) == run(7) && run(7) == run(64))
    // the auto default (buckets <= 0) is just another bucket count
    assert(run(0) == run(64))
  }

  test("packSequences bucket count auto-scales with input size") {
    // floor of 64 below the rows-per-bucket target, then linear growth:
    // per-bucket sort state stays ~RowsPerBucket at any corpus size
    assert(Packing.autoBuckets(0L, 0) == 64)
    assert(Packing.autoBuckets(1000L, 0) == 64)
    assert(Packing.autoBuckets(64L * Packing.RowsPerBucket, 0) == 64)
    assert(Packing.autoBuckets(65L * Packing.RowsPerBucket, 0) == 65)
    assert(Packing.autoBuckets(1000000000L, 0) == 250)
    assert(Packing.autoBuckets(1000000000000L, 0) == 250000)
    // an explicit count always wins
    assert(Packing.autoBuckets(1000000000L, 7) == 7)
  }

  test("stratifiedBalance keeps the smallest stratum whole and cuts by hash") {
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      val lang = if (i % 10 == 0) "nl" else if (i % 3 == 0) "en" else "fr"
      (i.toLong, s"document body number $i", lang)
    }.toDF("doc_id", "text", "lang")
    val out = Sampling.stratifiedBalance(docs, "lang", "text")
    val kept = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = counts.values.min
    // smallest stratum intact
    assert(kept.count(_._2 == "nl") == counts("nl") && mn == counts("nl"))
    // membership is exactly the per-stratum md5 cut, row by row
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    rows.foreach { case (id, text, lang) =>
      val cut = math.floor(mn.toDouble / counts(lang) * 4294967296.0).toLong
      val thr = f"$cut%08x"
      val prefix = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 8)
      val expectKeep = counts(lang) == mn || prefix < thr
      assert(kept.contains(id) == expectKeep, s"doc $id lang $lang")
    }
    // schema passes through unchanged
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
  }

  test("temperatureMix: T=1 no-op, T->inf equals stratifiedBalance, rates track") {
    import spark.implicits._
    val docs = (0 until 600).map { i =>
      val lang = if (i % 20 == 0) "nl" else if (i % 3 == 0) "en" else "fr"
      (i.toLong, s"document body number $i", lang)
    }.toDF("doc_id", "text", "lang")
    // T=1: natural mixture — every row kept
    assert(Sampling.temperatureMix(docs, "lang", "text", 1.0).count() == 600)
    // T -> infinity: uniform mixture == stratifiedBalance, row for row
    val hot = Sampling.temperatureMix(docs, "lang", "text", 1e9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val balanced = Sampling.stratifiedBalance(docs, "lang", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hot == balanced)
    // T=2: per-domain keep rate ~ sqrt(n_min/n_d), within md5 noise
    val t2 = Sampling.temperatureMix(docs, "lang", "text", 2.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = n.values.min
    assert(t2("nl") == n("nl")) // smallest domain intact
    n.foreach { case (lang, cnt) =>
      val expect = cnt * math.sqrt(mn.toDouble / cnt)
      assert(math.abs(t2(lang) - expect) <= 4 * math.sqrt(expect) + 2,
        s"$lang kept ${t2(lang)} expected ~$expect")
    }
  }

  test("gopherQuality computes shape statistics and the composite gate") {
    import spark.implicits._
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") // 60 unique words
    val repDoc = Seq.fill(80)("spam").mkString(" ")           // 80 copies
    val docs = Seq((0L, longDoc), (1L, repDoc), (2L, "!!! ???"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 0: 60 words, all unique, mean len in range → passes
    assert(out(0).getLong(1) == 60 && out(0).getDouble(3) == 1.0 &&
      out(0).getBoolean(5))
    // doc 1: frac_unique = 1/80 → fails the repetition gate
    assert(out(1).getLong(1) == 80 && out(1).getDouble(3) == 0.0125 &&
      !out(1).getBoolean(5))
    // doc 2: zero words, pure symbols; stats null where undefined
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(2))
    assert(out(2).getDouble(4) > 0.7) // "!!! ???" is 6/7 symbols
    // doc 3: empty text → everything null except n_words = 0
    assert(out(3).getLong(1) == 0 && out(3).isNullAt(4))
  }

  test("trigramFamiliarity scores corpus-common trigrams") {
    import spark.implicits._
    // "aaaa" x3 docs make trigram "aaa" common (count 6 >= 4); "xyzw"
    // contributes rare trigrams only; "ab" has none and drops out
    val docs = Seq((0L, "aaaa"), (1L, "aaaa"), (2L, "aaaa"),
      (3L, "xyzw"), (4L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2 &&
      out(0).getDouble(3) == 1.0)
    assert(out(3).getLong(1) == 2 && out(3).getLong(2) == 0 &&
      out(3).getDouble(3) == 0.0)
    // the broadcast-kernel fast path and the join fallback are two
    // physical strategies for one semantics — identical row for row
    val viaJoin = TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 4,
      broadcastLimit = 0).orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == viaJoin.map(_.toSeq).toSeq)
  }

  test("trigramFamiliarity counts codepoints, not UTF-16 units") {
    import spark.implicits._
    // "ab😀cd" is 5 codepoints but 6 UTF-16 units (the emoji is a
    // surrogate PAIR) → exactly 3 trigram positions, matching SQL
    // substr/length semantics; unit-indexed code would report 4
    val docs = Seq((0L, "ab😀cd")).toDF("doc_id", "text")
    Seq(2000000L, 0L).foreach { lim => // both physical strategies
      val r = TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 1,
        broadcastLimit = lim).head
      assert(r.getLong(1) == 3 && r.getLong(2) == 3, s"limit=$lim: $r")
    }
  }

  test("dsirWeights matches the hand-derived add-one log-ratio model") {
    import spark.implicits._
    // target = docs 0 only. Buckets: "a b" and "c d" land in distinct
    // buckets (checked below). tb("a b")=1, rb("a b")=2, rb("c d")=1,
    // tt=1, tr=3, B=4096
    val docs = Seq((0L, "a b", "en"), (1L, "a b", "de"), (2L, "c d", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", 4096).orderBy("doc_id").collect()
    assert(out.length == 3)
    val tmAb = math.floor(math.log(
      (2.0 * 4099.0) / (3.0 * 4097.0)) * 1e6).toLong
    val tmCd = math.floor(math.log(
      (1.0 * 4099.0) / (2.0 * 4097.0)) * 1e6).toLong
    assert(tmAb != tmCd) // implies the buckets really are distinct
    assert(out(0).getLong(2) == tmAb && out(1).getLong(2) == tmAb)
    assert(out(2).getLong(2) == tmCd)
    // target-like docs score strictly higher than the off-target one
    assert(out(0).getLong(3) > out(2).getLong(3))
  }

  test("dsirScore gives unseen buckets the add-one smoothed term") {
    import spark.implicits._
    // model fitted WITHOUT "e f": tr=3, tt=1 as above
    val fit = Seq((0L, "a b", "en"), (1L, "a b", "de"), (2L, "c d", "de"))
      .toDF("doc_id", "text", "lang")
    val model = Sampling.dsirModel(fit, "doc_id", "text",
      col("lang") === "en", 4096)
    // scored corpus holds a bigram the model never saw; its bucket must
    // contribute ln((0+1)(tr+B)/((0+1)(tt+B))) and COUNT in n_bigrams,
    // not silently vanish from the inner join
    val out = Sampling.dsirScore(
      Seq((7L, "a b"), (8L, "e f")).toDF("doc_id", "text"),
      "doc_id", "text", model, 4096).orderBy("doc_id").collect()
    val tmAb = math.floor(math.log(
      (2.0 * 4099.0) / (3.0 * 4097.0)) * 1e6).toLong
    val tmUnseen = math.floor(math.log(
      (1.0 * 4099.0) / (1.0 * 4097.0)) * 1e6).toLong
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((7L, 1L, tmAb), (8L, 1L, tmUnseen)))
  }

  test("exactQuantiles picks the value at rank max(1, ceil(q*n))") {
    import spark.implicits._
    // group a: [10,20,30,40,50]; the 0.21 case separates the ceil(q*n)
    // rule (rank 2 → 20) from floor(q*(n-1))+1 (rank 1 → 10)
    val df = (Seq(10, 20, 30, 40, 50).map(("a", _)) ++
      Seq(7, 7, 9).map(("b", _))).toDF("grp", "x")
    val out = graft.pipeline.Stats
      .exactQuantiles(df, "x", "grp", Seq(0.0, 0.21, 0.5, 1.0))
      .orderBy("grp", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      ("a", 0.0, 10), ("a", 0.21, 20), ("a", 0.5, 30), ("a", 1.0, 50),
      // group b: duplicates compress into one (value, cnt) row; ranks
      // 1, 1, 2, 3 → 7, 7, 7, 9
      ("b", 0.0, 7), ("b", 0.21, 7), ("b", 0.5, 7), ("b", 1.0, 9)))
  }
}
