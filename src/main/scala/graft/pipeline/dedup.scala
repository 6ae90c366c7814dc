package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — each designed as shuffle-light DataFrame
  * plans (hash-partitioned groupBys and band-bucket equi-joins; no cross
  * joins) so they survive a 100 TB corpus.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text.
    *
    * Groups by (xxhash64, md5) of the text, not the text itself, so the
    * shuffle carries ~40 bytes per row instead of the full document body —
    * at corpus scale the raw-text key is the dominant shuffle cost. Two
    * independent 64/128-bit hashes make a cross-text collision (which would
    * merge distinct groups) a ~2^-192 event, far below any hardware error
    * rate; texts that agree on both keys are treated as equal. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)), md5(col(textCol)))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"))

  /** Exact dedup for a document STREAM: first-arrival-wins per distinct
    * text, as Structured Streaming keyed state (`dropDuplicates` on the
    * hash pair — same ~40-byte state per distinct text as the batch
    * shuffle key; without a watermark the state grows with the distinct
    * count, which is the semantics exact dedup needs). Works identically
    * on a batch frame. */
  def exactStreaming(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("text_xxh", xxhash64(col(textCol)))
      .withColumn("text_md5", md5(col(textCol)))
      .dropDuplicates("text_xxh", "text_md5")
      .drop("text_xxh", "text_md5")

  /** Sub-document (chunk-level) exact dedup, the mechanics of C4-style
    * paragraph dedup: split each document into fixed `chunkWords`-word
    * windows, keep only the globally FIRST occurrence of each distinct
    * chunk (ordered by document id, then chunk position), and report
    * per-document retention. On corpora with real paragraph breaks the
    * splitter is the only thing that changes.
    *
    * Scale shape: one explode (rows × chunks/doc), one window partitioned
    * BY CHUNK TEXT — an exact-dedup shuffle on the chunk key, no
    * cross-join; survives 100 TB the same way [[exact]] does (swap the
    * partition key for (xxhash64, md5) of the chunk if chunk texts are
    * large). */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int): DataFrame = {
    val words = split(col(textCol), " ")
    val nChunks = ceil(size(words).cast("double") / chunkWords).cast("long")
    val chunks = df
      // null text: size(split(null)) is -1, so nc would be 0 and
      // sequence(0, -1) would fabricate a descending [0, -1] — two bogus
      // null-chunk rows per null document. The oracle emits none; drop them.
      .filter(col(textCol).isNotNull)
      .select(col(idCol), words.as("w"), nChunks.as("nc"))
      .filter(col("nc") > 0)
      .select(col(idCol), col("w"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("w"),
          (col("chunk_idx") * chunkWords + 1).cast("int"), lit(chunkWords)), " ")
          .as("chunk"))
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk")).orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("rn", row_number().over(firstWin))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("total_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_chunks"))
  }

  /** Word shingles (n-grams) of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val ws = TextAnalysis.words(text)
    array_distinct(transform(sequence(lit(0), greatest(size(ws) - n, lit(0))),
      i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  private val P = 2147483647L // 2^31-1

  /** FNV-1a 64-bit string hash — deterministic across sessions/JVMs. */
  private[pipeline] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private[graft] def tokenizeWords(t: String): Array[String] =
    if (t == null) Array.empty
    // Locale.ROOT: default-locale lowercasing diverges from SQL lower()
    // (Turkish dotless-i) and would break the fnv64-mirroring oracles
    else t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

  /** MinHash signature: for hash function i, min over word-shingles of
    * ((2i+1)·h + 31i+7) mod p with h = fnv64(shingle) folded into [0,p).
    *
    * Runs as a single per-row Scala kernel (one pass over the shingles with
    * primitive arithmetic). The equivalent nested higher-order expression
    * falls back to interpreted evaluation and re-derives the shingle array
    * per hash function — measured ~200× slower at 5k docs. */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column = {
    val f = udf { (t: String) =>
      val ws = tokenizeWords(t)
      val nSh = math.max(ws.length - shingleSize + 1, 1)
      val seen = new scala.collection.mutable.HashSet[String]
      val hs = new scala.collection.mutable.ArrayBuffer[Long](nSh)
      var i = 0
      while (i < nSh) {
        val sh = ws.slice(i, i + shingleSize).mkString(" ")
        if (seen.add(sh)) hs += java.lang.Math.floorMod(fnv64(sh), P)
        i += 1
      }
      Array.tabulate(numHashes) { k =>
        var min = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val v = java.lang.Math.floorMod((k * 2 + 1) * hs(j) + k * 31 + 7, P)
          if (v < min) min = v
          j += 1
        }
        min
      }
    }
    f(text)
  }

  private val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline.Dedup")

  /** Hot-bucket skew guard for LSH self-joins: keep only buckets with at
    * most `cap` members. A degenerate bucket (boilerplate-heavy corpus, too
    * few planes/bands) otherwise lands |bucket|² pairs on a single task. The
    * dropped buckets and rows are LOGGED — never silently truncated — and a
    * bucket that large signals exact duplication better served by
    * [[exact]]/[[exactStreaming]] anyway. Costs one small aggregate job on
    * the compact (key, count) frame; only paid when a cap is requested. */
  private def capBuckets(banded: DataFrame, keyCols: Seq[String], cap: Int,
      what: String): DataFrame = {
    val keys = keyCols.map(col)
    // the upstream plan carries the signature UDF over the whole corpus;
    // checkpoint it once so the stats job and both self-join sides read the
    // materialization instead of re-running the kernel 3-5x (localCheckpoint
    // rather than cache(): reclaimed by the ContextCleaner with the frame,
    // not pinned in the session CacheManager)
    val bandedCk = banded.localCheckpoint()
    val sizes = bandedCk.groupBy(keys: _*).agg(count(lit(1)).as("_bsz"))
    val hotStats = sizes.filter(col("_bsz") > cap)
      .agg(count(lit(1)).as("nb"), coalesce(sum(col("_bsz")), lit(0L)).as("nr"))
      .collect()(0)
    val (nHot, nRows) = (hotStats.getLong(0), hotStats.getLong(1))
    if (nHot > 0)
      log.warn(s"$what: dropping $nHot hot buckets ($nRows member rows) " +
        s"over maxBucket=$cap — raise the cap or add planes/bands to keep them")
    bandedCk.join(sizes.filter(col("_bsz") <= cap).drop("_bsz"), keyCols)
  }

  /** Banding parameters `(numHashes, bands)` for a corpus of `n`
    * documents targeting Jaccard `threshold`: rows-per-band grows until
    * the expected FALSE candidate pairs from background-similarity
    * collisions stay linear in n (≤ `budgetPairsPerDoc` per document),
    * with the band count keeping the S-curve midpoint `(1/b)^(1/r)` near
    * the threshold (the MMDS banding recipe). Fixed banding makes false
    * candidates grow ~n² — measured in the r8 sf10 soak: ×145 candidate
    * output for ×10 rows at the fixed (32, 8) default. `background` is
    * the assumed Jaccard of unrelated documents; `minBands` floors recall
    * (probability of catching a threshold pair is `1-(1-t^r)^b`). Pure
    * arithmetic — deterministic and engine-reproducible. */
  def autoBanding(n: Long, threshold: Double = 0.8, background: Double = 0.05,
      budgetPairsPerDoc: Double = 10.0, minBands: Int = 4): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    require(background > 0 && background < threshold,
      "background similarity must be below the threshold")
    require(n >= 0 && budgetPairsPerDoc > 0 && minBands >= 1)
    var r = 2
    def bFor(rr: Int) =
      math.max(minBands, math.round(math.pow(threshold, -rr)).toInt)
    // expected false pairs ≈ (n²/2)·b·background^r ≤ n·budget
    def ok(rr: Int) =
      n.toDouble / 2 * bFor(rr) * math.pow(background, rr) <= budgetPairsPerDoc
    while (!ok(r) && r < 64) r += 1
    val b = bFor(r)
    (b * r, b)
  }

  /** [[lshCandidatePairs]] with banding derived from the actual corpus
    * size via [[autoBanding]] (one count job): at any scale the candidate
    * output stays ~linear instead of quadratic. */
  def lshCandidatePairsAuto(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      background: Double = 0.05, budgetPairsPerDoc: Double = 10.0,
      maxBucket: Option[Int] = None): DataFrame = {
    val (numHashes, bands) = autoBanding(df.count(), threshold, background,
      budgetPairsPerDoc)
    log.info(s"lshCandidatePairsAuto: numHashes=$numHashes bands=$bands " +
      s"(threshold=$threshold)")
    lshCandidatePairs(df, idCol, textCol, numHashes, bands, shingleSize,
      maxBucket)
  }

  /** LSH candidate pairs: band the signatures, bucket-join on
    * (band, bandHash), emit unique candidate pairs. The join is an
    * equi-join on the band hash — the scale path for near-dup mining.
    * `maxBucket` drops buckets larger than the cap before the self-join
    * (logged; see [[capBuckets]]) — off by default as it changes results. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val rows = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    val banded0 = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b)))
        .as(Seq("band", "bh")))
    val banded = maxBucket match {
      case Some(cap) => capBuckets(banded0, Seq("band", "bh"), cap, "lshCandidatePairs")
      case None      => banded0
    }
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** SimHash: 64-bit signature from per-bit majority vote of word hashes.
    *
    * Word hash is [[fnv64]] (not xxhash64) so an external engine can mirror
    * the signature bit-for-bit (the p05 fingerprint precedent — DuckDB
    * emulates the mod-2^64 FNV-1a fold in HUGEINT arithmetic). Runs as one
    * per-row primitive kernel; the previous nested aggregate/transform
    * expression was interpreted and re-walked the word array per bit. */
  def simhash(text: Column): Column = {
    val f = udf { (t: String) =>
      val ws = tokenizeWords(t)
      val counts = new Array[Int](64)
      var i = 0
      while (i < ws.length) {
        val h = fnv64(ws(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
      sig
    }
    f(text)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** All-pairs n-gram Jaccard via a shingle inverted index — the scale-safe
    * plan shape (no cartesian / theta-join):
    * explode shingles → self equi-join on the shingle → groupBy pair gives
    * |A∩B|; |A∪B| = |A| + |B| − |A∩B| from per-doc distinct-shingle counts.
    * Every join is an equi-join, so Catalyst picks a shuffled hash join on
    * the shingle key; pair aggregation shuffles only compact (id, id) rows.
    * `maxDf` optionally drops shingles appearing in more than that many
    * documents (stop-phrase skew guard for web-scale corpora; changes
    * results, so it is off by default). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      maxDf: Option[Int] = None): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    val counts = sh.select(col("id"), size(col("sh")).as("n_sh"))
    val ex0 = sh.select(col("id"), explode(col("sh")).as("s"))
    val ex = maxDf match {
      case Some(cap) =>
        val dfreq = ex0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("s"))
        ex0.join(dfreq, "s")
      case None => ex0
    }
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          greatest((col("n_a") + col("n_b") - col("inter")).cast("double"), lit(1.0)), 6)
          .as("jaccard"))
  }

  /** Duplicate-cluster assignment: the transitive closure of candidate
    * pairs, each member labeled with the smallest id of its component (the
    * canonical representative a dedup pipeline keeps). Iterative min-label
    * propagation: each round is one equi-join + min-aggregate shuffle on
    * compact (id, label) rows, converging in O(component diameter) rounds —
    * near-dup clusters are shallow (a handful of hops), so this is the
    * standard large-graph CC pattern without needing GraphX. Rounds are
    * checkpointed via persist; the convergence probe is one count per
    * round (a driver-side loop over *jobs*, not over rows). */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 20,
      driverPairLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // cost switch (the Place warp/group pattern): a pair set that fits the
    // driver solves in one union-find pass instead of paying per-round
    // Spark job overhead; past the limit, the distributed label loop runs.
    // The default limit (1M pairs ≈ tens of MB collected incl. Row
    // overhead) is conservative for a default-sized driver; raise it only
    // with driver memory to match. The probe is limit(n+1).collect() — one
    // pass that either yields the complete (deterministic) pair set or
    // proves it exceeds the limit, instead of a persist + count + collect
    // that materialized the pair plan twice.
    val p = pairs.select(col(idA).cast("long").as(idA), col(idB).cast("long").as(idB))
    val probe =
      if (driverPairLimit >= Int.MaxValue - 1) p.collect()
      else p.limit(driverPairLimit.toInt + 1).collect()
    if (probe.length <= driverPairLimit) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          parent(hi) = lo }
      }
      return parent.keys.toSeq.sorted.map(k => (k, find(k))).toDF("id", "rep")
    }
    // localCheckpoint (cluster: reliable checkpoint dir) makes edges and
    // labels leaf scans: they stop sharing lineage with each other and
    // with prior rounds, so per-round plans stay constant-size
    val edges = p.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(p.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // hop = min(own label, min over neighbours' labels), as a left join
      // (a union of the join branch with the labels branch trips Spark's
      // Union constraint rewriting when both sides share the labels plan);
      // the pre-round label rides along so convergence is read off the
      // materialized result below instead of re-joining against `labels`
      val neighbourMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid")).agg(min(col("rep")).as("nrep"))
      val hop = labels.join(neighbourMin, labels("id") === col("nid"), "left")
        .select(labels("id").as("id"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"),
          labels("rep").as("prev"))
        .localCheckpoint()
      // pointer doubling: also adopt the label of the current
      // representative, halving the remaining chain length each round —
      // O(log diameter) rounds instead of O(diameter)
      val doubled = least(col("a.rep"), coalesce(col("rrep"), col("a.rep")))
      val next = hop.as("a")
        .join(hop.as("b").select(col("id").as("rid"), col("rep").as("rrep")),
          col("a.rep") === col("rid"), "left")
        .select(col("a.id").as("id"), doubled.as("rep"),
          (doubled =!= col("a.prev")).as("chg"))
        .localCheckpoint()
      hop.unpersist(false)
      // convergence probe: a scan of the just-checkpointed round result —
      // no extra join against the previous labels
      val changed = next.filter(col("chg")).limit(1).count() > 0
      labels.unpersist(false)
      labels = next
      done = !changed
      round += 1
    }
    edges.unpersist(false)
    labels.select(col("id"), col("rep"))
  }

  /** Exact Jaccard similarity of word n-gram sets. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)).cast("double"), lit(1.0))
  }

  /** Cosine similarity of two double-array embedding columns — the native
    * codegen'd `CosineSimilarity` expression (single sequential pass,
    * identical accumulation order to the former UDF kernel, but reading
    * ArrayData primitives inside whole-stage codegen instead of boxing
    * each array into Seq[Double] per pair). Callers must
    * `GraftFunctions.register` the session (all in-repo callers do). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Embedding near-duplicate pairs above a cosine threshold, bucketed by a
    * random-hyperplane LSH prefilter (no full cross join). Vectors are
    * cast to double and unit-normalized ONCE on the row side — the
    * intra-bucket pair side then pays only a primitive dot product, not a
    * per-pair cast + two norm computations. */
  /** Unit-normalize a double-array column; an all-zero vector has no
    * direction and is left as-is (cosine with anything is then 0)
    * instead of dividing by zero into NaNs. */
  private[pipeline] val unit = udf { (v: Seq[Double]) =>
    val a = v.toArray
    var ss = 0.0; var i = 0
    while (i < a.length) { ss += a(i) * a(i); i += 1 }
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < a.length) { a(i) *= inv; i += 1 }
    }
    a
  }

  /** Default per-bucket population cap for [[embeddingNearDups]]: the
    * skew guard is ON unless a caller explicitly passes `Int.MaxValue` —
    * a degenerate all-one-bucket corpus (too few planes, boilerplate
    * embeddings) otherwise lands |bucket|² pairs on a single task. */
  val DefaultMaxBucket: Int = 100000

  /** THE DEFAULT embedding near-dup surface: plane count derived from
    * the actual corpus size ([[autoPlanes]]) so the within-bucket
    * quadratic stays bounded per bucket at ANY corpus size. The
    * fixed-`planes` overload below is the EXPERT path — a plane count
    * pinned for a laptop corpus is quadratic-in-bucket at scale
    * (measured: 84 s at sf10 and 197 s at sf30 for the pinned shape vs
    * 14 s auto) — use it only to pin reproducible bucket assignments
    * (oracles, cross-run comparisons). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int): DataFrame =
    embeddingNearDupsAuto(df, idCol, vecCol, threshold, dim)

  /** Fixed-planes variant — see the default surface above for when NOT
    * to use this. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Array[Double]],
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes)
    val keyed0 = df.select(col(idCol).as("id"), unit(vecD).as("v"), sigCol.as("bucket"))
    val keyed =
      if (maxBucket == Int.MaxValue) keyed0
      else capBuckets(keyed0, Seq("bucket"), maxBucket, "embeddingNearDups")
    keyed.as("l").join(keyed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        graft.functions.GraftFunctions.dot(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Ceiling on the enumerated probe-mask count for
    * [[embeddingNearDupsMultiprobe]]: each mask multiplies the exploded
    * candidate volume, so a few thousand is already a ×thousands cost
    * dial — anything larger is a mis-parameterization, not a tuning. */
  val MaxProbeMasks: Int = 4096

  /** C(planes, 0) + C(planes, 1) + … + C(planes, min(radius, planes)),
    * saturating at Int.MaxValue (cap comparisons stay correct). */
  def maskCount(planes: Int, radius: Int): Int = {
    var total = 0L
    var c = 1L // C(planes, 0)
    var r = 0
    while (r <= math.min(radius, planes) && total <= Int.MaxValue) {
      total += c
      c = c * (planes - r) / (r + 1)
      r += 1
    }
    math.min(total, Int.MaxValue.toLong).toInt
  }

  /** [[embeddingNearDups]] with MULTI-PROBE recall recovery: each vector
    * also probes the buckets whose signature differs in up to
    * `probeRadius` sign bits (near-boundary pairs land one bit apart),
    * so an above-threshold pair is found whenever its signatures differ
    * in ≤ radius bits — the all-pairs sibling of the ANN search's
    * multi-probe ([[Similarity.lshCandidates]]). Mechanics: probe masks
    * are enumerated C(planes, ≤radius) (never a 2^planes walk), exploded
    * on ONE side of the bucket equi-join — a qualifying pair meets via
    * exactly one mask (their signature XOR), once (the `id <` orientation
    * filter), and the plan stays an equi-join. `radius = planes` probes
    * everything and makes the search EXACT (the spec's equivalence
    * lever); radius 0 is [[embeddingNearDups]]. Candidate cost multiplies
    * by the mask count — the recall/cost dial. */
  def embeddingNearDupsMultiprobe(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, planes: Seq[Array[Double]],
      probeRadius: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    require(probeRadius >= 0, "probeRadius must be >= 0")
    require(probeRadius == 0 || planes.length <= 24,
      "multi-probe with more than 24 planes would enumerate too many masks")
    // The plane bound alone does not bound the ENUMERATED mask count:
    // C(24, <=12) is ~2.7M masks — a typedLit array that size blows up
    // the plan (and is exploded per row) long before the radius=planes
    // exactness lever is useful. Cap the total masks, not just planes.
    require(probeRadius == 0 || maskCount(planes.length, probeRadius) <= MaxProbeMasks,
      s"multi-probe would enumerate ${maskCount(planes.length, probeRadius)} " +
        s"probe masks (C(${planes.length}, <=$probeRadius)); the cap is " +
        s"$MaxProbeMasks — lower probeRadius or the plane count")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes)
    val keyed0 = df.select(col(idCol).as("id"), unit(vecD).as("v"),
      sigCol.as("bucket"))
    val keyed =
      if (maxBucket == Int.MaxValue) keyed0
      else capBuckets(keyed0, Seq("bucket"), maxBucket,
        "embeddingNearDupsMultiprobe")
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until planes.length).combinations(r)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val probing = keyed.select(col("id"), col("v"),
      explode(transform(typedLit(masks), m => col("bucket").bitwiseXOR(m)))
        .as("bucket"))
    probing.as("l").join(keyed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        graft.functions.GraftFunctions.dot(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Plane count for [[embeddingNearDupsAuto]]: enough hyperplanes that
    * the EXPECTED bucket population stays near `targetBucket`, so the
    * within-bucket pairwise term is (targetBucket)²/2 per bucket —
    * constant per-bucket work at any corpus size (the signature space
    * doubles per plane: 2^p buckets). Bounded to [1, 24] (2^24 buckets
    * is past any realistic single-corpus need). */
  def autoPlanes(n: Long, targetBucket: Int = 2000): Int = {
    require(targetBucket > 0, "targetBucket must be positive")
    if (n <= targetBucket) 1
    else math.min(24,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt)
  }

  /** [[embeddingNearDups]] with the plane count derived from the actual
    * corpus size via [[autoPlanes]] (one count job) — the embedding
    * sibling of [[lshCandidatePairsAuto]]: the within-bucket quadratic
    * stays bounded per bucket at any scale instead of growing with the
    * corpus. Recall note: each extra plane halves the chance an
    * above-threshold pair shares a bucket (single-table SimHash LSH);
    * for high-recall production dedup compose with multiprobe or band
    * over plane GROUPS — this helper is the scale-safe default, not a
    * recall guarantee. */
  def embeddingNearDupsAuto(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, targetBucket: Int = 2000,
      seed: Long = 42L,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val p = autoPlanes(df.count(), targetBucket)
    log.info(s"embeddingNearDupsAuto: planes=$p (targetBucket=$targetBucket)")
    embeddingNearDups(df, idCol, vecCol, threshold,
      Similarity.randomPlanes(p, dim, seed), maxBucket)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * deduplication over an embedding column: k-means-cluster the
    * embedding space, then inside each cluster drop every vector that has
    * an above-threshold cosine neighbour with a smaller id
    * (first-occurrence-wins, the same keep rule as exact dedup; the
    * paper's "keep one per semantic duplicate group", made deterministic
    * and engine-reproducible).
    *
    * Scale shape: the pairwise comparison is confined to per-cluster
    * blocks by a shuffle equi-join on the cluster id — the quadratic term
    * is (corpus/numClusters)² per cluster, so `numClusters` scales with
    * the corpus exactly as in the paper (they use k = 11k clusters for
    * LAION); centroids are a k·dim driver array broadcast with the
    * assignment udf. `numClusters = 1` degrades to exact brute force —
    * the oracle lever (the p14/p30 trick): the clustering machinery stays
    * on the scored path while the result equals the SQL-replayable
    * all-pairs answer.
    *
    * Output: one row per input vector — id, max_cos (highest cosine to a
    * smaller-id same-cluster neighbour, null if none), kept. */
  def semDeDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numClusters: Int, iters: Int = 3): DataFrame = {
    implicit val spark: org.apache.spark.sql.SparkSession = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val centroids = Ivf.fit(df, idCol, vecCol, numClusters, iters)
    // pruned two-level assignment: exact for small k, ~2√k distance
    // evaluations per row for the large-k deployment shape (the sf10
    // soak measured flat O(n·k) assignment as the dominant cost)
    val assignUdf = udf(Ivf.prunedNearest(centroids))
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val keyed = df.select(col(idCol).as("id"), vecD.as("raw"))
      .withColumn("cluster", assignUdf(col("raw")))
      .select(col("id"), col("cluster"), unit(col("raw")).as("v"))
    val mx = keyed.as("l").join(keyed.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.id") < col("r.id"))
      .select(col("r.id").as("id"),
        graft.functions.GraftFunctions.dot(col("l.v"), col("r.v")).as("cos"))
      .groupBy("id").agg(max(col("cos")).as("mc"))
    df.select(col(idCol).as("id")).join(mx, Seq("id"), "left")
      .select(col("id"), round(col("mc"), 6).as("max_cos"),
        (col("mc").isNull || col("mc") < threshold).as("kept"))
  }
}
