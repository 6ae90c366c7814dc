package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line- and substring-level corpus cleaning — the CCNet line-dedup
  * stage (Wenzek et al. 2020 remove duplicated lines/boilerplate
  * across shards before LM filtering) and the exact-substring
  * deduplication of Lee et al. 2022 ("Deduplicating Training Data
  * Makes Language Models Better"), re-expressed as Spark plans.
  *
  * Scale shape: both operators are explode → hash-partitioned
  * aggregate → equi-join — the line/window frequency tables are
  * web-scale and NEVER broadcast. The per-document reassembly and
  * span-merge passes are windows PARTITIONED BY DOCUMENT, so their
  * state is bounded by one document's length regardless of corpus
  * size. Everything is built-in expressions (no UDFs) and stays in
  * whole-stage codegen.
  */
object Lines {

  /** CCNet-style boilerplate line removal: a line occurring in at
    * least `minDocs` DISTINCT documents is boilerplate; documents are
    * reassembled from their surviving lines in order. Output:
    * `(doc_id, clean_text, n_kept, n_removed)` — a fully-boilerplate
    * document survives with empty text (filtering is the caller's
    * policy decision, not this operator's).
    *
    * 100 TB: one explode, one hash aggregate over distinct lines
    * (map-side combined), one shuffle equi-join on the line, one
    * per-document aggregate. The line-frequency table is shuffled,
    * never broadcast. */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val counts = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val marked = lines.join(counts, Seq("line"))
    val rebuilt = marked
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("ndocs") < minDocs,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(when(col("ndocs") < minDocs, 1)).as("n_kept"),
        count(when(col("ndocs") >= minDocs, 1)).as("n_removed"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Exact-substring duplication statistics (the distributed
    * equivalent of Lee et al.'s suffix-array pass): every length-`w`
    * character window (stride `stride`) is hashed; the globally FIRST
    * occurrence (by (doc_id, pos) order) owns the window, every other
    * occurrence is a duplicated span. Overlapping duplicated spans are
    * merged per document (the paper's removal-interval union) and the
    * covered character count reported. Output: `(doc_id, n_windows,
    * n_dup_windows, dup_chars)`.
    *
    * 100 TB: the explode is the published algorithm's cost — ×w bytes
    * at stride 1 (the exactness setting); `stride > 1` is the
    * documented approximation lever (a duplicated substring of length
    * ≥ w + stride − 1 is still always caught). Ownership is a
    * row_number window on the hash partition; the span-merge is a
    * per-document window. No broadcast anywhere — the window-hash
    * table scales with the corpus. */
  /** Shared machinery: (base docs as (doc_id, t), all windows as
    * (doc_id, pos, h), merged duplicated islands as (doc_id, island,
    * start, end, nw)). */
  private def dupIslands(docs: DataFrame, idCol: String, textCol: String,
      w: Int, stride: Int): (DataFrame, DataFrame, DataFrame) = {
    require(w >= 4, "window length must be at least 4")
    require(stride >= 1 && stride <= w, "need 1 <= stride <= w")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("t"))
    val windows = base
      .select(col("doc_id"),
        posexplode(expr(
          s"case when length(t) >= $w then " +
            s"transform(sequence(0, length(t) - $w, $stride)," +
            s" p -> substring(t, p + 1, $w)) " +
            "else array() end")).as(Seq("k", "win")))
      .select(col("doc_id"), (col("k") * stride).as("pos"),
        md5(encode(col("win"), "UTF-8")).as("h"))
    val ranked = windows.withColumn("rn",
      row_number().over(Window.partitionBy(col("h"))
        .orderBy(col("doc_id"), col("pos"))))
    val dups = ranked.filter(col("rn") > 1)
    // merged interval coverage: an island starts where pos exceeds the
    // running max end of all earlier windows in the document
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val flagged = dups.withColumn("prev_end",
      max(col("pos") + w).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L)).over(byDoc))
    val islands = flagged.groupBy("doc_id", "island")
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) + w).as("end"),
        count(lit(1)).as("nw"))
    (base, windows, islands)
  }

  def windowDupStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 40, stride: Int = 1): DataFrame = {
    val (base, windows, islands) = dupIslands(docs, idCol, textCol, w, stride)
    val perDoc = islands.groupBy("doc_id")
      .agg(sum(col("end") - col("start")).as("dup_chars"),
        sum("nw").as("n_dup_windows"))
    base.select(col("doc_id"))
      .join(windows.groupBy("doc_id").agg(count(lit(1)).as("n_windows")),
        Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  /** The CUT that completes Lee et al.'s loop: remove every merged
    * duplicated span (keeping each span's globally FIRST occurrence
    * intact, since ownership exempts it from the dup set) and stitch
    * the survivors back together. Output: `(doc_id, clean_text,
    * removed_chars)`.
    *
    * The stitch is pure relational algebra: each island contributes
    * the GAP before it (previous island's end → its start, via lag),
    * one extra segment covers last-end → document length, and the
    * ordered gap substrings concatenate per document — so the oracle
    * replays it with the same window functions. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 40, stride: Int = 1): DataFrame = {
    val (base, _, islands) = dupIslands(docs, idCol, textCol, w, stride)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val before = islands
      .withColumn("gap_start", coalesce(lag(col("end"), 1).over(byDoc), lit(0L)))
      .select(col("doc_id"), col("gap_start"), col("start").as("gap_end"))
    val tail = islands.groupBy("doc_id")
      .agg(max(col("end")).as("gap_start"))
      .join(base, Seq("doc_id"))
      .select(col("doc_id"), col("gap_start"),
        length(col("t")).cast("long").as("gap_end"))
    val gaps = before.unionByName(tail)
      .filter(col("gap_end") > col("gap_start"))
    val stitched = gaps.join(base, Seq("doc_id"))
      .select(col("doc_id"), col("gap_start"),
        expr("substring(t, gap_start + 1, gap_end - gap_start)").as("seg"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("gap_start"), col("seg")))),
        x => x.getField("seg")), "").as("clean_text"))
    // a doc whose entire text is one island has NO gaps: it must come
    // back empty, not untouched — distinguish via the dup-doc set
    val dupDocs = islands.select(col("doc_id")).distinct()
      .withColumn("_hasdup", lit(true))
    base.join(stitched, Seq("doc_id"), "left")
      .join(dupDocs, Seq("doc_id"), "left")
      .withColumn("_clean", coalesce(col("clean_text"),
        when(col("_hasdup"), lit("")).otherwise(col("t"))))
      .select(col("doc_id"), col("_clean").as("clean_text"),
        (length(col("t")) - length(col("_clean"))).cast("long")
          .as("removed_chars"))
  }
}
