package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-table point-in-interval join — the pattern the q17 self-join
  * rewrite vacated, kept here for the case where it IS the right plan:
  * a POINT table probed against an INTERVAL table (sessions × outage
  * windows, events × order validity, trades × quote regimes). A RANGE
  * window cannot express this (two different tables, intervals of
  * varying length); a naive theta-join is a cartesian per key.
  *
  * Shape (the classic interval-join-as-equi-join): each point lands in
  * exactly ONE `bucketUs`-wide temporal bucket; each interval explodes
  * to the buckets it covers (ceil(len/W)+1 of them). Every
  * point-in-interval pair meets exactly once — a point exists in one
  * bucket only, and an interval lists each covering bucket once — in a
  * hash equi-join on (key, bucket); the exact containment predicate
  * refines after the join. At 100 TB this is one explode bounded by
  * interval length + one shuffle on (key, bucket); an interval whose
  * span exceeds `maxBucketsPerInterval` buckets fails LOUDLY inside
  * the executors (a degenerate open-ended interval must not silently
  * explode the plan — raise `bucketUs` instead).
  *
  * Skew note: a hot (key, bucket) pair degenerates only if one key
  * holds many intervals AND many points in the same window — the salt
  * treatment from SpatialJoin applies if a corpus ever shows it; the
  * guard here is the fan-out cap, which bounds the explode side.
  */
object IntervalJoin {

  /** Working-column names that cannot collide with either input's
    * schema (Spark's default resolution is case-insensitive, so the
    * check is too). `withColumn` on a name the caller already uses
    * silently replaces their column — the r10 ADVICE finding. */
  private def freshNames(taken0: Iterable[String], bases: String*)
      : Seq[String] = {
    val taken = scala.collection.mutable.Set(taken0.map(_.toLowerCase).toSeq: _*)
    bases.map { base =>
      val name =
        if (!taken(base.toLowerCase)) base
        else Iterator.from(0).map(i => s"${base}_$i")
          .find(n => !taken(n.toLowerCase)).get
      taken += name.toLowerCase
      name
    }
  }

  /** For each point row: `n_active` = number of intervals of the same
    * key containing the point's instant (inclusive bounds), zero
    * included via a left join back onto the points.
    *
    * `pId` must be unique per point row (it anchors the count-back
    * join); all point columns survive. Times are integer microseconds
    * on BOTH sides — the caller quantizes (the oracle-reproducibility
    * rule: integer inputs make the compare engine-exact). */
  def countContaining(points: DataFrame, pId: String, pKey: String,
      pUs: String, intervals: DataFrame, iKey: String, iStart: String,
      iEnd: String, bucketUs: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxBucketsPerInterval >= 2, "maxBucketsPerInterval too small")
    require(!points.columns.exists(_.equalsIgnoreCase("n_active")),
      "points already carries a column named n_active (the output column)")
    val Seq(bk, kC, sC, eC, nbC, pidC, nC) = freshNames(
      points.columns ++ intervals.columns,
      "_bucket", "_k", "_s", "_e", "_nb", "_pid", "_n_active")
    val p = points.withColumn(bk, expr(s"$pUs DIV $bucketUs"))
    val iv = intervals
      .select(col(iKey).as(kC), col(iStart).as(sC), col(iEnd).as(eC))
      .filter(col(eC) >= col(sC))
      .withColumn(nbC,
        expr(s"$eC DIV $bucketUs") - expr(s"$sC DIV $bucketUs") + 1)
    // executor-side loud fan-out guard: the explode multiplier is the
    // plan's cost model, so an interval wider than the cap must throw,
    // not fan out
    val endB = when(col(nbC) <= maxBucketsPerInterval,
      expr(s"$eC DIV $bucketUs"))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxBucketsPerInterval buckets of " +
          s"$bucketUs us (key="), col(kC).cast("string"),
        lit("): raise bucketUs"))).cast("long"))
    val exploded = iv.withColumn(bk,
        explode(sequence(expr(s"$sC DIV $bucketUs"), endB)))
      .select(col(kC), col(sC), col(eC), col(bk))
    val hits = p.join(exploded,
        p(pKey) === exploded(kC) && p(bk) === exploded(bk))
      .filter(col(pUs) >= col(sC) && col(pUs) <= col(eC))
      .groupBy(col(pId).as(pidC))
      .agg(count(lit(1)).as(nC))
    points.join(hits, points(pId) === hits(pidC), "left")
      .drop(hits(pidC))
      .withColumn("n_active", coalesce(col(nC), lit(0L)))
      .drop(nC)
  }

  /** The matching pairs themselves (point id, interval key, interval
    * bounds) — for callers that need the join, not the count. Each pair
    * appears exactly once. */
  def pairs(points: DataFrame, pId: String, pKey: String, pUs: String,
      intervals: DataFrame, iKey: String, iStart: String, iEnd: String,
      bucketUs: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.select(col(pId).as("_pid"), col(pKey).as("_k"),
        col(pUs).as("_pus"))
      .withColumn("_bucket", expr(s"_pus DIV $bucketUs"))
    val iv = intervals
      .select(col(iKey).as("_k"), col(iStart).as("_s"), col(iEnd).as("_e"))
      .filter(col("_e") >= col("_s"))
      .withColumn("_nb",
        expr(s"_e DIV $bucketUs") - expr(s"_s DIV $bucketUs") + 1)
    val endB = when(col("_nb") <= maxBucketsPerInterval,
      expr(s"_e DIV $bucketUs"))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxBucketsPerInterval buckets of " +
          s"$bucketUs us (key="), col("_k").cast("string"),
        lit("): raise bucketUs"))).cast("long"))
    val exploded = iv.withColumn("_bucket",
        explode(sequence(expr(s"_s DIV $bucketUs"), endB)))
      .select(col("_k"), col("_s"), col("_e"), col("_bucket"))
    p.join(exploded, Seq("_k", "_bucket"))
      .filter(col("_pus") >= col("_s") && col("_pus") <= col("_e"))
      .select(col("_pid").as(pId), col("_k").as(iKey),
        col("_s").as(iStart), col("_e").as(iEnd))
  }
}
