package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join with an equi-key — session attribution,
  * rate-validity windows, event-within-campaign alignment.
  *
  * The naive formulation (`pt.join(iv, key && start <= t && t <= end)`)
  * gives Catalyst only the equi-key to hash on; every point meets every
  * interval of its key before the range predicate filters — quadratic in
  * the per-key row counts. This operator buckets time: each point lands in
  * one fixed-width bucket, each interval explodes to the buckets it
  * overlaps, and the join runs on (key, bucket) with the exact range check
  * as a post-filter. A (point, interval) pair can only meet in the point's
  * single bucket, so no dedup is needed. Choose `bucketSeconds` near the
  * typical interval length: replication factor ≈ len/bucket + 1, while
  * per-bucket candidates shrink by the same ratio.
  */
object RangeJoin {

  /** Join points to every interval (same key) containing them, inclusive
    * on both ends. Both inputs keep their columns; names must not clash
    * apart from the keys. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String, startCol: String,
                      endCol: String, bucketSeconds: Long): DataFrame = {
    val b = "_graft_bucket"
    def bucketOf(c: String) =
      floor(col(c).cast("long") / lit(bucketSeconds)).cast("long")
    val ptB = points.withColumn(b, bucketOf(ptCol))
    val ivB = intervals.withColumn(b,
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    ptB.join(ivB, keys :+ b)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop(b)
  }

  /** Interval×interval overlap join (inclusive endpoints): every same-key
    * pair with `lStart <= rEnd && rStart <= lEnd` — campaign/session
    * alignment, double-booking detection, validity-window intersection.
    *
    * Same bucketing idea as [[pointInInterval]], but a pair of intervals
    * can co-occupy MANY buckets, so the join needs an exactly-once
    * responsibility rule: a pair is emitted only in the bucket containing
    * the overlap's start, `greatest(lStart, rStart)` — a point inside both
    * intervals whenever they overlap at all, so exactly one joined bucket
    * claims each pair. No distinct, no dedup shuffle.
    *
    * Rows with `end < start` are degenerate (Spark's `sequence` would
    * RE-ASCEND a descending range and fabricate buckets) and are dropped
    * from both sides. Replication factor per side ≈ len/bucketSeconds + 1:
    * pick `bucketSeconds` near the typical interval length, and cap
    * pathological interval lengths upstream — one year-long interval at
    * minute buckets is half a million bucket rows. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String, rStart: String,
                      rEnd: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = "_graft_bucket"
    def bucketOf(c: Column) = floor(c.cast("long") / lit(bucketSeconds)).cast("long")
    def explodeBuckets(df: DataFrame, s: String, e: String) =
      df.filter(col(e) >= col(s))
        .withColumn(b, explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    val lB = explodeBuckets(left, lStart, lEnd)
    val rB = explodeBuckets(right, rStart, rEnd)
    lB.join(rB, keys :+ b)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col(b) === bucketOf(greatest(col(lStart), col(rStart))))
      .drop(b)
  }

  /** LEFT OUTER interval overlap: [[intervalOverlap]]'s pairs plus every
    * unmatched left row null-extended — unmatched work surfaces instead
    * of vanishing (the posture the streaming variant shares,
    * [[graft.streaming.StreamIntervalJoin]] with `left_outer`). The
    * bucket-replicated join cannot express outerness directly (a left
    * row occupies many buckets, most of them legitimately matchless), so
    * the unmatched set derives from ONE extra left-anti join on
    * `leftIdCol` (a unique left id) against the matched ids — both sides
    * of the union keep the bucketed plan's per-key bounds. */
  def intervalOverlapLeft(left: DataFrame, right: DataFrame,
                          keys: Seq[String], lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketSeconds: Long,
                          leftIdCol: String): DataFrame = {
    val inner = intervalOverlap(left, right, keys, lStart, lEnd, rStart,
      rEnd, bucketSeconds)
    val leftCols = left.columns.toSet
    val rightOnly = right.schema.filter(f => !leftCols.contains(f.name))
    val unmatched = left
      .join(inner.select(col(leftIdCol)).distinct(), Seq(leftIdCol),
        "left_anti")
      .select(left.columns.map(col) ++
        rightOnly.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    // degenerate left rows (end < start) are dropped by intervalOverlap
    // and must not resurface as "unmatched"
    inner.unionByName(unmatched.filter(col(lEnd) >= col(lStart)))
  }
}
