package graft.operators

import org.apache.spark.sql.DataFrame
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
}
