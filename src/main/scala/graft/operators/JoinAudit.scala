package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality PRE-FLIGHT: the exact output size and per-key
  * blow-up profile of an inner equi-join, computed WITHOUT running the
  * join — at 100 TB the question "would this join explode" must be
  * answerable from two distinct-key-sized aggregates, not from the
  * join itself (whose output is precisely what might not fit). The
  * per-key contribution `n_left · n_right` is exact (an equi-join
  * emits exactly that many rows per key), so this is the ground truth
  * a planner's NDV-based estimate approximates — run it before
  * shipping a new join at scale, alarm on `contrib_ppm` concentration
  * (one hot key owning >10% of the output is a salting candidate, the
  * AQE skew-join threshold rationale).
  *
  * Scale shape: two map-side-combinable per-key counts, one join on
  * the (key, n) frames (distinct-key-sized, NOT row-sized), one 1-row
  * total broadcast back onto the top-k rows. The total runs in
  * DECIMAL(38,0) (a hot-key join can exceed Long in *output* rows
  * while both inputs still fit a cluster); the BIGINT gate outputs
  * null past ±9.2e18, at which point the answer is "do not run this
  * join" regardless of the digits. */
object JoinAudit {

  /** Top-`topK` contributing keys by exact join output rows:
    * `(join_key, n_left, n_right, contrib, total_rows, n_keys,
    * contrib_ppm)` ordered by (contrib DESC, key). `total_rows` /
    * `n_keys` cover ALL matching keys, not just the top-k. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      lKey: String, rKey: String,
                      topK: Int = 20): DataFrame = {
    require(topK >= 1, "joinCardinality: topK must be positive")
    val dec = "decimal(38,0)"
    val la = left.groupBy(col(lKey).cast("long").as("join_key"))
      .agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(col(rKey).cast("long").as("join_key"))
      .agg(count(lit(1)).as("n_right"))
    val m = la.join(ra, Seq("join_key"))
      .withColumn("contrib", col("n_left") * col("n_right"))
    val tot = m.agg(sum(col("contrib").cast(dec)).as("_tot"),
      count(lit(1)).as("n_keys"))
    m.crossJoin(broadcast(tot))
      .select(col("join_key"), col("n_left"), col("n_right"),
        col("contrib"),
        col("_tot").cast("long").as("total_rows"), col("n_keys"),
        expr(s"CAST(contrib AS $dec) * 1000000 div _tot")
          .cast("long").as("contrib_ppm"))
      .orderBy(col("contrib").desc, col("join_key"))
      .limit(topK)
  }
}
