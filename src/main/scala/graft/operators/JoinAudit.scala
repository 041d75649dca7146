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
  * total broadcast back onto the top-k rows. Keys group RAW — a cast
  * would silently null non-numeric keys out of the audit and report
  * "no explosion" for a join that explodes. Per-key `contrib` and the
  * total both run in DECIMAL(38,0) (one hot key can exceed Long in
  * *output* rows while both inputs still fit a cluster); the BIGINT
  * gate outputs null past ±9.2e18, at which point the answer is "do
  * not run this join" regardless of the digits. */
object JoinAudit {

  /** Top-`topK` contributing keys by exact join output rows:
    * `(join_key, n_left, n_right, contrib, total_rows, n_keys,
    * contrib_ppm)` ordered by (contrib DESC, key); `join_key` keeps
    * the left key's type. `total_rows` / `n_keys` cover ALL matching
    * keys, not just the top-k. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      lKey: String, rKey: String,
                      topK: Int = 20): DataFrame = {
    require(topK >= 1, "joinCardinality: topK must be positive")
    val dec = "decimal(38,0)"
    val la = left.groupBy(col(lKey).as("join_key"))
      .agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(col(rKey).as("join_key"))
      .agg(count(lit(1)).as("n_right"))
    val m = la.join(ra, Seq("join_key"))
      .withColumn("_contrib", col("n_left").cast(dec) * col("n_right"))
    val tot = m.agg(sum(col("_contrib")).as("_tot"),
      count(lit(1)).as("n_keys"))
    val lt = org.apache.spark.sql.types.LongType
    m.crossJoin(broadcast(tot))
      .select(col("join_key"), col("n_left"), col("n_right"),
        col("_contrib").try_cast(lt).as("contrib"),
        col("_tot").try_cast(lt).as("total_rows"), col("n_keys"),
        expr("_contrib * 1000000 div _tot")
          .try_cast(lt).as("contrib_ppm"),
        col("_contrib").as("_ord"))
      .orderBy(col("_ord").desc, col("join_key"))
      .limit(topK)
      .drop("_ord")
  }
}
