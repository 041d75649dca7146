package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `sample()`/reservoir approaches are nondeterministic under retries and
  * repartitioning — poison for reproducible dataset builds. Hash sampling
  * decides per ROW from a stable key: keep the row when its md5-hex prefix
  * sorts below the rate-derived threshold. Properties that matter at
  * 100 TB: no shuffle (a pure filter, pushed to the scan), identical
  * results on any partitioning/cluster size, trivially portable to any
  * engine with md5 (the DuckDB oracle states the same predicate), and
  * composable — the same key always lands in the same side of the cut, so
  * growing the rate strictly grows the sample.
  */
object Sampling {

  /** Lowercase 8-hex-char threshold for a sampling rate in [0, 1]. */
  def thresholdHex(rate: Double): String = {
    val r = math.min(math.max(rate, 0.0), 1.0)
    f"${math.min((r * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep-condition for one rate: rate ≥ 1 is an explicit keep-all —
    * the hex threshold caps at "ffffffff" and the comparison is strict, so
    * without the special case the ~2^-32 of keys hashing exactly to the cap
    * would be dropped at rate 1.0. */
  private def keep(key: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true)
    else hashBucket(key) < lit(thresholdHex(rate))

  /** Uniform deterministic sample: keep rows with md5(key) prefix below
    * the threshold; rate ≥ 1.0 keeps every row. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keep(col(keyCol), rate))

  /** The row's stable sampling coordinate (md5-hex prefix of the key). */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Stratified deterministic sample: per-stratum rates (e.g. keep 50% of
    * English, 10% of everything else — the usual language/source
    * rebalancing step in corpus curation). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val cond = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(stratumCol) === stratum, keep(col(keyCol), rate))
    }.otherwise(keep(col(keyCol), defaultRate))
    df.filter(cond)
  }

  /** Deterministic EXACT-k per-group sample — "give me (up to) k docs per
    * language/source/shard", the fixed-budget counterpart of the rate-based
    * [[stratifiedSample]]. Each group keeps the k rows whose stable md5
    * coordinate sorts lowest (ties broken by key), so the pick is uniform-ish
    * in the key, reproducible under retries and repartitioning, and — unlike
    * a rate — guaranteed to return exactly min(k, |group|) rows per group.
    *
    * One shuffle on the group column (the window partition). A hot group is
    * not a skew hazard at 100 TB IF k is small: rank-k selection could be
    * done with a per-partition pre-trim (keep the k lowest coordinates per
    * partition before the shuffle); Spark's window has no such combiner, so
    * for mega-groups compose with [[hashSample]] first to knock the group
    * down to O(k·fanout) candidates cheaply, then apply this for the exact
    * budget. */
  def perGroupSample(df: DataFrame, keyCol: String, groupCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("_graft_rk", row_number().over(w))
      .filter(col("_graft_rk") <= k)
      .drop("_graft_rk")
  }
}
