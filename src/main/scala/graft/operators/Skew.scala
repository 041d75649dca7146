package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot join keys (SURVEY.md §7.4 item 6 —
  * "salted keys for skewed merges").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the deterministic tool when one key dominates a
  * fact-fact join (e.g. a single business class holding half the rows).
  * The skewed side gets a salt derived from a distributing column; the
  * compact side is replicated across all salt values, so the join key
  * becomes (key, salt) and the hot key spreads over `saltN` reducers.
  */
object Skew {

  /** Salted equi-join: `big` is the skewed side, `small` the replicated
    * side. `distCol` is any big-side column with per-row variety (a row id,
    * line number, payload hash) — the salt must NOT be derived from the
    * join key or the hot key stays on one reducer.
    * Result rows equal the plain inner join exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 distCol: String, saltN: Int = 16): DataFrame = {
    val salted = big.withColumn("_graft_salt",
      pmod(xxhash64(col(distCol)), lit(saltN.toLong)))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(saltN - 1L))))
    // a salted join IS a shuffle join — if the small side fit a broadcast,
    // you would broadcast it unsalted instead. Without the hint Catalyst
    // happily broadcasts the saltN-times-replicated side, paying a
    // saltN-times-larger broadcast build for nothing.
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_graft_salt")
      .drop("_graft_salt")
  }

  /** Two-phase aggregation with an explicit salt — useful when a custom
    * aggregate has no partial implementation (Spark's built-ins already
    * combine map-side; this is for expensive buffers like collect_set over
    * a hot key). `partial` aggregates per (key, salt); `finalAgg` folds the
    * partials per key. */
  def saltedAgg(df: DataFrame, keys: Seq[String], distCol: String,
                saltN: Int)(
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_graft_salt",
      pmod(xxhash64(col(distCol)), lit(saltN.toLong)))
    salted.groupBy((keys :+ "_graft_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}
