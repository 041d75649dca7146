package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distinct counting via bitmap buckets — the EXACT counterpart
  * to the HLL registers for BOUNDED dense integer domains (user ids,
  * dimension keys): value v sets bit `v mod 63` of bucket `v div 63`,
  * `bit_or` folds per (group, bucket), and popcounts sum to the exact
  * distinct count. The bitmap is a commutative-idempotent monoid like
  * the HLL register file (OR-merge; re-delivery harmless), so it
  * MAINTAINS incrementally — the exactness [[graft.operators
  * .AggMaintain]]'s value-set argument says a scalar state can't have,
  * bought by state linear in the DOMAIN (domain/63 longs per group)
  * instead of constant. Use it when the key space is machine-bounded
  * (the warehouse's surrogate keys); use HLL when it isn't.
  *
  * 63 bits per bucket, not 64: both Spark's `shiftleft` and DuckDB's
  * `<<` run on SIGNED longs, and `1 << 63` overflows (DuckDB errors,
  * Spark wraps) — 63 keeps every shift in range in both engines with
  * identical results. Negative values fail LOUDLY in the row path
  * (they have no bit). One map-side-combinable aggregation. */
object Bitmap {

  /** `(groupCol, bucket, bits)` — the exact bitmap rows. */
  def bitmaps(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol).as("g"),
        when(col(valueCol).cast("long") >= 0, col(valueCol).cast("long"))
          .otherwise(raise_error(lit(
            s"bitmaps: negative $valueCol has no bit — offset the " +
              "domain first"))).as("v"))
      .select(col("g"), expr("v div 63").as("bucket"),
        expr("shiftleft(cast(1 as bigint), cast(v % 63 as int))").as("b"))
      .groupBy(col("g"), col("bucket"))
      .agg(bit_or(col("b")).as("bits"))
      .select(col("g").as(groupCol), col("bucket"), col("bits"))

  /** OR-merge two bitmap frames (idempotent — overlap and re-delivery
    * are free), the incremental-maintenance fold. */
  def merge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("bucket"), col("bits"))
      .unionByName(b.select(col(groupCol), col("bucket"), col("bits")))
      .groupBy(col(groupCol), col("bucket"))
      .agg(bit_or(col("bits")).as("bits"))

  /** Exact distinct counts off a bitmap frame: `(groupCol,
    * n_distinct)`. */
  def distinctCounts(bm: DataFrame, groupCol: String): DataFrame =
    bm.groupBy(col(groupCol))
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_distinct"))
}
