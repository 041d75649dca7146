package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping.
  *
  * Sorting a table by one column makes per-file min/max ranges tight on that
  * column and useless on every other; interleaving the bits of several
  * columns' rank spaces gives a single sort key whose locality is shared
  * across ALL of them — after a z-ordered write, a filter on ANY of the
  * z-columns prunes most files from their footer ranges. This is the same
  * layout trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`; here it is a
  * plain column expression + range repartition, so it composes with any sink
  * that records per-file ranges (the lakesim write path does, and parquet
  * row-group stats give it to every reader for free).
  *
  * The z-value is built from bounded non-negative integer coordinates
  * (caller maps raw values into `0 until 2^bits` — ranks, bucketed
  * timestamps, dictionary codes). Bit interleave uses only integer
  * shifts/masks (codegen'd, whole-stage), and is restatable in any engine
  * with bit ops — the q61 oracle recomputes it in SQL.
  *
  * At 100 TB: `cluster` range-repartitions by the z-value — a skew-safe
  * total ordering (range boundaries from a sample), so writers emit
  * similar-sized files each covering a compact z-cube of the key space.
  */
object ZOrder {

  /** Interleaved z-value of coordinate columns (column i owns every
    * len(cols)-th bit starting at bit i). Coordinates must lie in
    * [0, 2^bits); values are masked to `bits` bits defensively. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits * cols.size <= 62, s"z-value would exceed a long: $bits bits × ${cols.size} columns")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(lit((1L << bits) - 1)), i)
        .bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket of a numeric column into [0, 2^bits) given its
    * (driver-known) min/max — the simplest rank proxy; exact ranks via
    * ntile/percent_rank work too but cost a shuffle. */
  def bucketize(c: Column, min: Double, max: Double, bits: Int = 16): Column = {
    val buckets = (1L << bits).toDouble
    val span = math.max(max - min, Double.MinPositiveValue)
    // clamp BOTH ends: a below-min value (stale driver-known min) would
    // floor to a negative bucket that zValue's bit mask wraps to the TOP of
    // the range, silently clustering it with the max rows. NULLs get bucket
    // 0 explicitly — least()/greatest() SKIP nulls, so a null coordinate
    // would otherwise also land in the top bucket
    when(c.isNull, lit(0L)).otherwise(
      greatest(least(floor((c.cast("double") - lit(min)) / lit(span) * lit(buckets)),
        lit((1L << bits) - 1L)), lit(0L)).cast("long"))
  }

  /** Cluster `df` for writing: range-repartition + local sort by the
    * z-value of the given coordinate columns. `numFiles` controls output
    * granularity (files ≈ partitions under a per-partition writer). */
  def cluster(df: DataFrame, coords: Seq[Column], numFiles: Int,
              bits: Int = 16): DataFrame = {
    val z = zValue(coords, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
