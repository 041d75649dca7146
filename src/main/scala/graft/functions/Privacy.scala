package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity for training-data release: no combination of
  * quasi-identifier values may identify fewer than k rows. Complements
  * [[Pii]] (which scrubs direct identifiers from free text); this guards the
  * STRUCTURED columns that survive scrubbing — the Sweeney result is that
  * (zip, birthdate, sex)-style quasi-identifier tuples re-identify most
  * individuals even with names removed.
  *
  * Two standard mechanisms, composable (generalize first, then suppress
  * what is still too small), plus the audits that make the invariants data:
  *  - generalization: coarsen a numeric column into fixed-width bands;
  *  - suppression: rows whose quasi-identifier group has fewer than k
  *    members get every quasi column replaced by `*`;
  *  - k-anonymity audit: every released quasi group with its size and a
  *    `violating` verdict;
  *  - l-diversity audit: k-anonymity does not stop a HOMOGENEITY attack —
  *    a k-sized group whose sensitive column is constant still leaks the
  *    sensitive value; the audit demands >= l distinct sensitive values
  *    per quasi group (Machanavajjhala et al., ICDE'06);
  *  - t-closeness audit: l-diversity does not stop a SKEW attack — the
  *    audit bounds each group's sensitive distribution to within total
  *    variation distance t of the global one, in exact integer
  *    arithmetic (Li, Li & Venkatasubramanian, ICDE'07).
  *
  * Scale shape (100 TB): group sizes come from ONE map-side-combinable
  * `groupBy(quasi).count` (quasi-cardinality-sized result), joined back on
  * the quasi tuple — never a `PARTITION BY quasi` window over the raw rows
  * (a dominant quasi tuple, e.g. the majority language×source, would funnel
  * onto one task). The suppressed output is a projection; nothing collects.
  */
object Privacy {

  /** Null-group sentinel for the internal JOIN KEY only (released values
    * are never rewritten through it): a NUL-prefixed tag no sane data
    * contains. A genuine string value equal to the sentinel would group
    * WITH the null group for counting purposes (documented, spec-pinned) —
    * it is still released verbatim, never nulled. */
  private[functions] val NullSentinel = "\u0000null"

  /** Fixed-width band generalization: `value` → the band's inclusive lower
    * bound (floor semantics; negative values band toward -inf). */
  def generalizeBand(value: Column, width: Long): Column =
    (floor(value / width) * width).cast("long")

  /** Suppress quasi-identifier columns of rows in groups smaller than k:
    * every column in `quasiCols` becomes `*` when the exact group count is
    * < k; other columns pass through untouched. Null quasi values group
    * together (null-safe key via [[NullSentinel]]) and suppress to `*` like
    * any other under-k value. Released quasi columns come back
    * STRING-typed (the `*` and the original value share one column —
    * spec-pinned); released values are the originals, cast — a value
    * literally equal to the sentinel round-trips unchanged. */
  def kAnonymizeSuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    // separate null-safe KEY columns: counts and the join share them, and
    // the original quasi values stay untouched for the released projection
    val keyName = quasiCols.map(c => c -> s"_qk_$c").toMap
    val keyed = keyName.foldLeft(df) { case (acc, (c, kc)) =>
      acc.withColumn(kc,
        coalesce(col(c).cast("string"), lit(NullSentinel)))
    }
    val counts = keyed.groupBy(quasiCols.map(c => col(keyName(c))): _*)
      .agg(count(lit(1)).as("_qcount"))
    val small = col("_qcount") < k
    val out = keyed.join(counts, quasiCols.map(keyName))
    val projected = df.columns.map { c =>
      if (quasiCols.contains(c))
        when(small, lit("*")).otherwise(col(c).cast("string")).as(c)
      else col(c)
    }
    out.select(projected.toIndexedSeq: _*)
  }

  /** Post-condition audit: the k-anonymity invariant as data — every quasi
    * group in `released` (including the suppressed `*` group) with its size;
    * `violating = size < k && not the suppressed group`. A green release has
    * zero violating rows. */
  def kAnonymityAudit(released: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    released.groupBy(quasiCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("violating",
        col("group_size") < k && !isStarGroup(quasiCols))

  /** l-diversity audit: every quasi group in `released` with its exact
    * count of DISTINCT sensitive values; `violating = n_sensitive < l &&
    * not the suppressed `*` group`. Guards the homogeneity attack that
    * k-anonymity admits (a k-sized group with one disease value leaks it).
    * Null sensitive values count as one value (they reveal "unknown",
    * which is itself information — spec-pinned).
    *
    * Scale shape: one exact `count_distinct` aggregation — partial
    * distinct-aggregate buffers combine map-side, the result is
    * quasi-cardinality-sized, and no window ever touches the raw rows
    * (same discipline as [[kAnonymityAudit]]). */
  def lDiversityAudit(released: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    released.groupBy(quasiCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count_distinct(
          coalesce(col(sensitiveCol).cast("string"), lit(NullSentinel)))
        .as("n_sensitive"))
      .withColumn("violating",
        col("n_sensitive") < l && !isStarGroup(quasiCols))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07): l-diversity
    * still leaks through SKEW — a group with l distinct diseases, 99% of
    * them one value, reveals that value with near-certainty. The audit
    * demands the sensitive distribution WITHIN each quasi group stay
    * within distance `t = tNum/tDen` of the global distribution, measured
    * by total variation distance (= the categorical EMD):
    * `TVD(g) = (1/2) Σ_s |n_gs/n_g − n_s/N|`.
    *
    * Everything is EXACT integer arithmetic over the common denominator
    * `n_g·N`: the audit emits `tvd_num = Σ_s |n_gs·N − n_s·n_g|` and
    * `tvd_den = 2·n_g·N`, and `violating ⇔ tvd_num·tDen > tNum·tvd_den`
    * (the `*` group exempt) — no float division anywhere, so the verdict
    * is engine-portable and hash-stable.
    *
    * Scale shape: absent (group, sensitive) pairs are NEVER materialized —
    * `Σ_{s absent} n_s·n_g = n_g·(N − Σ_{s present} n_s)`, so the work is
    * one (quasi, sensitive) count, a sensitive-cardinality-sized join,
    * and one group-sized re-aggregation; no quasi×domain grid, no window.
    * Headroom: `tDen · 2·n_g·N < 2^63` — safe past 10^8 rows at tDen ≤
    * 100; swap the products to DECIMAL(38,0) beyond. */
  def tClosenessAudit(released: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tNum >= 0 && tDen > 0, s"t = $tNum/$tDen must be a fraction >= 0")
    // the joins below key on the quasi tuple, and join equality is
    // null-UNSAFE — a null quasi group would silently vanish from the
    // audit (the exact groups it exists to flag), so the internal key is
    // sentinel-coalesced like kAnonymizeSuppress's; the output maps the
    // sentinel back to null (same documented sentinel-collision edge)
    val quasiKeys = quasiCols.map(c =>
      coalesce(col(c).cast("string"), lit(NullSentinel)).as(c))
    val sv = coalesce(col(sensitiveCol).cast("string"), lit(NullSentinel))
      .as("_sv")
    val gsv = released.groupBy(quasiKeys :+ sv: _*)
      .agg(count(lit(1)).as("n_gs"))
    val glob = gsv.groupBy(col("_sv")).agg(sum(col("n_gs")).as("n_s"))
    val tot = glob.agg(sum(col("n_s")).as("_N")) // 1-row broadcast
    val ng = gsv.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("n_gs")).as("n_g"))
    gsv.join(glob, "_sv")
      .join(ng, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy((quasiCols.map(col) :+ col("n_g") :+ col("_N")): _*)
      .agg(
        sum(abs(col("n_gs") * col("_N") - col("n_s") * col("n_g")))
          .as("_present_sum"),
        sum(col("n_s")).as("_present_ns"))
      .select(
        quasiCols.map(c => nullif(col(c), lit(NullSentinel)).as(c)) :+
        col("n_g").as("group_size") :+
        (col("_present_sum") +
          col("n_g") * (col("_N") - col("_present_ns"))).as("tvd_num") :+
        (lit(2L) * col("n_g") * col("_N")).as("tvd_den"): _*)
      .withColumn("violating",
        col("tvd_num") * tDen > lit(tNum) * col("tvd_den") &&
          !isStarGroup(quasiCols))
  }

  /** Null-safe "is this the suppressed all-`*` group" test: a NULL quasi
    * value must read as not-star (false), never as SQL NULL — `NULL && x`
    * would otherwise null out `violating` for exactly the null-quasi
    * groups the audits exist to flag, and a `.filter(col("violating"))`
    * consumer would silently drop the leak. */
  private def isStarGroup(quasiCols: Seq[String]): Column =
    quasiCols.map(c => coalesce(col(c) === "*", lit(false)))
      .reduce(_ && _)
}
