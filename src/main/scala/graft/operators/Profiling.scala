package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational profiling audits — the discovery side of the D1/A-family
  * metadata surface: before a table's metadata claims "o_orderkey is a
  * key", "every lineitem has an order", "status is determined by
  * state", something has to CHECK it against the data, and keep
  * checking it on every load. Two audits:
  *
  *  - functional dependency (lhs → rhs): does each lhs value map to at
  *    most one rhs value? Violations are counted two ways — lhs groups
  *    that fan out, and the number of surplus rhs values — because "3
  *    keys each with 2 variants" and "1 key with 7 variants" demand
  *    different fixes.
  *  - referential integrity (child.fk ⊆ parent.pk): orphan counts per
  *    declared relationship.
  *
  * Scale shape: FD is one map-side-combinable `groupBy(lhs)` +
  * `countDistinct(rhs)` per pair, folded to a 1-row report. RI is one
  * distinct-build on the parent key + a broadcast-friendly left-anti
  * (parent keys after distinct are usually dimension-sized; AQE picks
  * broadcast when they are). Nothing row-scale ever reaches the
  * driver.
  *
  * Null semantics (both SQL-standard): a NULL rhs never violates an
  * FD (`countDistinct` skips it); a NULL child key is never an orphan
  * (a null FK matches nothing and is legal).
  */
object Profiling {

  /** One row per (lhs → rhs) candidate: `(lhs, rhs, n_lhs,
    * n_violating_lhs, n_extra_rhs, holds)` — distinct lhs values, lhs
    * values mapping to ≥ 2 rhs values, surplus rhs mappings beyond one
    * per lhs, and the verdict. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one lhs -> rhs pair")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("_l"))
        .agg(countDistinct(col(rhs)).as("_k"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("_k") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
          sum(greatest(col("_k") - 1, lit(0L))).as("n_extra_rhs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_lhs"),
          col("n_violating_lhs"), col("n_extra_rhs"),
          (col("n_extra_rhs") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Benford first-significant-digit shares in parts-per-million —
    * log10(1 + 1/d) · 10⁶, rounded; the standard audit constants. */
  val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301030L, 2 -> 176091L,
    3 -> 124939L, 4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
    8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-digit audit — the anomalous-amounts tripwire
    * (fabricated or unit-mangled monetary columns drift off the
    * log-uniform digit law). One row per digit: observed count, the
    * expected ppm share, the exact scaled deviation
    * `|n · 10⁶ − N · ppm|`, and `off_digit` when the deviation exceeds
    * `tolPpm · N` — all integer arithmetic (the only non-integers in
    * Benford's law are the published constants, carried as literal ppm
    * in engine and oracle alike; first digits come from the exact
    * integer's string form, never from float formatting or logs).
    * `valueCol` is cast to long; non-positive values drop (no first
    * significant digit). Long bound: `n · 10⁶` — exact to ~9·10¹² rows.
    *
    * Scale shape: one scan, one 9-row aggregate, a broadcast total. */
  def benfordAudit(df: DataFrame, valueCol: String,
                   tolPpm: Long): DataFrame = {
    require(tolPpm >= 0, "tolerance must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val c = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x") > 0)
      .select(substring(col("x").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("total"))
    val e = BenfordPpm.map { case (d, p) => (d.toLong, p) }
      .toDF("digit", "expected_ppm")
    e.join(c, Seq("digit"), "left").crossJoin(broadcast(t))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("expected_ppm"),
        abs(coalesce(col("n"), lit(0L)) * 1000000L -
          col("total") * col("expected_ppm")).as("dev"),
        (abs(coalesce(col("n"), lit(0L)) * 1000000L -
          col("total") * col("expected_ppm")) >
          lit(tolPpm) * col("total")).as("off_digit"))
  }

  /** Per-group categorical profile: `(group, n, n_distinct, mode,
    * mode_n, gini_num, gini_den)` — the shape summary for a label-ish
    * column (status codes, priorities, sources): majority value (ties
    * to the LARGER value under the (count, value) struct order —
    * deterministic in any engine), and Gini impurity as the exact
    * rational `1 − Σ(cᵢ/n)² = (n² − Σcᵢ²) / n²` (no logs — the
    * entropy-free impurity measure that stays hash-comparable).
    * Two map-side-combinable aggregations, value-cardinality
    * intermediate. Null values are a category like any other. Long
    * bound: n² — exact to ~3·10⁹ rows per group; past that keep the
    * counts and form the rational in DECIMAL(38,0). */
  def categoricalProfile(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("g"),
        col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        max(struct(col("c"), col("v"))).as("m"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("g").as(groupCol), col("n"), col("n_distinct"),
        col("m.v").as("mode"), col("m.c").as("mode_n"),
        (col("n") * col("n") - col("ss")).as("gini_num"),
        (col("n") * col("n")).as("gini_den"))

  /** One row per declared relationship: `(relation, n_child,
    * n_orphans, intact)`. `n_child` counts non-null child keys (a null
    * FK is legal, not an orphan). */
  def riAudit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, relation: String): DataFrame = {
    val c = child.select(col(childKey).as("_ck"))
      .filter(col("_ck").isNotNull)
    val p = parent.select(col(parentKey).as("_ck")).distinct()
    val orphans = c.join(p, Seq("_ck"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    c.agg(count(lit(1)).as("n_child"))
      .crossJoin(broadcast(orphans))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_orphans"), (col("n_orphans") === 0).as("intact"))
  }
  /** Per-group exact Pearson correlation audit — "are these two
    * columns actually related": the five sufficient sums ride one
    * map-side-combinable aggregate (x re-based per group, the
    * [[TimeSeries.groupTrend]] convention), and the strength verdict
    * `corr² >= (tNum/tDen)²` is decided by the cross-multiplied exact
    * comparison `cov² · tDen² >= var_x · var_y · tNum²` in
    * DECIMAL(38,0) — no division, no floats, both engines agree
    * bit-for-bit. `direction` is the sign of the covariance numerator;
    * `related` is NULL when either variance is zero (correlation
    * undefined — constant column), mirroring groupTrend's degenerate
    * rule. `sxy`/`sxx`/`syy`/`cov_num` are emitted as BIGINT for the
    * gate (nulls past ±9.2e18; the verdict itself stays
    * decimal-exact). */
  def correlationAudit(df: DataFrame, groupCol: String, xCol: String,
                       yCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tDen > 0 && tNum >= 0,
      s"correlationAudit: need tNum >= 0, tDen > 0, got $tNum/$tDen")
    val dec = "decimal(38,0)"
    val wMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"))
    val b = df.select(col(groupCol).as("g"), col(xCol).cast("long").as("x0"),
        col(yCol).cast("long").as("y"))
      .withColumn("x", col("x0") - min(col("x0")).over(wMin))
    // all three product sums accumulate in DECIMAL(38,0): x·y and x·x
    // reach overflow scale on realistic inputs (big cent values at
    // warehouse row counts) just like y·y, and a silent Long wrap
    // would flip `direction` and `related`
    val s = b.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
    val cov = col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy")
    val varX = col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx")
    val varY = col("n").cast(dec) * col("syy") - col("sy").cast(dec) * col("sy")
    val lt = org.apache.spark.sql.types.LongType
    s.select(col("g").as(groupCol), col("n"), col("sx"), col("sy"),
      col("sxy").try_cast(lt).as("sxy"), col("sxx").try_cast(lt).as("sxx"),
      col("syy").try_cast(lt).as("syy"),
      cov.try_cast(lt).as("cov_num"),
      when(cov > 0, lit(1L)).when(cov < 0, lit(-1L)).otherwise(lit(0L))
        .as("direction"),
      when(varX === 0 || varY === 0, lit(null).cast("boolean"))
        .otherwise(cov * cov * lit(tDen) * lit(tDen) >=
          varX * varY * lit(tNum) * lit(tNum)).as("related"))
  }
  /** Per-group LOG2 (exponential-bucket) histogram — the cheap exact
    * distribution profile: one row per (group, power-of-two bucket)
    * with count and exact min/max, the shape report for long-tailed
    * columns (latencies, sizes, counts) where uniform buckets waste
    * rows on the head and lose the tail. Bucket = floor(log2(v)),
    * computed EXACTLY as `length(bin(v)) − 1` (binary-string length —
    * no float log anywhere, both engines agree on every boundary);
    * v = 0 lands in bucket −1, negatives fail loudly. One map-side-
    * combinable aggregate — nothing else. */
  def log2Histogram(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val v = when(col(valueCol).cast("long") >= 0, col(valueCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"log2Histogram: negative $valueCol has no log2 bucket: "),
        col(valueCol).cast("string"))).cast("long"))
    df.select(col(groupCol).as("g"), v.as("v"))
      .withColumn("bucket",
        when(col("v") === 0, lit(-1L))
          .otherwise(length(bin(col("v"))).cast("long") - 1))
      .groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(col("g").as(groupCol), col("bucket"), col("n"),
        col("min_v"), col("max_v"))
  }
}
