package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized per-key aggregate — the
  * metrics-table pattern the reference runs as a nightly full recompute
  * (reference `utilities/utilities.py` row-count/agg reconciliation runs a
  * fresh query per day): at 100 TB the full rescan is the bottleneck, so the
  * engine instead keeps the aggregate STATE `(key, cnt, sum, min, max)` as a
  * table and folds each append-only delta batch into it.
  *
  * Algebra: count/sum/min/max are all commutative monoids, so
  * `state(base ∪ delta) = state(base) ⊕ state(delta)` — fold the delta's
  * OWN aggregate (map-side combinable, delta-sized) into the stored state
  * with a full-outer merge on key. Deletes/updates are out of scope by
  * construction (min/max are not invertible); route those through
  * [[Scd2]]/[[SnapshotDiff]] recompute paths instead.
  *
  * Scale shape: the delta aggregate shuffles delta-cardinality rows; the
  * merge is one key-partitioned full-outer join between state and the
  * (small) delta aggregate — AQE broadcasts the delta side when it fits, and
  * the 100 TB base is NEVER rescanned. Sums use DECIMAL(38,2), not DOUBLE:
  * incremental folding reorders additions, and only a decimal sum is
  * order-insensitive (exact), so the maintained state is bit-identical to a
  * full recompute — which is exactly the invariant the q190 gate checks.
  */
object AggMaintain {

  /** Aggregate state of one batch: `(key, cnt, sum_v, min_v, max_v)` with
    * `sum_v` DECIMAL(38,2) (null values ignored by sum/min/max, counted by
    * cnt). Build the initial state with this, then fold deltas in with
    * [[merge]]. */
  def state(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol).cast("decimal(38,2)")).as("sum_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"))

  /** Fold `deltaState` into `baseState` (both in [[state]]'s shape): keys in
    * either side survive, shared keys combine monoid-wise. */
  def merge(baseState: DataFrame, deltaState: DataFrame, keyCol: String): DataFrame = {
    val b = baseState.select(col(keyCol), col("cnt").as("_bc"),
      col("sum_v").as("_bs"), col("min_v").as("_bmin"), col("max_v").as("_bmax"))
    val d = deltaState.select(col(keyCol), col("cnt").as("_dc"),
      col("sum_v").as("_ds"), col("min_v").as("_dmin"), col("max_v").as("_dmax"))
    b.join(d, Seq(keyCol), "full_outer").select(
      col(keyCol),
      (coalesce(col("_bc"), lit(0L)) + coalesce(col("_dc"), lit(0L))).as("cnt"),
      // sum over {base, delta} where either may be null (all-null values or
      // absent side): null + x must be x, so coalesce each side to 0 only
      // when the OTHER side is present, else stay null
      when(col("_bs").isNull && col("_ds").isNull, lit(null))
        .otherwise(coalesce(col("_bs"), lit(0).cast("decimal(38,2)")) +
          coalesce(col("_ds"), lit(0).cast("decimal(38,2)")))
        .cast("decimal(38,2)").as("sum_v"),
      least(col("_bmin"), col("_dmin")).as("min_v"),
      greatest(col("_bmax"), col("_dmax")).as("max_v"))
  }

  /** One-shot convenience: fold a raw delta batch into a stored state. */
  def maintain(baseState: DataFrame, delta: DataFrame,
               keyCol: String, valCol: String): DataFrame =
    merge(baseState, state(delta, keyCol, valCol), keyCol)

  /** Per-key DISTINCT-count state as an HLL register file `(key,
    * hll_regs)` — the non-invertible monoid [[state]] cannot carry: exact
    * distinct counting would need the full value set per key, but HLL
    * registers are a bounded (m = 2^p ints) commutative-idempotent-monoid
    * summary, so `regs(base ∪ delta) = regs(base) ⊔ regs(delta)`
    * element-wise-max — maintained registers are BIT-IDENTICAL to a
    * one-shot recompute under any fold order/batching (the q193 gate
    * invariant; idempotence even makes re-delivered rows harmless).
    * Values hash through the portable md5 [[graft.functions.Sketches
    * .hash60]] on the value's STRING form, so an external engine restates
    * every register. Estimate via [[graft.functions.Sketches
    * .hllEstimate]]; gate on the registers and treat the float as
    * derived. */
  def distinctState(df: DataFrame, keyCol: String, valCol: String,
                    p: Int): DataFrame =
    df.select(col(keyCol),
        graft.functions.Sketches.hash60(col(valCol).cast("string")).as("_h"))
      .groupBy(col(keyCol))
      .agg(graft.functions.Sketches.hllSketch(col("_h"), p).as("hll_regs"))

  /** Fold a delta register state into the stored base state: keys in
    * either side survive; shared keys take the element-wise register
    * max (= the HLL union), through the same spec-pinned
    * [[graft.functions.Sketches.hllMerge]] aggregate the sketch family
    * uses — one map-side-combinable aggregation over base ∪ delta, no
    * second element-wise-max implementation to keep bit-identical. The
    * base VALUES are never rescanned; the base state rows do re-shuffle
    * (state-cardinality-sized, the same exchange the full-outer-join
    * formulation pays). `p` must match the one the state was built
    * with. */
  def distinctMerge(baseState: DataFrame, deltaState: DataFrame,
                    keyCol: String, p: Int): DataFrame =
    baseState.select(col(keyCol), col("hll_regs"))
      .unionByName(deltaState.select(col(keyCol), col("hll_regs")))
      .groupBy(col(keyCol))
      .agg(graft.functions.Sketches.hllMerge(col("hll_regs"), p)
        .as("hll_regs"))

  /** One-shot convenience: fold a raw delta batch into a stored
    * register state. `p` must match the one the state was built with. */
  def maintainDistinct(baseState: DataFrame, delta: DataFrame,
                       keyCol: String, valCol: String, p: Int): DataFrame =
    distinctMerge(baseState, distinctState(delta, keyCol, valCol, p),
      keyCol, p)

  /** Per-key QUANTILE state as a bounded mergeable sketch `(key,
    * q_sketch)` — [[graft.functions.Sketches.quantileSketch]]'s
    * distinct-value histogram restricted to the `capacity`
    * smallest-hash values with EXACT total weights. The third
    * maintainable non-invertible summary after min/max and HLL: the
    * sketch is a pure set function of the distinct values (bottom-k by
    * a global hash order) carrying group-additive weights, so a value
    * in the union's bottom-k is in every contributing batch's bottom-k
    * and its weights just add — maintained state is ENTRY-IDENTICAL to
    * a one-shot recompute under any batching (the q237 gate invariant).
    * Values are cast to long; quantiles read via
    * [[graft.functions.Sketches.sketchQuantile]]. */
  def quantileState(df: DataFrame, keyCol: String, valCol: String,
                    capacity: Int): DataFrame =
    df.select(col(keyCol), col(valCol).cast("long").as("_v"))
      .groupBy(col(keyCol))
      .agg(graft.functions.Sketches.quantileSketch(
        graft.functions.Sketches.hash60(col("_v").cast("string")),
        col("_v"), lit(1L), capacity).as("q_sketch"))

  /** Fold a delta sketch state into the stored base state: explode both
    * sides' entries, re-sum weights per (key, value), re-sketch — the
    * entry value's hash is recomputable from the value itself, so the
    * same spec-pinned aggregate rebuilds the bottom-capacity histogram
    * (no second trim implementation to keep entry-identical). State
    * rows shuffled are ≤ 2 · capacity per key — never the base data. */
  def quantileMerge(baseState: DataFrame, deltaState: DataFrame,
                    keyCol: String, capacity: Int): DataFrame =
    baseState.select(col(keyCol), col("q_sketch"))
      .unionByName(deltaState.select(col(keyCol), col("q_sketch")))
      .select(col(keyCol), explode(col("q_sketch")).as("_e"))
      .groupBy(col(keyCol), col("_e.value").as("_v"))
      .agg(sum(col("_e.count")).as("_w"))
      .groupBy(col(keyCol))
      .agg(graft.functions.Sketches.quantileSketch(
        graft.functions.Sketches.hash60(col("_v").cast("string")),
        col("_v"), col("_w"), capacity).as("q_sketch"))

  /** One-shot convenience: fold a raw delta batch into a stored
    * quantile-sketch state. `capacity` must match the state's. */
  def maintainQuantiles(baseState: DataFrame, delta: DataFrame,
                        keyCol: String, valCol: String,
                        capacity: Int): DataFrame =
    quantileMerge(baseState, quantileState(delta, keyCol, valCol, capacity),
      keyCol, capacity)
}
