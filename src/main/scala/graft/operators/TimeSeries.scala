package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer time-series aggregates over event streams — the
  * utilization/engagement metrics an event warehouse reports daily:
  * time-weighted value sums (billing: "value held × seconds held"),
  * merged interval coverage (SLA: "seconds with ≥ 1 active session"),
  * and consecutive-day streaks (engagement). All arithmetic rides
  * exact microsecond/day longs (`unix_micros`, day numbers), so every
  * report restates verbatim in SQL — no float durations anywhere.
  *
  * Scale shape: each metric is one key-partitioned window pass (the
  * per-key ORDER the semantics demand) plus map-side-combinable
  * aggregates; nothing global, nothing row-scale on the driver. Ties
  * in the order column are broken by the caller-supplied id column so
  * the gap attribution is deterministic in any engine.
  */
object TimeSeries {

  /** Per-key time-weighted value sum: `Σ value_i · (t_{i+1} − t_i)` in
    * value·microseconds, each gap attributed to the EARLIER row (the
    * step-function/TWAP convention; the key's last row holds no gap).
    * Output `(keyCol, n, span_us, twsum)`. */
  def timeWeightedSum(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("id"))
    df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("t"),
        col(idCol).as("id"), col(valueCol).cast("long").as("v"))
      .withColumn("nt", lead(col("t"), 1).over(w))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), (max(col("t")) - min(col("t"))).as("span_us"),
        coalesce(sum(col("v") * (col("nt") - col("t"))), lit(0L))
          .as("twsum"))
      .select(col("k").as(keyCol), col("n"), col("span_us"), col("twsum"))
  }

  /** Per-key union length of (possibly overlapping) intervals
    * `[startCol, endCol)` in microseconds: merged islands via the
    * running-max-of-ends sweep. Output `(keyCol, n_islands,
    * covered_us)`. Adjacent intervals (start == running max) merge —
    * half-open semantics. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String, idCol: String): DataFrame = {
    val order = Seq(col("s"), col("e"), col("id"))
    val wPrev = Window.partitionBy(col("k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"), col(idCol).as("id"))
      .withColumn("rm", max(col("e")).over(wPrev))
      .withColumn("brk",
        when(col("rm").isNull || col("s") > col("rm"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("k"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("cov"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"), sum(col("cov")).as("covered_us"))
      .select(col("k").as(keyCol), col("n_islands"), col("covered_us"))
  }

  /** Per-key INTERSECTION coverage of two interval sets — "microseconds
    * where BOTH were active" (co-presence, ad viewability × player
    * visibility, session × incident overlap): every same-key A×B
    * overlap pair is clipped to `[max(start), min(end))` via the
    * bucketed [[RangeJoin.intervalOverlap]] (never a per-key quadratic
    * join), and the clips — which may themselves overlap — collapse
    * through the [[intervalCoverage]] island sweep. Half-open
    * semantics: pairs that merely TOUCH (a.end == b.start) contribute
    * nothing. Output `(keyCol, n_islands, covered_us)` over keys with
    * at least one non-empty clip. Inputs carry `(keyCol, idCol, sCol,
    * eCol)` with long microsecond bounds (`bucketUs` is the overlap
    * join's bucket width in the SAME units); ids make the sweep's tie
    * order deterministic. */
  def intervalIntersection(a: DataFrame, b: DataFrame, keyCol: String,
                           idCol: String, sCol: String, eCol: String,
                           bucketUs: Long): DataFrame = {
    def narrow(df: DataFrame, side: String) =
      df.select(col(keyCol).as("k"), col(idCol).cast("string").as(s"_i$side"),
        col(sCol).cast("long").as(s"_s$side"),
        col(eCol).cast("long").as(s"_e$side"))
    val pairs = RangeJoin.intervalOverlap(narrow(a, "a"), narrow(b, "b"),
      Seq("k"), "_sa", "_ea", "_sb", "_eb", bucketUs)
    val clips = pairs.select(col("k"),
        concat_ws(":", col("_ia"), col("_ib")).as("id"),
        greatest(col("_sa"), col("_sb")).as("s"),
        least(col("_ea"), col("_eb")).as("e"))
      .filter(col("e") > col("s"))
    intervalCoverage(clips, "k", "s", "e", "id")
      .withColumnRenamed("k", keyCol)
  }

  /** Per-key event-time lateness audit — how out-of-order is the
    * stream: in ARRIVAL order (`arrivalCol`), an event is late when
    * its event time (`tsMicrosCol`, long micros) sits below the key's
    * running high-water mark, and its lateness is the distance below.
    * THE watermark-tuning input: `withWatermark` bounds state by
    * declaring "nothing later than X", and this report says what X
    * the data actually needs (pair with the q110 quantile sketch for
    * p99 lateness at scale). Output `(keyCol, n, n_late,
    * max_late_us)` — exact integers. */
  def latenessAudit(df: DataFrame, keyCol: String, arrivalCol: String,
                    tsMicrosCol: String, idCol: String): DataFrame = {
    // idCol breaks arrival-order ties so the high-water window is a
    // total order — duplicate arrival values would otherwise make
    // n_late/max_late_us partition-order-dependent
    val w = Window.partitionBy(col("k")).orderBy(col("a"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("k"), col(arrivalCol).as("a"),
        col(tsMicrosCol).cast("long").as("t"), col(idCol).as("id"))
      .withColumn("hw", max(col("t")).over(w))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("hw").isNotNull && col("t") < col("hw"), 1L)
          .otherwise(0L)).as("n_late"),
        coalesce(max(when(col("hw").isNotNull && col("t") < col("hw"),
          col("hw") - col("t"))), lit(0L)).as("max_late_us"))
      .select(col("k").as(keyCol), col("n"), col("n_late"),
        col("max_late_us"))
  }

  /** Per-group exact OLS trend: slope of `yCol` against `xCol` as the
    * integer rational `slope_num/slope_den = (nΣxy − ΣxΣy) /
    * (nΣxx − (Σx)²)`, with `rising = slope_num > 0` (NULL when
    * `slope_den = 0` — all-x-equal groups have no slope) — segment-level
    * trend detection ("is this source's quality score drifting down")
    * with no floats anywhere: the sufficient statistics are exact long
    * sums (one map-side-combinable aggregate), and only the final
    * products run in DECIMAL(38,0) before casting back (gate-stable
    * BIGINT outputs; callers at the 10¹²-rows-per-group regime read
    * the sums and keep the products decimal). `xCol` is re-based per
    * group (x − min x) to keep the products small — slope-invariant. */
  def groupTrend(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val wMin = Window.partitionBy(col("g"))
    val dec = "decimal(38,0)"
    val b = df.select(col(groupCol).as("g"), col(xCol).cast("long").as("x0"),
        col(yCol).cast("long").as("y"))
      .withColumn("x", col("x0") - min(col("x0")).over(wMin))
    b.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("g").as(groupCol), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"),
        (col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy"))
          .cast("long").as("slope_num"),
        (col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx"))
          .cast("long").as("slope_den"),
        // a degenerate group (all x equal → slope_den = 0) has no
        // defined slope: rising is NULL, not a sign comparison. The
        // long casts above null silently past ±9.2e18 (non-ANSI) —
        // callers at that regime read the sums and recompute in
        // decimal; rising itself is decided in decimal either way.
        when(col("n").cast(dec) * col("sxx") ===
            col("sx").cast(dec) * col("sx"), lit(null).cast("boolean"))
          .otherwise(col("n").cast(dec) * col("sxy") >
            col("sx").cast(dec) * col("sy")).as("rising"))
  }

  /** Trailing-window distinct count as HLL registers: for each
    * OBSERVED day, the register file over the values active in
    * `[day − windowDays + 1, day]` — the "7-day active users" report,
    * which is exactly the aggregate a sliding window makes expensive
    * (distinct does not subtract, so exact needs the window's full
    * value set per day) and registers make linear: build ONE register
    * file per day, replicate each day's m-int array to the ≤
    * `windowDays` target days it feeds, and element-max-merge per
    * target — the register monoid ([[graft.functions.Sketches
    * .hllMerge]]) absorbs the overlap. Output `(dayCol, bucket,
    * register)`, register-exact and SQL-restatable (estimates derive
    * via [[graft.functions.Sketches.hllEstimate]]).
    *
    * Scale shape: the only row-scale pass is the daily register build
    * (map-side combinable); everything after is days × m rows. */
  def slidingDistinctRegisters(df: DataFrame, dayCol: String,
                               valueCol: String, windowDays: Int,
                               p: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    import graft.functions.Sketches
    val daily = df.select(col(dayCol).cast("long").as("day"),
        Sketches.hash60(col(valueCol).cast("string")).as("_h"))
      .groupBy(col("day"))
      .agg(Sketches.hllSketch(col("_h"), p).as("regs"))
      .localCheckpoint() // reused: expansion source and observed-day set
    val observed = daily.select(col("day").as("target"))
    val merged = daily
      .select(col("day"), col("regs"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .withColumn("target", col("day") + col("off"))
      .join(observed, Seq("target"), "left_semi")
      .groupBy(col("target"))
      .agg(Sketches.hllMerge(col("regs"), p).as("regs"))
    merged
      .select(col("target").as(dayCol),
        posexplode(col("regs")).as(Seq("bucket", "register")))
      .select(col(dayCol), col("bucket").cast("long").as("bucket"),
        col("register").cast("long").as("register"))
  }

  /** EXACT trailing-window distinct count via bitmap buckets — the
    * DAU/WAU stickiness feed when the id domain is machine-bounded:
    * daily [[graft.functions.Bitmap]] words, replicated to their ≤
    * `windowDays` targets and OR-merged (idempotent — overlap between
    * days is free), popcounted per day. Output `(dayCol, dau, wau)`
    * with `wau` over `[day − windowDays + 1, day]` — both EXACT, which
    * is why the oracle is plain `count(DISTINCT …)`: the bitmap path
    * must reproduce the true numbers, not an estimate. The sketched
    * sibling [[slidingDistinctRegisters]] takes over when the domain
    * is unbounded. Day-bucket-cardinality shuffles only. */
  def slidingDistinctExact(df: DataFrame, dayCol: String,
                           valueCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    import graft.functions.Bitmap
    val daily = Bitmap.bitmaps(
        df.select(col(dayCol).cast("long").as("day"), col(valueCol)),
        "day", valueCol)
      .localCheckpoint()
    val dau = Bitmap.distinctCounts(daily, "day")
      .select(col("day"), col("n_distinct").as("dau"))
    val observed = daily.select(col("day").as("target")).distinct()
    val wau = daily
      .select(col("day"), col("bucket"), col("bits"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .withColumn("target", col("day") + col("off"))
      .join(observed, Seq("target"), "left_semi")
      .groupBy(col("target"), col("bucket"))
      .agg(bit_or(col("bits")).as("bits"))
      .groupBy(col("target"))
      .agg(sum(bit_count(col("bits")).cast("long")).as("wau"))
      .select(col("target").as("day"), col("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day").as(dayCol), col("dau"), col("wau"))
  }

  /** Per-key consecutive-day streaks over `(keyCol, dayCol)` activity
    * (duplicates collapse): `(keyCol, n_streaks, longest, n_days)` via
    * the day − row_number island trick. */
  def dayStreaks(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    df.select(col(keyCol).as("k"), col(dayCol).cast("long").as("day"))
      .distinct()
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("k"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
        sum(col("len")).as("n_days"))
      .select(col("k").as(keyCol), col("n_streaks"), col("longest"),
        col("n_days"))
  }
}
