package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics — median / MAD (median absolute
  * deviation), the quality-filter backbone that mean/stddev can't
  * provide on heavy-tailed pipeline metrics (doc lengths, crawl scores,
  * spend values): one in a thousand 100× rows moves a z-score filter's
  * own yardstick, but not the median's.
  *
  * Everything is EXACT INTEGER arithmetic in doubled/quadrupled units,
  * so the report restates verbatim in an external engine with no
  * float-summation sensitivity: `med2 = x_lo + x_hi` (the two middle
  * order statistics — twice the median), `dev2 = |2x − med2|` (twice
  * each deviation), `mad4 = dev2_lo + dev2_hi` (four times the MAD),
  * and the flag `|x − med| > (kNum/kDen) · MAD` cross-multiplies to
  * `2 · dev2 · kDen > kNum · mad4`.
  *
  * Scale shape: two per-group sorts (the irreducible cost of EXACT
  * order statistics — the sketched path q110/q119 is the approximate
  * alternative), each a window `row_number` + one map-side-combinable
  * aggregate; the group-cardinality median/MAD frames broadcast back
  * onto the rows. Values ride as longs; callers pre-scale reals to
  * fixed point (cents, ×100) so both engines compare identical
  * integers. Caller keeps `2 · max(dev2) · kDen` within Long.
  */
object RobustStats {

  /** Twice-the-median per group of `in(g, xc)` via the two middle order
    * statistics: rank (n+1) div 2 and n div 2 + 1 (equal when n is
    * odd). Ties sort arbitrarily but the VALUES at fixed ranks are
    * order-deterministic. Returns `(g, _n, <out>)`. */
  private[graft] def med2Of(in: DataFrame, xc: String,
                            out: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col(xc))
    in.select(col("g"), col(xc),
        row_number().over(w).as("_rn"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("_n"))
      .groupBy(col("g"))
      .agg(max(col("_n")).as("_n"),
        (sum(when(col("_rn") === expr("(`_n` + 1) div 2"), col(xc))) +
          sum(when(col("_rn") === expr("`_n` div 2 + 1"), col(xc))))
          .as(out))
  }

  /** Per-group winsorized sum: values clamped to the exact
    * [p·lo, p·hi] order statistics before summing — the robust mean's
    * numerator (divide by n downstream), the standard tail-taming
    * transform for quality-score aggregation. Order statistics use
    * the [[graft.functions.Sketches.sketchQuantile]] rank convention
    * (smallest value whose 1-based rank reaches `max(1, ceil(q·n))`),
    * so the clamps restate as window ranks. Output `(groupCol, n, lo,
    * hi, sum_raw, sum_winsorized)` — all exact longs; ties keep
    * whole-value semantics (clamping never manufactures values).
    * Same scale shape as [[madOutlierReport]]: one per-group rank
    * sort, group-cardinality clamp frame broadcast back. */
  def winsorizedSum(df: DataFrame, groupCol: String, valueCol: String,
                    loQNum: Long, hiQNum: Long, qDen: Long): DataFrame = {
    require(qDen > 0 && loQNum >= 0 && hiQNum <= qDen && loQNum <= hiQNum,
      s"quantiles $loQNum/$qDen..$hiQNum/$qDen must be ordered in [0,1]")
    val v = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("x"))
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
    val ranked = v.select(col("g"), col("x"),
      row_number().over(w).as("_rn"),
      count(lit(1)).over(Window.partitionBy(col("g"))).as("_n"))
    // target rank max(1, ceil(q·n)) = max(1, (q_num·n + q_den − 1) div q_den)
    def rankFor(qNum: Long) =
      greatest(lit(1L),
        expr(s"(${qNum}L * `_n` + ${qDen}L - 1) div ${qDen}L"))
    val cuts = ranked.groupBy(col("g"))
      .agg(max(when(col("_rn") === rankFor(loQNum), col("x"))).as("lo"),
        max(when(col("_rn") === rankFor(hiQNum), col("x"))).as("hi"))
      .select(col("g").as("_cg"), col("lo"), col("hi"))
    v.join(broadcast(cuts), col("g") <=> col("_cg"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"), sum(col("x")).as("sum_raw"),
        sum(greatest(col("lo"), least(col("hi"), col("x"))))
          .as("sum_winsorized"))
      .select(col("g").as(groupCol), col("n"), col("lo"), col("hi"),
        col("sum_raw"), col("sum_winsorized"))
  }

  /** Per-group robust report: `(groupCol, n, med2, mad4, n_outliers)`
    * where a row is an outlier when `|x − median| > (kNum/kDen) · MAD`
    * (strict, cross-multiplied — a MAD of 0 flags every row off the
    * median, the degenerate-constant-group convention). `valueCol` is
    * cast to long. Null groups report like any other group. */
  def madOutlierReport(df: DataFrame, groupCol: String, valueCol: String,
                       kNum: Long, kDen: Long): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"threshold $kNum/$kDen must be >= 0")
    val v = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("x"))
    // all group-frame joins are NULL-SAFE (<=>): a null group is a
    // group like any other, and an equi-join would silently drop it
    val m = med2Of(v, "x", "med2")
    val d = v.as("v")
      .join(broadcast(m.select(col("g").as("_mg"), col("med2"))),
        col("v.g") <=> col("_mg"))
      .select(col("v.g").as("g"),
        abs(lit(2L) * col("x") - col("med2")).as("dev2"))
    val mm = med2Of(d, "dev2", "mad4")
      .select(col("g").as("_ag"), col("mad4"))
    val flagged: Column =
      lit(2L) * col("dev2") * lit(kDen) > lit(kNum) * col("mad4")
    val o = d.join(broadcast(mm), col("g") <=> col("_ag"))
      .groupBy(col("g"))
      .agg(sum(when(flagged, 1L).otherwise(0L)).as("n_outliers"))
      .select(col("g").as("_og"), col("n_outliers"))
    m.select(col("g"), col("_n").as("n"), col("med2"))
      .join(broadcast(mm), col("g") <=> col("_ag"))
      .join(broadcast(o), col("g") <=> col("_og"))
      .select(col("g").as(groupCol), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
  }
  /** Per-group EXACT nearest-rank quantiles — the SLA report (p50 /
    * p90 / p99 latency per service) with no sketch error and no
    * interpolation: for each requested `p = num/den`, the value at
    * 1-based rank `max(1, ceil(p·n))` (the [[winsorizedSum]] / q110
    * rank convention, computed as exact integer arithmetic). Output is
    * LONG format — one row per (group, quantile): `(groupCol, n,
    * p_num, p_den, q_value)` — so callers join or pivot as they like.
    *
    * Scale shape: ONE per-key rank sort serves every requested
    * quantile (the when-guards all read the same ranked pass), then a
    * group-cardinality explode. Exact quantiles need the full order
    * statistic — per-key sorted frames, the [[SortedFold]] cost class;
    * for corpus-wide percentiles at unbounded key cardinality use the
    * q110 sketch instead. */
  def nearestRankQuantiles(df: DataFrame, groupCol: String,
                           valueCol: String,
                           ps: Seq[(Long, Long)]): DataFrame = {
    require(ps.nonEmpty, "nearestRankQuantiles: need at least one quantile")
    ps.foreach { case (n, d) =>
      require(d > 0 && n >= 0 && n <= d,
        s"nearestRankQuantiles: quantile $n/$d outside [0, 1]")
    }
    val v = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("x"))
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
    val ranked = v.select(col("g"), col("x"),
      row_number().over(w).as("_rn"),
      count(lit(1)).over(Window.partitionBy(col("g"))).as("_n"))
    def rankFor(num: Long, den: Long) =
      greatest(lit(1L),
        expr(s"(${num}L * `_n` + ${den}L - 1) div ${den}L"))
    val aggs = ps.zipWithIndex.map { case ((num, den), i) =>
      max(when(col("_rn") === rankFor(num, den), col("x"))).as(s"_q$i")
    }
    val packed = ranked.groupBy(col("g"))
      .agg(max(col("_n")).as("n"), aggs: _*)
    val entries = array(ps.zipWithIndex.map { case ((num, den), i) =>
      struct(lit(num).as("p_num"), lit(den).as("p_den"),
        col(s"_q$i").as("q_value"))
    }: _*)
    packed.select(col("g").as(groupCol), col("n"),
        explode(entries).as("_e"))
      .select(col(groupCol), col("n"), col("_e.p_num"), col("_e.p_den"),
        col("_e.q_value"))
  }
}
