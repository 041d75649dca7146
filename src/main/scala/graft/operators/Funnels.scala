package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a `(user, ts, type)` event stream: ordered
  * funnel conversion and cohort retention — the two queries every
  * product-events warehouse built on the reference's events table runs
  * (reference semantics: the events extract in `TESTDATA.md`; the reference
  * itself only lands the table — these are the canonical downstream reads).
  *
  * Scale shape (100 TB of events):
  *  - `funnel` runs k chained per-user MIN aggregations, one per step. Each
  *    pass filters to ONE event type before shuffling (map-side combine on
  *    user makes the shuffle user-cardinality-sized, not event-sized), and
  *    every pass after the first joins against the previous per-user frame —
  *    user-cardinality-sized on both sides, plain equi-join. No window over
  *    the raw events, no per-user event collection (a `collect_list` funnel
  *    dies on a bot user with 10^8 events; chained MINs cannot).
  *  - `cohortRetention` is two per-user aggregations and one
  *    user-cardinality join: first-seen per user (map-side combinable MIN),
  *    then distinct (user, week) activity — `groupBy(user, week)` first so
  *    the distinct is map-side combinable too — joined back on user and
  *    re-aggregated to the (cohort, offset) matrix, which is
  *    weeks²-bounded output.
  */
object Funnels {

  /** Earliest strictly-ordered completion time of each funnel step per user:
    * `(user, step_1_ts, ..., step_k_ts)` — step i's timestamp is the
    * earliest event of `steps(i)` AFTER the user's step i-1 timestamp
    * (strict `>`: simultaneous events do not complete two steps). Users who
    * never reach step 1 are absent; later columns are null once the chain
    * breaks.
    *
    * Optional conversion windows (the product-analytics standard):
    *  - `maxStepGapSec`: step i must land within N seconds of step i-1;
    *  - `maxTotalSec`: every step must land within N seconds of step 1.
    * Both bound the GREEDY chain anchored at the user's FIRST step-1 event
    * (first-touch attribution): each step still takes the earliest
    * qualifying event given the already-fixed previous steps. That is the
    * defined semantics, not a search — under a per-step gap, a user whose
    * first-touch greedy chain expires but who could convert from a LATER
    * re-entry counts as not converted (re-entry funnels are a different
    * report). For `maxTotalSec` alone the greedy chain is also the optimal
    * one from that anchor: taking an earlier qualifying event never shrinks
    * any later step's window (spec-pinned against an exhaustive chain
    * search); for `maxStepGapSec` the greedy chain IS the definition
    * (spec-pinned against the greedy reference). */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  maxStepGapSec: Option[Long] = None,
                  maxTotalSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxStepGapSec.forall(_ > 0) && maxTotalSec.forall(_ > 0),
      "conversion windows must be positive")
    val user = col(userCol)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(user).agg(min(col(tsCol)).as("step_1_ts"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = col(s"step_${i}_ts")
      val inWindow = Seq(
        maxStepGapSec.map(g =>
          col(tsCol) <= prev + expr(s"INTERVAL $g SECOND")),
        maxTotalSec.map(w =>
          col(tsCol) <= col("step_1_ts") + expr(s"INTERVAL $w SECOND")))
        .flatten.foldLeft(col(tsCol) > prev)(_ && _)
      // carry only what the window predicate reads (step_1_ts coincides
      // with prev at i=1 — dedup by name, a double selection is ambiguous)
      val carry = (if (maxTotalSec.isDefined) Seq("step_1_ts") else Nil)
        .++(Seq(s"step_${i}_ts")).distinct.map(col)
      val next = events.filter(col(typeCol) === step)
        .join(acc.select(user +: carry: _*), Seq(userCol))
        .filter(inWindow)
        .groupBy(user).agg(min(col(tsCol)).as(s"step_${i + 1}_ts"))
      acc.join(next, Seq(userCol), "left")
    }
  }

  /** Funnel conversion report: `(step_idx, step_name, users_reached)` for
    * each step, users_reached non-increasing by construction. All step
    * counts come from ONE aggregation over the per-user frame (the chained
    * funnel DAG executes once, not once per step), unpivoted to the
    * report shape. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxStepGapSec: Option[Long] = None,
             maxTotalSec: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol, steps,
      maxStepGapSec, maxTotalSec)
    val counts = steps.indices.map(i =>
      count(col(s"step_${i + 1}_ts")).as(s"_c${i + 1}"))
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step_name"),
        col(s"_c${i + 1}").as("users_reached"))
    }
    times.agg(counts.head, counts.tail: _*)
      .select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.step_idx"), col("_r.step_name"),
        col("_r.users_reached"))
  }

  /** Time-to-convert distribution per cohort: for users completing the
    * two-step funnel `fromStep → toStep` ([[funnelTimes]] semantics —
    * first fromStep, then the first strictly-later toStep), the
    * conversion latency `t₂ − t₁` in exact microseconds, reported as
    * `(cohort, n_converted, min_us, med2_us, max_us)` with the median
    * in doubled units (the [[graft.functions.RobustStats]] two-middle-
    * ranks convention — x_lo + x_hi, exact in SQL). The question
    * behind every funnel: not just HOW MANY convert, but how long the
    * window keeping them takes. `cohortCol` must be constant per user
    * (a user attribute or hash bucket). One rank sort over the
    * CONVERTED-user frame — funnel-output-sized, not event-sized. */
  def conversionLatency(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, fromStep: String, toStep: String,
                        cohortCol: String): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol,
        Seq(fromStep, toStep))
      .filter(col("step_2_ts").isNotNull)
      .select(col(userCol),
        (unix_micros(col("step_2_ts")) - unix_micros(col("step_1_ts")))
          .as("x"))
    val cohorts = events.select(col(userCol), col(cohortCol)).distinct()
    val d = times.join(cohorts, Seq(userCol))
      .select(col(cohortCol).as("g"), col("x"))
    val m = graft.functions.RobustStats.med2Of(d, "x", "med2_us")
    val ends = d.groupBy(col("g").as("_eg"))
      .agg(min(col("x")).as("min_us"), max(col("x")).as("max_us"))
    m.join(broadcast(ends), col("g") <=> col("_eg"))
      .select(col("g").as(cohortCol), col("_n").as("n_converted"),
        col("min_us"), col("med2_us"), col("max_us"))
  }

  /** Cohort retention matrix: `(cohort_week, week_offset, n_users)` — users
    * bucketed by the week of their FIRST event (integer weeks since
    * `epochDay`, so the boundary is engine-portable: no date_trunc locale /
    * week-start semantics), counted once per later week they were active.
    * `week_offset = 0` row is the cohort size. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      epochDay: String): DataFrame = {
    val user = col(userCol)
    // floor(days/7): `/` is double division in Spark SQL, exact here
    // (|days| << 2^50); callers pass an epochDay at/before the first event
    // so the quotient is non-negative and floor == truncation both engines
    val week = floor(datediff(to_date(col(tsCol)), to_date(lit(epochDay))) / 7)
      .cast("long")
    val firstWeek = events.groupBy(user)
      .agg(min(week).as("cohort_week"))
    val activeWeeks = events.groupBy(user, week.as("active_week")).agg(lit(1))
      .select(user, col("active_week"))
    activeWeeks.join(firstWeek, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("active_week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
