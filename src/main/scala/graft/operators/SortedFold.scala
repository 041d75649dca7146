package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Per-key ORDERED folds — the secondary-sort scan pattern for the
  * operators that are inherently sequential per entity: session
  * assignment, exponential smoothing, running state machines. These
  * cannot be expressed as commutative aggregations (each step reads the
  * previous step's state in event order), so this is the documented
  * `mapPartitions` last resort — used exactly where Spark's declarative
  * surface genuinely cannot go.
  *
  * Scale shape: `repartition(key)` + `sortWithinPartitions(key, order)`
  * co-locates and orders each key's rows (Spark's external sort spills —
  * nothing is materialized per key), then ONE streaming pass holds O(1)
  * state per key and emits row-by-row. Contrast a `PARTITION BY key`
  * running window: same shuffle, but WindowExec buffers frames while
  * this scan keeps only the fold state — a bot entity with 10⁸ events
  * costs memory O(1), not O(events). The per-key sequential residency is
  * inherent to the recurrence, not to the implementation.
  */
object SortedFold {

  /** The secondary-sort layout every per-key sequential scan runs over. */
  private def sortedByKey(df: DataFrame, keyCols: Seq[String],
                          orderCols: Seq[String]): DataFrame =
    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

  /** Append one fold-derived column: `first` opens a key's state from its
    * first row, `step` advances it; both return (state, emitted value).
    * Rows arrive in (key, order) order; null keys group together. */
  def appendScan[S](df: DataFrame, keyCols: Seq[String],
                    orderCols: Seq[String], field: StructField)
                   (first: Row => (S, Any), step: (S, Row) => (S, Any))
                   : DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "appendScan: need key and order columns")
    val sorted = sortedByKey(df, keyCols, orderCols)
    val schema = StructType(sorted.schema.fields :+ field)
    val kis = keyCols.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { it =>
      var cur: Seq[Any] = null
      var started = false
      var st: Option[S] = None
      // binary keys compare by reference under Seq equality — normalize
      // to a value-comparable form so a digest-keyed frame still groups
      def keyOf(r: Row): Seq[Any] = kis.map(r.get).map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }
      it.map { r =>
        val k = keyOf(r)
        val (s2, out) =
          if (!started || k != cur) first(r) else step(st.get, r)
        cur = k; started = true; st = Some(s2)
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }

  /** Gap-based sessionization: appends `session_id` (1-based per key) —
    * a new session opens when the event-time gap to the previous event
    * of the SAME key strictly exceeds `gapSec`. Order ties break on
    * `idCol` so the scan is deterministic. `tsCol` must be a timestamp;
    * comparison runs at microsecond precision (Spark's timestamp
    * resolution). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, gapSec: Long): DataFrame = {
    require(gapSec >= 0, "sessionize: gapSec must be non-negative")
    val ti = df.schema.fieldIndex(tsCol)
    val gapMicros = Math.multiplyExact(gapSec, 1000000L)
    def micros(r: Row): Long = {
      val ts = r.getTimestamp(ti)
      Math.addExact(Math.multiplyExact(ts.getTime, 1000L),
        (ts.getNanos / 1000L) % 1000L)
    }
    appendScan[(Long, Long)](df, Seq(keyCol), Seq(tsCol, idCol),
      StructField("session_id", LongType, nullable = false))(
      first = r => ((micros(r), 1L), 1L),
      step = { case ((prev, sid), r) =>
        val t = micros(r)
        val s2 = if (t - prev > gapMicros) sid + 1 else sid
        ((t, s2), s2)
      })
  }

  /** Event-order lag per key: appends the PREVIOUS row's `valueCol`
    * (null on each key's first row) — the building block for Markov
    * transition counting and consecutive-delta features, with the same
    * O(1)-state scan instead of a buffering `lag` window. */
  def lagged(df: DataFrame, keyCol: String, orderCols: Seq[String],
             valueCol: String, as: String = "prev"): DataFrame = {
    val vi = df.schema.fieldIndex(valueCol)
    val field = df.schema(valueCol).copy(name = as, nullable = true)
    appendScan[Any](df, Seq(keyCol), orderCols, field)(
      first = r => (r.get(vi), null),
      step = { (prev, r) => (r.get(vi), prev) })
  }

  /** One-sided CUSUM change-point statistic per key: appends `cusum`
    * where `S₀ = 0` and `Sₜ = max(0, Sₜ₋₁ + xₜ − drift)` (Page 1954) —
    * the sequential alarm that catches a sustained rate shift a
    * threshold-per-point test misses. Pure integer arithmetic over
    * pre-scaled longs; pair with [[GapFill.densify]] so silent periods
    * (x = 0) decay the statistic instead of vanishing from it. Alarm
    * when `cusum` exceeds the caller's h. */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[String],
            valueCol: String, drift: Long): DataFrame = {
    val vi = df.schema.fieldIndex(valueCol)
    def next(s: Long, r: Row): Long =
      Math.max(0L, Math.addExact(s, r.getLong(vi) - drift))
    appendScan[Long](df, Seq(keyCol), orderCols,
      StructField("cusum", LongType, nullable = false))(
      first = r => { val s = next(0L, r); (s, s) },
      step = { (s, r) => val s2 = next(s, r); (s2, s2) })
  }

  /** Cooldown filter per key: appends boolean `emitted` — a row emits
    * when at least `cooldownSec` has passed since the key's LAST
    * EMITTED row (the key's first row always emits). The rate-limit /
    * notification-dedup primitive: unlike a fixed-window dedup, the
    * reference point is the previous EMISSION, so a burst arriving
    * just under the cooldown keeps sliding the non-emitting window —
    * a recursive dependence only an ordered fold (or a list_reduce
    * replay, which is how the oracle restates it) expresses; no
    * window-function formulation exists. O(1) state: the last emitted
    * timestamp, microsecond precision, ≥ comparison (a gap of exactly
    * the cooldown emits). Ties on `tsCol` break by `idCol`. */
  def cooldownFilter(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, cooldownSec: Long): DataFrame = {
    require(cooldownSec >= 0, "cooldownFilter: cooldown must be >= 0")
    val ti = df.schema.fieldIndex(tsCol)
    val cdMicros = Math.multiplyExact(cooldownSec, 1000000L)
    def micros(r: Row): Long = {
      val ts = r.getTimestamp(ti)
      Math.addExact(Math.multiplyExact(ts.getTime, 1000L),
        (ts.getNanos / 1000L) % 1000L)
    }
    appendScan[Long](df, Seq(keyCol), Seq(tsCol, idCol),
      StructField("emitted", BooleanType, nullable = false))(
      first = r => (micros(r), true),
      step = { (lastEmitted, r) =>
        val t = micros(r)
        if (t - lastEmitted >= cdMicros) (t, true)
        else (lastEmitted, false)
      })
  }

  /** Fixed-point integer EWMA per key: appends `ewma` where
    * `e₁ = x₁` and `eₜ = (αNum·xₜ + (αDen−αNum)·eₜ₋₁) quot αDen`
    * (TRUNCATING division — Java `/`, same semantics as Spark's `div`
    * and DuckDB's `//`, which both round toward zero). The recurrence is
    * pure integer arithmetic, so the whole trajectory restates exactly
    * in an external engine (float EWMA, an order-sensitive product of
    * doubles, cannot). Callers pre-scale real-valued inputs to
    * fixed-point longs. */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum <= alphaDen,
      s"ewma: alpha $alphaNum/$alphaDen must be a fraction in [0, 1]")
    val vi = df.schema.fieldIndex(valueCol)
    appendScan[Long](df, Seq(keyCol), orderCols,
      StructField("ewma", LongType, nullable = false))(
      first = r => { val x = r.getLong(vi); (x, x) },
      step = { (e, r) =>
        val x = r.getLong(vi)
        val e2 = Math.addExact(Math.multiplyExact(alphaNum, x),
          Math.multiplyExact(alphaDen - alphaNum, e)) / alphaDen
        (e2, e2)
      })
  }
}
