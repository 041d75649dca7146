package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history — the warehouse-side shape the
  * reference's staging→warehouse upsert (J1, reference `merge_proc.sql`
  * pattern) loses: an upsert overwrites, SCD2 keeps every version with its
  * validity interval. Two entry points:
  *
  *  - [[fromChangeLog]]: compact a change stream (key, ts, attrs) into
  *    per-key version intervals — consecutive rows with identical tracked
  *    attributes collapse into one interval.
  *  - [[merge]]: apply a NEW batch of changes to an existing SCD2 frame
  *    without rewriting closed history — closed versions pass through
  *    untouched; only each affected key's current row and its new changes
  *    are re-compacted, so the incremental cost is proportional to the
  *    batch, not the dimension history.
  *
  * Scale shape: windows partition by the DIMENSION KEY — high cardinality
  * (good parallelism) with per-key change history as the partition size,
  * which is bounded by update frequency, not table size. No driver data,
  * no cross-key state. `merge` joins on the same key the windows partition
  * by, so AQE plans one co-partitioned exchange chain.
  */
object Scd2 {

  /** History columns appended to (keys ++ attrs). */
  val metaCols: Seq[String] = Seq("valid_from", "valid_to", "version", "is_current")

  /** Compact a change log into SCD2 intervals.
    *
    * @param log      change events: one row per observation of the entity
    * @param keyCols  dimension key
    * @param tsCol    event-time column (interval boundaries)
    * @param attrCols tracked attributes: a new version starts when any differs
    *                 (null-safe compare) from the previous observation
    * @param tieCols  deterministic order within equal timestamps
    * @param firstVersion version number of each key's first emitted run
    * @return (keys ++ attrs ++ valid_from, valid_to, version, is_current),
    *         `valid_to` null on the open (current) interval
    */
  def fromChangeLog(log: DataFrame, keyCols: Seq[String], tsCol: String,
                    attrCols: Seq[String], tieCols: Seq[String] = Nil,
                    firstVersion: Int = 1): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "fromChangeLog: need key and attribute columns")
    val ord = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    // a run starts where any tracked attribute null-safely differs from the
    // previous observation (lag is null on the first row -> <=> is false
    // unless the attr is also null; the row_number()=1 guard keeps it)
    val isStart = attrCols.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val starts = log
      .select((keyCols ++ attrCols :+ tsCol).map(col) ++ tieCols.map(col): _*)
      .withColumn("_start", isStart)
      .filter(col("_start"))
    // runs are strictly ordered by (ts, ties) within a key; versions and
    // valid_to come from one more pass over the (much smaller) run frame
    val wRuns = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    starts
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wRuns))
      .withColumn("version",
        (row_number().over(wRuns) + lit(firstVersion - 1)).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols ++ metaCols).map(col): _*)
  }

  /** Apply a batch of new changes to an existing SCD2 frame.
    *
    * Closed versions (`is_current = false`) pass through untouched. Each
    * affected key's CURRENT row is restated as a change at its own
    * `valid_from` and re-compacted together with the key's new updates, so
    * an update batch whose attributes equal the current row produces no new
    * version (the run collapses), and version numbers continue from the
    * current row's. Keys new to the dimension start at version 1.
    *
    * Contract: every update timestamp must be >= the affected key's current
    * `valid_from` (late updates would need closed-history rewrite — use
    * [[fromChangeLog]] over the full log for that).
    */
  def merge(dim: DataFrame, updates: DataFrame, keyCols: Seq[String],
            tsCol: String, attrCols: Seq[String],
            tieCols: Seq[String] = Nil): DataFrame = {
    val outCols = (keyCols ++ attrCols ++ metaCols).map(col)
    val closed = dim.filter(!col("is_current")).select(outCols: _*)
    val current = dim.filter(col("is_current"))
    // the current row joins the mini-changelog as its oldest entry; ties
    // sort it first (null tie columns -> nulls first under asc), so an
    // update at the exact same ts starts a new run after it
    val tieNulls =
      tieCols.map(c => lit(null).cast(updates.schema(c).dataType).as(c))
    val curAsLog = current.select(
      (keyCols ++ attrCols).map(col) ++
        (col("valid_from").as(tsCol) +: tieNulls) :+
        col("version").as("_base_version"): _*)
    val updAsLog = updates.select(
      (keyCols ++ attrCols :+ tsCol).map(col) ++ tieCols.map(col) :+
        lit(null).cast("long").as("_base_version"): _*)
    val mini = curAsLog.unionByName(updAsLog)
    // per-key version offset = the current row's version (new keys -> 1),
    // carried as an extra KEY column: constant within a key, so it cannot
    // split runs, and it rides the same exchange the compaction needs
    val baseW = Window.partitionBy(keyCols.map(col): _*)
    val rebuilt = fromChangeLog(
      mini.withColumn("_base",
        coalesce(max(col("_base_version")).over(baseW), lit(1L))),
      keyCols :+ "_base", tsCol, attrCols, tieCols)
    val shifted = rebuilt
      .withColumn("version", col("version") + col("_base") - 1)
      .select(outCols: _*)
    closed.unionByName(shifted)
  }
}
