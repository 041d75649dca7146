package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-extraction logic (SURVEY.md §2.6).
  *
  * The reference tracks extracted data-object ids in an append-only history
  * and pulls `lake_ids − history` each run (`utilities/utilities.py:208-224`,
  * `datalakewrapper.py:180-195`). That set-difference is a left-anti join —
  * shuffle on the id only (no payload), broadcast when the history fits.
  */
object Incremental {

  /** Ids still to extract: `lakeIds − history` (reference
    * `not_extracted_ids`). */
  def notExtracted(lakeIds: DataFrame, history: DataFrame,
                   idCol: String): DataFrame =
    lakeIds.join(history.select(idCol), Seq(idCol), "left_anti")

  /** Daily watermark id (reference `utilities/utilities.py:792-808`):
    * the epoch second of 05:00 local time (fixed-offset UTC−6) of the
    * effective day — the previous day when local time is before the cutoff
    * hour. Reimplemented with explicit offsets (the reference hand-rolls a
    * fixed 21600 s subtraction) but yielding the same id values.
    *
    * @param ts timestamp column (UTC)
    * @param cutoffHour local hour before which the id still belongs to the
    *                   previous day (reference default 5)
    * @param utcOffsetHours fixed local-zone offset, e.g. -6
    */
  def incrementalId(ts: Column, cutoffHour: Int = 5,
                    utcOffsetHours: Int = -6): Column = {
    val local = ts + expr(s"INTERVAL $utcOffsetHours HOURS")
    val effectiveDay = when(hour(local) < cutoffHour,
      date_sub(to_date(local), 1)).otherwise(to_date(local))
    // local cutoffHour:00 on day D = epoch(D midnight UTC) + cutoff − offset
    (unix_timestamp(effectiveDay.cast("timestamp"))
      + lit((cutoffHour - utcOffsetHours) * 3600L))
  }

  /** Full-load reset semantics (reference `utilities/utilities.py:185-194`):
    * modelled as overwrite — provided for API completeness; with file sinks
    * this is simply `mode("overwrite")`. */
  def fullLoadPlan(incoming: DataFrame): DataFrame = incoming

  /** Precomputed daily schedule ids (reference
    * `utilities/utilities.py:706-709`): `start + 86400·i`. */
  def scheduleIds(startEpoch: Long, days: Int): Seq[Long] =
    (0 until days).map(i => startEpoch + 86400L * i)
}
