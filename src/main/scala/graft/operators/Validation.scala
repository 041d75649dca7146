package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime correctness invariants the reference uses instead of tests
  * (SURVEY.md §5): record-count reconciliation between what a source
  * declared and what was extracted (`utilities/utilities.py:69-82`,
  * surfaced by `datalakewrapper.py:197-210`), and column-drift detection
  * between data and metadata (`lambda_function.py:140-158`).
  */
object Validation {

  final case class CountCheck(expected: Long, actual: Long) {
    def matches: Boolean = expected == actual
  }

  /** Scalar reconciliation: declared instance-count sum vs actual rows. */
  def reconcile(actualRows: Long, declared: Long): CountCheck =
    CountCheck(declared, actualRows)

  /** Vectorized per-key reconciliation: join declared counts with actual
    * counts and flag mismatches. Both sides aggregate before the join, so
    * the join input is one row per key. */
  def reconcileCounts(actual: DataFrame, declared: DataFrame,
                      keyCol: String, actualCnt: String = "actual_count",
                      declaredCnt: String = "declared_count"): DataFrame =
    declared.join(actual, Seq(keyCol), "full_outer")
      .withColumn(actualCnt, coalesce(col(actualCnt), lit(0L)))
      .withColumn(declaredCnt, coalesce(col(declaredCnt), lit(0L)))
      .withColumn("count_match", col(actualCnt) === col(declaredCnt))

  /** Column drift between a frame and its metadata: (missing-from-data,
    * unknown-to-metadata). */
  def columnDrift(dataCols: Seq[String], metaCols: Set[String]): (Seq[String], Seq[String]) = {
    val dataSet = dataCols.map(_.toLowerCase).toSet
    val metaLower = metaCols.map(_.toLowerCase)
    (metaCols.toSeq.sorted.filterNot(c => dataSet.contains(c.toLowerCase)),
     dataCols.filterNot(c => metaLower.contains(c.toLowerCase)))
  }
}
