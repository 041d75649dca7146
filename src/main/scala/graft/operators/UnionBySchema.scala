package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema-version reconciliation — THE central merge op of the reference
  * (`utilities/utilities.py:394-424` `bc_merged_csv`): concatenate all
  * per-version frames, project to the resolved column list, and sort columns
  * alphabetically for deterministic output
  * (`utilities/utilities.py:419` — column order defines output hashing).
  *
  * Spark restatement: `unionByName(allowMissingColumns = true)` supplies the
  * missing-column null padding the reference gets from pandas concat. This is
  * a zero-shuffle operator — unions are plan-level concatenation, so at
  * 100 TB it costs nothing beyond the scans themselves.
  */
object UnionBySchema {

  /** Union all version frames by column name, padding missing columns with
    * nulls, optionally projecting to a resolved column list, and emitting
    * columns in sorted order. */
  def apply(versions: Seq[DataFrame],
            projectTo: Option[Seq[String]] = None): DataFrame = {
    require(versions.nonEmpty, "unionBySchema of zero frames")
    val unioned = versions.reduce(_.unionByName(_, allowMissingColumns = true))
    val resolved = projectTo.filter(_.nonEmpty)
      .map(cols => unioned.select(cols.map(col): _*))
      .getOrElse(unioned)
    sortColumns(resolved)
  }

  /** Alphabetical column ordering (reference `utilities/utilities.py:419`). */
  def sortColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
}
