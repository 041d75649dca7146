package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source score calibration by quantile mapping — replace each
  * source's score with the REFERENCE source's value at the same
  * quantile (CDF matching). The curation problem it solves: quality
  * scores from different domains/scorers aren't comparable (one crawl's
  * 0.8 is another's 0.5), so a single global threshold over- or
  * under-selects per source; after mapping every source onto the
  * reference distribution, one threshold means the same thing
  * everywhere. Rank-based and integer-exact — no interpolation, no
  * floats — so the whole projection restates in SQL verbatim.
  *
  * Mapping: within its source, a row at rank r of n_g maps to the
  * reference order statistic at position `ceil(r · n_ref / n_g)` (ties
  * broken by id, so equal scores calibrate deterministically).
  * Reference rows map to themselves by construction.
  *
  * Scale shape: one rank window per source (group-partitioned sort —
  * the exact-order-statistic cost, as in [[RobustStats]]), a 1-row
  * n_ref broadcast, then ONE shuffle join on the computed reference
  * position. No global sort and no single-partition window anywhere.
  * Caller bound: `r · n_ref` rides a Long — exact up to ~3·10⁹-row
  * groups against a ~3·10⁹-row reference; past that, pre-bucket or
  * sample the reference (the mapping only reads its order statistics).
  */
object Calibration {

  /** `(idCol, groupCol, valueCol, x_norm)` — every row's value replaced
    * by the reference group's same-quantile order statistic. `idCol`
    * must be unique (it breaks rank ties); `valueCol` is cast to long.
    * Throws if `refGroup` is empty/absent. */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
                        valueCol: String, refGroup: String): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      col(valueCol).cast("long").as("x"))
    val wg = Window.partitionBy(col("g")).orderBy(col("x"), col("id"))
    val ranked = v
      .withColumn("r", row_number().over(wg))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("g"))))
    val ref = ranked.filter(col("g") <=> lit(refGroup))
      .select(col("r").as("p"), col("x").as("x_norm"))
      .localCheckpoint() // cut the double window lineage; also sizes nRef
    val nRef = ref.count()
    require(nRef > 0, s"quantileNormalize: reference group '$refGroup' " +
      "is empty or absent")
    ranked
      .withColumn("p", expr(s"(r * ${nRef}L + ng - 1) div ng"))
      .join(ref, Seq("p"))
      .select(col("id").as(idCol), col("g").as(groupCol),
        col("x").as(valueCol), col("x_norm"))
  }
}
