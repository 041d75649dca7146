package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k RANK-SHIFT report between two scored snapshots — the
  * leaderboard diff behind "what changed in the corpus this week":
  * vocabulary drift between crawls, hot-key migration between days,
  * top-source churn between snapshots. Each side ranks by
  * (score DESC, item), keeps its top-k, and the full outer join
  * classifies every item that appears in either list: `entered` /
  * `exited` / `up` / `down` / `stable`, with the signed rank delta
  * (positive = climbed). Missing ranks surface as −1, never null.
  *
  * This is the human-readable layer over the drift monitors (q210's
  * chi², q229's churn): those alarm THAT the distribution moved; this
  * names WHICH items moved where — the report a pipeline owner reads.
  *
  * Scale shape: each side is one aggregate-sized orderBy().limit(k)
  * (TakeOrdered — partial top-k per partition, k rows to the driver
  * heap); the row_number windows rank the ≤ k post-limit rows (the
  * q57/q85 precedent), and the join is k×k at most. */
object RankShift {

  /** `(item, old_rank, new_rank, status, delta)` ordered by item. */
  def rankShift(oldDf: DataFrame, newDf: DataFrame, itemCol: String,
                scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, "rankShift: k must be positive")
    def top(df: DataFrame, rank: String) = df
      .select(col(itemCol).as("item"), col(scoreCol).as("_s"))
      .orderBy(col("_s").desc, col("item")).limit(k)
      .withColumn(rank, row_number()
        .over(Window.orderBy(col("_s").desc, col("item"))).cast("long"))
      .select(col("item"), col(rank))
    top(oldDf, "_or").join(top(newDf, "_nr"), Seq("item"), "full_outer")
      .select(col("item").as(itemCol),
        coalesce(col("_or"), lit(-1L)).as("old_rank"),
        coalesce(col("_nr"), lit(-1L)).as("new_rank"),
        when(col("_or").isNull, lit("entered"))
          .when(col("_nr").isNull, lit("exited"))
          .when(col("_or") === col("_nr"), lit("stable"))
          .when(col("_nr") < col("_or"), lit("up"))
          .otherwise(lit("down")).as("status"),
        when(col("_or").isNotNull && col("_nr").isNotNull,
          col("_or") - col("_nr")).otherwise(lit(0L)).as("delta"))
      .orderBy(col(itemCol))
  }
}
