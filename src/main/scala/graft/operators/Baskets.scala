package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence with EXACT lift — "which items appear
  * together more than independence predicts" over any (basket, item)
  * relation: event types per user-day, tags per document, services
  * per incident. Lift(a,b) = N·c_ab / (c_a·c_b) is the classic
  * association measure; here it stays an exact rational — `lift_ppm`
  * by truncating integer division, and the `assoc` verdict
  * `lift >= tNum/tDen` cross-multiplied in DECIMAL(38,0), so both
  * engines agree on every fence.
  *
  * Scale shape: baskets are deduped to distinct (basket, item) rows
  * once; the pair join is keyed on the BASKET id, so its cost is
  * Σ items-per-basket² (bounded by basket width — event-type-sized,
  * never corpus-sized), and everything after is item-pair-cardinality
  * aggregates. No windows, no driver data. */
object Baskets {

  /** `(item_a, item_b, c_ab, c_a, c_b, n_baskets, lift_ppm, assoc)`
    * for every co-occurring unordered pair (item_a < item_b). */
  def pairLift(df: DataFrame, basketCols: Seq[String], itemCol: String,
               tNum: Long, tDen: Long): DataFrame = {
    require(basketCols.nonEmpty, "pairLift: need basket key columns")
    require(tDen > 0 && tNum >= 0,
      s"pairLift: need tNum >= 0, tDen > 0, got $tNum/$tDen")
    val dec = "decimal(38,0)"
    val b = df.select(
        concat_ws(":", basketCols.map(c => col(c).cast("string")): _*)
          .as("_bk"),
        col(itemCol).as("_it"))
      .distinct()
    // 1-row broadcast, never a driver-side count action
    val n = b.agg(count_distinct(col("_bk")).as("_nb"))
    val c1 = b.groupBy(col("_it")).agg(count(lit(1)).as("c"))
    val pairs = b.as("x").join(b.as("y"),
        col("x._bk") === col("y._bk") && col("x._it") < col("y._it"))
      .groupBy(col("x._it").as("item_a"), col("y._it").as("item_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(c1.select(col("_it").as("item_a"), col("c").as("c_a")),
        Seq("item_a"))
      .join(c1.select(col("_it").as("item_b"), col("c").as("c_b")),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"),
        col("c_b"), col("_nb").as("n_baskets"),
        expr(s"CAST(c_ab AS $dec) * _nb * 1000000 div " +
          s"(CAST(c_a AS $dec) * c_b)").cast("long").as("lift_ppm"),
        (expr(s"CAST(c_ab AS $dec) * _nb * $tDen") >=
          expr(s"CAST(c_a AS $dec) * c_b * $tNum")).as("assoc"))
  }
}
