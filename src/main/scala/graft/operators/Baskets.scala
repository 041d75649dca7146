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
  * The basket key is a STRUCT of the basket columns, never a string
  * concat: separator characters inside a component would merge
  * distinct baskets (("a:b","c") vs ("a","b:c")), and concat_ws skips
  * NULL components so (null,"x") would collide with ("x",null) —
  * struct equality keeps every component positional and null-aware.
  *
  * Scale shape: baskets are deduped to distinct (basket, item) rows
  * once; the pair join is keyed on the BASKET id, so its cost is
  * Σ items-per-basket² (bounded by basket width — event-type-sized,
  * never corpus-sized), and everything after is item-pair-cardinality
  * aggregates. `maxBasket` caps the width² term (the LSH maxBucket
  * discipline): one degenerate basket touching 10⁵ distinct items
  * would emit 10¹⁰ pairs from a single key — baskets wider than the
  * cap are dropped ENTIRELY (marginals, n_baskets and pairs stay
  * mutually consistent over the retained baskets). The default keeps
  * the exact semantics. No windows, no driver data. */
object Baskets {

  /** `(item_a, item_b, c_ab, c_a, c_b, n_baskets, lift_ppm, assoc)`
    * for every co-occurring unordered pair (item_a < item_b). */
  def pairLift(df: DataFrame, basketCols: Seq[String], itemCol: String,
               tNum: Long, tDen: Long,
               maxBasket: Int = Int.MaxValue): DataFrame = {
    require(basketCols.nonEmpty, "pairLift: need basket key columns")
    require(tDen > 0 && tNum >= 0,
      s"pairLift: need tNum >= 0, tDen > 0, got $tNum/$tDen")
    require(maxBasket >= 2, s"pairLift: maxBasket must be >= 2, got $maxBasket")
    val dec = "decimal(38,0)"
    val all = df.select(
        struct(basketCols.map(col): _*).as("_bk"),
        col(itemCol).as("_it"))
      .distinct()
    // width cap: aggregation-based (one groupBy count + a semi-join),
    // never a window that funnels a hot basket to one task
    val b = if (maxBasket == Int.MaxValue) all else
      all.join(
        all.groupBy(col("_bk")).agg(count(lit(1)).as("_w"))
          .filter(col("_w") <= maxBasket).select(col("_bk")),
        Seq("_bk"), "left_semi")
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
