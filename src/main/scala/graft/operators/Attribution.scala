package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion ATTRIBUTION over an event stream — which touch gets
  * credit for a conversion, the question every growth/marketing
  * pipeline answers right after the funnel (q186 family) tells it THAT
  * users convert: segment each user's timeline at conversions (a
  * touch attributes to the NEXT conversion only — credit resets once a
  * purchase lands, the standard session-scoped convention), then credit
  * the segment's FIRST touch (demand creation) and LAST touch (demand
  * capture) with the conversion's value. Conversions with no preceding
  * touch in their segment are `direct`. Both models ride one pass so
  * their disagreement — the classic "display creates, search captures"
  * gap — is one report.
  *
  * Exact integers end to end: values in cents, counts and sums as
  * longs. Scale shape: one key-partitioned RUNNING window to segment
  * (streaming frame — O(1) state per row), then first/last touch per
  * (user, segment) as ONE map-side-combinable `min_by`/`max_by`
  * aggregate — never a full-frame buffering window (a no-conversion
  * bot user's whole segment would sit in one task's sort buffer, the
  * exact shape the Funnels/SortedFold discipline bans) — one
  * distinct-key join conversions⋈touches, two map-side-combinable
  * aggregates. No unbounded-following windows, no driver data. */
object Attribution {

  /** `(model, touch_type, n_conv, cents)` for `model ∈ {first_touch,
    * last_touch}`; `touchTypes` are the creditable event types,
    * `convType` the conversion. Ties in `tsCol` break by `idCol`. */
  def firstLastTouch(df: DataFrame, userCol: String, idCol: String,
                     tsCol: String, typeCol: String, centsCol: String,
                     touchTypes: Seq[String],
                     convType: String): DataFrame = {
    val e = df
      .filter(col(typeCol).isin(touchTypes :+ convType: _*))
      .select(col(userCol).as("u"), col(idCol).as("id"),
        col(tsCol).cast("long").as("t"), col(typeCol).as("ty"),
        col(centsCol).cast("long").as("cents"))
    val wSeg = Window.partitionBy(col("u")).orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = e.withColumn("seg",
      coalesce(sum(when(col("ty") === convType, 1L)).over(wSeg), lit(0L)))
    val touches = seg.filter(col("ty") =!= convType)
      .groupBy(col("u"), col("seg"))
      .agg(min_by(col("ty"), struct(col("t"), col("id"))).as("first_type"),
        max_by(col("ty"), struct(col("t"), col("id"))).as("last_type"))
    val conv = seg.filter(col("ty") === convType)
      .select(col("u"), col("seg"), col("cents"))
    val j = conv.join(touches, Seq("u", "seg"), "left")
      .select(col("cents"),
        coalesce(col("first_type"), lit("direct")).as("first_type"),
        coalesce(col("last_type"), lit("direct")).as("last_type"))
    def model(name: String, c: String) = j
      .groupBy(col(c).as("touch_type"))
      .agg(count(lit(1)).as("n_conv"), sum(col("cents")).as("cents"))
      .select(lit(name).as("model"), col("touch_type"), col("n_conv"),
        col("cents"))
    model("first_touch", "first_type")
      .unionAll(model("last_touch", "last_type"))
  }
}
