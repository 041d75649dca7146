package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN-VIEW maintenance — the maintenance family's join
  * member (counts/HLL/quantile/bitmap/top-k/components all maintain;
  * the aggregated join did not): keep a standing `SELECT g, count(*),
  * sum(m) FROM A JOIN B USING (k) GROUP BY g` current under
  * APPEND-ONLY waves on both sides without re-joining the full tables.
  * The delta rule (differential dataflow's join bilinearity):
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * — three joins whose LEFT-side cardinality is delta-sized (the
  * `A_old ⋈ ΔB` term streams the standing side through a delta-keyed
  * join), so a daily wave costs O(|Δ| · fanout), not O(|A|·|B|).
  * Sums and counts are additive, so the standing aggregate folds with
  * one full-outer union-add. At 100 TB this is THE way a revenue-
  * per-customer view survives continuous ingest: the one-shot re-join
  * is a full-corpus shuffle; the delta fold touches yesterday's rows.
  *
  * Append-only contract: rows are never retracted (the reference's
  * extract-history model — new ids only). Retractions would need
  * signed multiplicities; fail that at the pipeline boundary, not
  * here. The maintained frame row-matches the one-shot recompute over
  * (old ∪ delta) on both sides — the q278 gate invariant, wave-order
  * invariant because union commutes and the aggregate is a monoid. */
object ViewMaintain {

  /** One-shot reference: `(groupCol, n_items, total)` of
    * `a ⋈ b ON joinKey` grouped by `a.groupCol` summing
    * `b.measureCol`. */
  def joinSum(a: DataFrame, b: DataFrame, joinKey: String,
              groupCol: String, measureCol: String): DataFrame =
    a.select(col(joinKey).as("_k"), col(groupCol).as("g"))
      .join(b.select(col(joinKey).as("_k"),
        col(measureCol).cast("long").as("m")), Seq("_k"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_items"), sum(col("m")).as("total"))
      .select(col("g").as(groupCol), col("n_items"), col("total"))

  /** Fold one append-only wave `(dA, dB)` into the `standing`
    * aggregate (a prior [[joinSum]] / [[maintainJoinSum]] output;
    * empty-frame start is fine). `aOld`/`bOld` are the sides AS OF
    * BEFORE this wave. */
  def maintainJoinSum(standing: DataFrame, aOld: DataFrame,
                      dA: DataFrame, bOld: DataFrame, dB: DataFrame,
                      joinKey: String, groupCol: String,
                      measureCol: String): DataFrame = {
    val delta = joinSum(dA, bOld, joinKey, groupCol, measureCol)
      .unionByName(joinSum(aOld, dB, joinKey, groupCol, measureCol))
      .unionByName(joinSum(dA, dB, joinKey, groupCol, measureCol))
    standing.select(col(groupCol), col("n_items"), col("total"))
      .unionByName(delta)
      .groupBy(col(groupCol))
      .agg(sum(col("n_items")).as("n_items"), sum(col("total")).as("total"))
  }
}
