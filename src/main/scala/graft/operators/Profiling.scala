package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational profiling audits — the discovery side of the D1/A-family
  * metadata surface: before a table's metadata claims "o_orderkey is a
  * key", "every lineitem has an order", "status is determined by
  * state", something has to CHECK it against the data, and keep
  * checking it on every load. Two audits:
  *
  *  - functional dependency (lhs → rhs): does each lhs value map to at
  *    most one rhs value? Violations are counted two ways — lhs groups
  *    that fan out, and the number of surplus rhs values — because "3
  *    keys each with 2 variants" and "1 key with 7 variants" demand
  *    different fixes.
  *  - referential integrity (child.fk ⊆ parent.pk): orphan counts per
  *    declared relationship.
  *
  * Scale shape: FD is one map-side-combinable `groupBy(lhs)` +
  * `countDistinct(rhs)` per pair, folded to a 1-row report. RI is one
  * distinct-build on the parent key + a broadcast-friendly left-anti
  * (parent keys after distinct are usually dimension-sized; AQE picks
  * broadcast when they are). Nothing row-scale ever reaches the
  * driver.
  *
  * Null semantics (both SQL-standard): a NULL rhs never violates an
  * FD (`countDistinct` skips it); a NULL child key is never an orphan
  * (a null FK matches nothing and is legal).
  */
object Profiling {

  /** One row per (lhs → rhs) candidate: `(lhs, rhs, n_lhs,
    * n_violating_lhs, n_extra_rhs, holds)` — distinct lhs values, lhs
    * values mapping to ≥ 2 rhs values, surplus rhs mappings beyond one
    * per lhs, and the verdict. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one lhs -> rhs pair")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("_l"))
        .agg(countDistinct(col(rhs)).as("_k"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("_k") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
          sum(greatest(col("_k") - 1, lit(0L))).as("n_extra_rhs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_lhs"),
          col("n_violating_lhs"), col("n_extra_rhs"),
          (col("n_extra_rhs") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** One row per declared relationship: `(relation, n_child,
    * n_orphans, intact)`. `n_child` counts non-null child keys (a null
    * FK is legal, not an orphan). */
  def riAudit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, relation: String): DataFrame = {
    val c = child.select(col(childKey).as("_ck"))
      .filter(col("_ck").isNotNull)
    val p = parent.select(col(parentKey).as("_ck")).distinct()
    val orphans = c.join(p, Seq("_ck"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    c.agg(count(lit(1)).as("n_child"))
      .crossJoin(broadcast(orphans))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_orphans"), (col("n_orphans") === 0).as("intact"))
  }
}
