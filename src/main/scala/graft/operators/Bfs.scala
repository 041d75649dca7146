package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS distances — bounded-hop shortest paths from a seed
  * set over a relational edge list, the distance primitive the graph
  * family was missing: "how many co-occurrence hops from the trusted
  * corpus is this document", "blast radius of these incident keys
  * within k hops". Deterministic by construction (min over equal-length
  * paths is path-order-free), so the frontier rounds restate exactly in
  * an external engine.
  *
  * Scale shape: the [[PageRank]]/[[LabelProp]] iteration pattern — the
  * edge list materializes ONCE hash-partitioned on src; each hop joins
  * the node-sized distance table on src, partial-aggregates the
  * candidate `min(dist + 1)` per dst (map-side combine — a hub's
  * frontier never funnels), and folds it into the standing distances
  * with a null-safe `least`. Unreached nodes never materialize rows.
  * Plans stay flat via per-round `localCheckpoint`.
  */
object Bfs {

  /** `(node, dist)` for every node within `maxHops` of a seed (seeds at
    * 0). Distances are exact shortest-path hop counts over the DIRECTED
    * edge list (symmetrize for undirected semantics). */
  def multiSourceDistances(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).localCheckpoint()
    var dists = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val frontier = e.join(dists.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + 1).as("_c"))
        .groupBy("node").agg(min(col("_c")).as("_c"))
      dists = dists.as("d")
        .join(frontier.as("f"), Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("_c")),
            coalesce(col("_c"), col("dist"))).as("dist"))
        .localCheckpoint()
    }
    dists
  }
}
