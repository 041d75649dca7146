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
  * Scale shape: the delta-frontier formulation — the edge list
  * materializes ONCE hash-partitioned on src; each hop expands ONLY the
  * nodes discovered in the previous round (the frontier), never the
  * full standing distance table, so per-hop join work tracks the wave
  * being explored instead of everything reached so far (the classic
  * deep-graph fix: settled nodes stop generating candidates). In
  * unweighted BFS a node's first-discovered distance is already
  * minimal, so the fold into the standing table is a left-anti (keep
  * candidates for unseen nodes only) — no re-least over settled rows.
  * Candidate `min(dist + 1)` per dst partial-aggregates (map-side
  * combine — a hub's frontier never funnels). Unreached nodes never
  * materialize rows. Plans stay flat via per-round `localCheckpoint`,
  * and the loop stops early once a wave discovers nothing new.
  */
object Bfs {

  /** One delta-frontier hop: expand `frontier` over `e`, keep only
    * nodes absent from `dists`. Returns (standing ∪ discovered,
    * discovered) — `discovered` IS the next frontier, and equals
    * exactly the rows added to the standing table this hop (the
    * invariant BfsSpec pins round by round). */
  private[operators] def step(e: DataFrame, dists: DataFrame,
                              frontier: DataFrame): (DataFrame, DataFrame) = {
    val discovered = e
      .join(frontier.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      .groupBy("node").agg(min(col("dist")).as("dist"))
      .join(dists.select("node"), Seq("node"), "left_anti")
      // LAZY: the caller's frontier-empty check is the round's ONE
      // action; it materializes (and caches) this checkpoint's
      // partitions on demand instead of paying a separate eager
      // materialization barrier first
      .localCheckpoint(eager = false)
    (dists.union(discovered), discovered)
  }

  /** Bounded Bellman-Ford: `(node, dist)` where dist is the CHEAPEST
    * path cost from any seed using at most `rounds` edges — the
    * weighted companion to [[multiSourceDistances]] ("cheapest path to
    * a trusted source"), exact over integer weights. Same delta-frontier
    * skeleton, but since a cheaper path CAN arrive later here, each
    * round least-merges candidates into the standing table and the next
    * frontier is exactly the nodes whose distance improved (new or
    * strictly smaller) — the SPFA observation: a relaxation out of a
    * node whose distance didn't change this round was already applied
    * with the same source value in an earlier round, so settled nodes
    * generate no work. One `localCheckpoint` per round (the merged
    * table), candidates partial-aggregate `min(dist + w)` map-side.
    * Stops early when a round improves nothing. Weights may be any
    * Long (negative edges are legal — `rounds` bounds path length, so
    * there is no cycle divergence); costs must stay within Long. */
  def weightedDistances(edges: DataFrame, srcCol: String, dstCol: String,
                        weightCol: String, seeds: DataFrame, seedCol: String,
                        rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .repartition(col("src")).localCheckpoint()
    var dists = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dists
    var r = 0
    while (r < rounds && !frontier.isEmpty) {
      val cand = e
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("_c"))
        .groupBy("node").agg(min(col("_c")).as("_c"))
      val merged = dists.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("_c")),
            coalesce(col("_c"), col("dist"))).as("dist"),
          (col("_c").isNotNull &&
            (col("dist").isNull || col("_c") < col("dist")))
            .as("_improved"))
        // LAZY: frontier.isEmpty is the round's one action (see step())
        .localCheckpoint(eager = false)
      frontier = merged.filter(col("_improved")).select("node", "dist")
      dists = merged.select("node", "dist")
      r += 1
    }
    dists
  }

  /** [[weightedDistances]] with PATH RECONSTRUCTION: `(node, dist,
    * pred)` where `pred` is the upstream neighbor on the cheapest
    * ≤-`rounds`-edge path (seeds point at themselves) — ties at equal
    * cost break to the SMALLEST predecessor id, so the tree is unique
    * and restates exactly. State per node is the lexicographic-min
    * `(dist, pred)` struct; the fold is still a monotone lattice merge
    * (struct `least`), so the delta-frontier rounds produce the same
    * standing table as full per-round relaxation: a node whose struct
    * didn't improve re-offers nothing new — its outgoing candidates
    * `(dist + w, node)` depend on its DIST, not its own pred. Walking
    * `pred` upstream from any node reaches a seed in ≤ `rounds`
    * steps. */
  def weightedPathTree(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, seeds: DataFrame, seedCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .repartition(col("src")).localCheckpoint()
    var dists = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .select(col("node"),
        struct(lit(0L).as("dist"), col("node").as("pred")).as("s"))
      .localCheckpoint()
    var frontier = dists
    var r = 0
    while (r < rounds && !frontier.isEmpty) {
      val cand = e
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          struct((col("s.dist") + col("w")).as("dist"),
            col("src").as("pred")).as("_c"))
        .groupBy("node").agg(min(col("_c")).as("_c"))
      val merged = dists.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(col("s"), col("_c")).as("s"),
          (col("_c").isNotNull &&
            (col("s").isNull || col("_c") < col("s"))).as("_improved"))
        // LAZY: frontier.isEmpty is the round's one action (see step())
        .localCheckpoint(eager = false)
      frontier = merged.filter(col("_improved")).select("node", "s")
      dists = merged.select("node", "s")
      r += 1
    }
    dists.select(col("node"), col("s.dist").as("dist"),
      col("s.pred").as("pred"))
  }

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
    var frontier = dists
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      val (d, f) = step(e, dists, frontier)
      dists = d
      frontier = f
      hop += 1
    }
    dists
  }
}
