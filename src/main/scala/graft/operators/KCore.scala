package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983; the
  * distributed formulation is Montresor et al. 2013) — the densest-region
  * extractor that closes the iterative-graph family next to
  * [[Components]] (connectivity), [[PageRank]] (centrality),
  * [[LabelProp]] (communities) and [[Triangles]] (cohesion). Training-data
  * use: the k-core of a near-dup similarity graph isolates the HEAVILY
  * plagiarized kernel of a crawl (every member near-dups ≥ k others —
  * template farms, mirror rings) from incidental pairwise matches, which
  * is a stronger drop signal than component membership alone.
  *
  * Determinism contract: peeling is SYNCHRONOUS — round t removes ALL
  * nodes whose degree in round t−1's surviving subgraph is < k at once,
  * so the trajectory is a pure function of the edge list (update-order-
  * free) and restates round by round in an external engine. The fixpoint
  * (the true k-core) is reached once a round removes nothing; `rounds`
  * bounds the iteration like [[PageRank]]'s — peeling cascades are
  * short in practice (each round must remove ≥ 1 node to continue).
  *
  * Scale shape: per round ONE map-side-combinable degree count
  * (node-cardinality result) and two semi-joins that shrink the edge
  * table; edges stay hash-partitioned on src so the dst-side semi-join
  * is the only exchange of note, and each round ends in
  * `localCheckpoint` to keep the plan flat. No windows, nothing
  * collects.
  */
object KCore {

  /** Survivors of `rounds` synchronous peels at threshold `k`, with
    * their degree in the surviving subgraph: `(node, deg)`. Pass a
    * SYMMETRIZED edge list for undirected semantics (degree = out-degree
    * of the symmetrized list). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Long, rounds: Int): DataFrame = {
    require(k >= 1, "kCore: k must be positive")
    require(rounds >= 1, "kCore: need at least one peeling round")
    var e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k).select(col("src"))
      // LAZY checkpoint (the PageRank r21 pattern): the peel count is
      // FIXED and nothing reads a round on the driver, so the plan is
      // cut to a leaf per round but all peels execute inside the ONE
      // action the caller launches — no per-round scheduling barrier.
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
