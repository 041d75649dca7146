package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage data selection — the submodular "pick the k
  * documents that together cover the most vocabulary" primitive behind
  * diversity-driven training-data curation (coreset seeding, dedupe-
  * aware subset selection, eval-set picking). Classic greedy gives the
  * (1 − 1/e) guarantee and, run over EXACT integer gains with a total
  * (gain DESC, id) tie order, is fully deterministic — so every round
  * restates in SQL as an anti-join count + argmax, the q201/q222
  * unrolled-CTE oracle pattern.
  *
  * Scale shape: the (id, token) incidence table materializes ONCE
  * (distinct, checkpointed); each round is one scan of it — a
  * BROADCAST anti-join against the covered-token set followed by a
  * map-side-combinable count per id and a 1-row argmax collect. The
  * covered set only ever holds the WINNERS' tokens (≤ k · max tokens
  * per doc — driver-bounded by construction, not corpus-sized), which
  * is what keeps the anti-join broadcastable at any corpus scale. k
  * rounds = k scans; the loop stops early once nothing new can be
  * covered (gain 0 rows never emit).
  */
object Selection {

  /** Greedy max-coverage over `items(idCol, tokenCol)` incidence rows
    * (duplicates fine — coverage is set semantics). Returns one row per
    * selection round: `(k, idCol, gain)` where `gain` is the exact
    * count of tokens newly covered by that round's winner; ties break
    * on the smaller id. Emits fewer than `k` rows when coverage
    * saturates (every remaining id would add 0 new tokens). */
  def greedyMaxCoverage(items: DataFrame, idCol: String, tokenCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    val sh = items.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("string").as("s"))
      .distinct().localCheckpoint()
    var covered = sh.select("s").filter(lit(false)).localCheckpoint()
    val picks = Seq.newBuilder[(Long, Long, Long)]
    var round = 1
    var saturated = false
    while (round <= k && !saturated) {
      val win = sh.join(broadcast(covered), Seq("s"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1).collect()
      if (win.isEmpty) saturated = true
      else {
        val (wid, gain) = (win(0).getLong(0), win(0).getLong(1))
        picks += ((round.toLong, wid, gain))
        covered = covered
          .union(sh.filter(col("id") === wid).select("s"))
          .distinct().localCheckpoint()
        round += 1
      }
    }
    picks.result().toDF("k", idCol, "gain")
  }
}
