package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graded retrieval evaluation — per-query MRR / MAP / precision@k over a
  * ranked candidate list and a binary relevance set (the offline judgment
  * of a retrieval index: [[Similarity.recallAtK]] answers "did the ANN
  * index find the true neighbors"; this answers "are the neighbors it
  * found the RIGHT documents").
  *
  * Exactness: reciprocal-rank and average-precision terms are rationals
  * with denominators ≤ k, so both report SCALED-INTEGER metrics —
  * multiply every term by `L = lcm(1..k)` and the sum is exact integer
  * arithmetic, engine-portable with no float-summation order sensitivity:
  *   rr_scaled = L / first_rel_rank            (MRR = rr_scaled / L)
  *   ap_scaled = Σ_hits cum_rel · (L / rank)   (AP  = ap_scaled / (L · min(n_rel, k)))
  * Callers divide once at the end if they want floats; the gate compares
  * the integers.
  *
  * Scale shape (10^9 queries × k candidates): the only window partitions
  * by qid over ≤ k rows — high-cardinality key, bounded partition, no
  * skew funnel; relevance marking is a (qid, doc) equi-join; per-query
  * rollup is one map-side-combinable aggregation. Nothing is
  * corpus-sized: the input is already the k-bounded ranked list.
  */
object RankEval {

  /** lcm(1..k) — overflow-guarded (k ≤ 40 keeps it under 2^63; real
    * evaluation cutoffs are 10/100). */
  def lcmUpTo(k: Int): Long = {
    require(k >= 1 && k <= 40, s"lcmUpTo: k=$k out of [1,40]")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to k.toLong).foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
  }

  /** Per-query ranked-retrieval metrics.
    *
    * `ranked`: (qid, doc, rank) — rank 1-based and ≤ k within each query
    * (ties already broken upstream; duplicate ranks raise downstream
    * ambiguity, so they fail the require probe in the spec layer).
    * `relevant`: (qid, doc) binary relevance pairs.
    *
    * Returns one row per qid in `ranked`:
    * (qid, n_rel, n_hit, first_rel_rank (null if no hit), rr_scaled,
    * ap_scaled) — `n_rel` counts ALL relevant docs for the query (0 if
    * the query has none), `n_hit` the relevant among the top-k.
    */
  def rankedMetrics(ranked: DataFrame, qidCol: String, docCol: String,
                    rankCol: String, relevant: DataFrame, k: Int): DataFrame = {
    val lcm = lcmUpTo(k)
    val qid = col(qidCol)
    val rel = relevant.select(qid, col(docCol)).distinct()
      .withColumn("_rel", lit(1L))
    // defensive: rank 0 would divide lcm by zero (silent null term), a
    // rank > k would silently truncate the integer division — both are
    // caller bugs that must fail LOUDLY, not skew the metrics
    val rankChecked =
      when(col(rankCol).isNull || col(rankCol) < 1 || col(rankCol) > k,
        raise_error(concat(lit(s"rankedMetrics: rank out of [1,$k]: "),
          coalesce(col(rankCol).cast("string"), lit("null")))))
      .otherwise(col(rankCol).cast("long"))
    val marked = ranked.select(qid, col(docCol), rankChecked.as("_rank"))
      .join(rel, Seq(qidCol, docCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
    // bounded window: ≤ k rows per qid partition
    val w = Window.partitionBy(qid).orderBy(col("_rank"))
    val perHit = marked
      .withColumn("_cum_rel", sum(col("_rel")).over(w))
      .withColumn("_ap_term",
        // `div` = exact integer division (lcm is divisible by every
        // rank ≤ k by construction; no double round trip)
        when(col("_rel") === 1L, col("_cum_rel") * expr(s"$lcm div _rank"))
          .otherwise(lit(0L)))
    val perQuery = perHit.groupBy(qid).agg(
      sum(col("_rel")).as("n_hit"),
      min(when(col("_rel") === 1L, col("_rank"))).as("first_rel_rank"),
      sum(col("_ap_term")).as("ap_scaled"))
    val nRel = relevant.select(qid, col(docCol)).distinct()
      .groupBy(qid).agg(count(lit(1)).as("n_rel"))
    perQuery.join(nRel, Seq(qidCol), "left")
      .select(qid,
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_hit"),
        col("first_rel_rank"),
        coalesce(expr(s"$lcm div first_rel_rank"), lit(0L)).as("rr_scaled"),
        col("ap_scaled"))
  }

  /** Corpus-level rollup of [[rankedMetrics]] for the same cutoff `k`.
    * Exact integer sums plus the two averages they support — which are
    * DIFFERENT statistics, a distinction the denominators carry:
    *  - MRR = `sum_rr_scaled / (L · n_queries)` — the mean of per-query
    *    reciprocal ranks (valid because every query shares the rr
    *    denominator L).
    *  - MAP = mean over queries of `ap_scaled_q / (L · min(n_rel_q, k))`
    *    — the per-query division MUST happen before averaging whenever
    *    queries have different n_rel, so no ratio of the integer sums can
    *    express it; emitted here as the float `map`. Queries with
    *    n_rel = 0 are EXCLUDED from the mean (the trec_eval convention:
    *    AP is undefined with no relevant documents); all-no-relevant
    *    input yields a null `map`.
    *  - `sum_ap_scaled / (L · sum_min_nrel_k)` is the MICRO-average
    *    (ratio of sums) — a hit-weighted statistic, not MAP; both
    *    numerator and denominator are emitted so callers can take either
    *    knowingly. */
  def rollup(perQuery: DataFrame, k: Int): DataFrame = {
    val lcm = lcmUpTo(k)
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      sum(col("n_hit")).as("total_hits"),
      sum(col("rr_scaled")).as("sum_rr_scaled"),
      sum(col("ap_scaled")).as("sum_ap_scaled"),
      sum(least(col("n_rel"), lit(k.toLong))).as("sum_min_nrel_k"),
      // no `otherwise`: n_rel = 0 queries stay null and avg skips them
      avg(when(col("n_rel") > 0,
          col("ap_scaled").cast("double") /
            (lit(lcm.toDouble) * least(col("n_rel"), lit(k.toLong)))))
        .as("map"))
  }
}
