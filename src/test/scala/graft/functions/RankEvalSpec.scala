package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  test("lcmUpTo matches known values and rejects overflow range") {
    assert(RankEval.lcmUpTo(1) == 1L)
    assert(RankEval.lcmUpTo(10) == 2520L)
    assert(RankEval.lcmUpTo(20) == 232792560L)
    intercept[IllegalArgumentException](RankEval.lcmUpTo(41))
    intercept[IllegalArgumentException](RankEval.lcmUpTo(0))
  }

  // q1: hits at ranks 2 and 4 (of 3 relevant total — one never retrieved)
  // q2: hit at rank 1, only 1 relevant
  // q3: no hits, 2 relevant
  // q4: retrieved but the query has NO relevant docs at all
  val ranked = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
    (2L, 20L, 1), (2L, 21L, 2),
    (3L, 30L, 1), (3L, 31L, 2),
    (4L, 40L, 1)
  ).toDF("qid", "doc", "rank")
  val relevant = Seq(
    (1L, 11L), (1L, 13L), (1L, 99L),
    (2L, 20L),
    (3L, 98L), (3L, 97L)
  ).toDF("qid", "doc")

  test("per-query metrics: hits, first rank, scaled RR and AP are exact") {
    val m = RankEval.rankedMetrics(ranked, "qid", "doc", "rank", relevant, k = 4)
      .orderBy("qid")
      .as[(Long, Long, Long, Option[Long], Long, Long)].collect().toSeq
    // lcm(1..4) = 12
    // q1: hits at 2 (cum 1) and 4 (cum 2): ap = 1*(12/2) + 2*(12/4) = 12;
    //     rr = 12/2 = 6
    assert(m(0) == ((1L, 3L, 2L, Some(2L), 6L, 12L)))
    // q2: hit at 1: rr = 12, ap = 1*12 = 12
    assert(m(1) == ((2L, 1L, 1L, Some(1L), 12L, 12L)))
    // q3: no hit: rr = 0, ap = 0, first null
    assert(m(2) == ((3L, 2L, 0L, None, 0L, 0L)))
    // q4: no relevant at all: n_rel 0
    assert(m(3) == ((4L, 0L, 0L, None, 0L, 0L)))
  }

  test("scaled metrics divide back to the textbook float values") {
    val m = RankEval.rankedMetrics(ranked, "qid", "doc", "rank", relevant, k = 4)
      .orderBy("qid")
      .as[(Long, Long, Long, Option[Long], Long, Long)].collect()
    val L = 12.0
    // q1 AP with min(n_rel, k)=3 denominator: (1/2 + 2/4) / 3 = 1/3
    assert(math.abs(m(0)._6 / (L * 3) - 1.0 / 3) < 1e-12)
    assert(math.abs(m(0)._5 / L - 0.5) < 1e-12)
    // MRR over the 4 queries: (1/2 + 1 + 0 + 0) / 4 = 0.375
    val mrr = m.map(_._5).sum / (L * m.length)
    assert(math.abs(mrr - 0.375) < 1e-12)
  }

  test("rollup sums the integer numerators and emits true MAP (mean of " +
      "per-query AP), distinct from the micro-average") {
    val r = RankEval.rollup(
        RankEval.rankedMetrics(ranked, "qid", "doc", "rank", relevant, k = 4),
        k = 4)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert((r._1, r._2, r._3, r._4) == ((4L, 3L, 18L, 24L)))
    // sum of min(n_rel, 4): q1=3, q2=1, q3=2, q4=0
    assert(r._5 == 6L)
    // true MAP, trec_eval convention: q4 (no relevant docs) is EXCLUDED
    // from the mean; q3 has relevant docs but no hits, so it counts as 0:
    // (1/3 + 1 + 0) / 3 = 4/9
    assert(math.abs(r._6 - 4.0 / 9) < 1e-12)
    val skew = Seq((1L, 10L, 1), (2L, 20L, 1)).toDF("qid", "doc", "rank")
    val skewRel = Seq((1L, 10L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("qid", "doc")
    val s = RankEval.rollup(
        RankEval.rankedMetrics(skew, "qid", "doc", "rank", skewRel, k = 2),
        k = 2)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    // q1: AP = 1; q2: AP = (1*1)/min(3,2)=2 → 1/2; MAP = 3/4
    assert(math.abs(s._6 - 0.75) < 1e-12)
    // micro-average = sum_ap/(L*sum_min) = (2+2)/(2*3) = 2/3 ≠ MAP
    assert(math.abs(s._4.toDouble / (2.0 * s._5) - 2.0 / 3) < 1e-12)
  }

  test("out-of-range ranks fail loudly instead of skewing the metrics") {
    val zero = Seq((1L, 10L, 0)).toDF("qid", "doc", "rank")
    val eZero = intercept[Exception] {
      RankEval.rankedMetrics(zero, "qid", "doc", "rank", relevant, k = 4)
        .collect()
    }
    assert(eZero.getMessage.contains("rank out of [1,4]"))
    val over = Seq((1L, 10L, 5)).toDF("qid", "doc", "rank")
    val eOver = intercept[Exception] {
      RankEval.rankedMetrics(over, "qid", "doc", "rank", relevant, k = 4)
        .collect()
    }
    assert(eOver.getMessage.contains("rank out of [1,4]"))
  }

  test("duplicate relevance pairs do not double-count") {
    val dupRel = relevant.unionByName(Seq((2L, 20L)).toDF("qid", "doc"))
    val m = RankEval.rankedMetrics(ranked, "qid", "doc", "rank", dupRel, k = 4)
      .filter($"qid" === 2L)
      .as[(Long, Long, Long, Option[Long], Long, Long)].head()
    assert(m == ((2L, 1L, 1L, Some(1L), 12L, 12L)))
  }
}
