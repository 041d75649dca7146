package graft.functions

import graft.SparkSpec

/** Batch perceptron: deterministic integer training rounds —
  * misclassification under the incoming weights, summed ±y·x update. */
class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  // (y, x) rows with a single feature
  private def train1(rows: Seq[(Long, Long)], iters: Int) =
    LinearClassifier.trainPerceptron(rows.toDF("y", "x"), "y", Seq("x"),
      iters)

  /** Literal driver-side reference for cross-checks. */
  private def naive(rows: Seq[(Long, Seq[Long])], iters: Int)
      : Seq[(Long, IndexedSeq[Long])] = {
    var w = IndexedSeq.fill(rows.head._2.size + 1)(0L)
    (1 to iters).map { _ =>
      val mis = rows.filter { case (y, x) =>
        y * (w(0) + x.zipWithIndex.map { case (v, j) => w(j + 1) * v }.sum) <= 0
      }
      val nMis = mis.size.toLong
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + mis.map { case (y, x) => if (j == 0) y else y * x(j - 1) }.sum
      }
      (nMis, w)
    }
  }

  test("round 1 misclassifies everything (zero weights, margin 0)") {
    val r = train1(Seq((1L, 2L), (-1L, 5L), (1L, 7L)), 1)
    assert(r.head.nMis == 3L)
    // update: Σy = 1, Σy·x = 2 − 5 + 7 = 4
    assert(r.head.weights == IndexedSeq(1L, 4L))
  }

  test("a zero-misclassification round freezes the weights for good") {
    // all-positive labels: round 1 takes every row (margin 0), round 2
    // classifies everything correctly — rounds 2+ must not move
    val rounds = train1(Seq((1L, 1L), (1L, 2L)), 4)
    assert(rounds.head.weights == IndexedSeq(2L, 3L))
    assert(rounds.tail.forall(_.nMis == 0L))
    assert(rounds.tail.map(_.weights).distinct == Seq(IndexedSeq(2L, 3L)))
  }

  test("misclassification is ≤ 0 (a zero margin counts as wrong)") {
    // w after round 1 = (Σy, Σyx) = (0, 2): row (1, 0) then has margin
    // exactly 0 and must be counted in round 2
    val rows = Seq((1L, 1L), (-1L, -1L), (1L, 0L), (-1L, 0L))
    val r = train1(rows, 2)
    assert(r(0).weights == IndexedSeq(0L, 2L))
    assert(r(1).nMis == 2L) // both x = 0 rows sit on the boundary
  }

  test("null labels and features are dropped, not zero-filled") {
    val df = Seq(
      (Some(1L), Some(2L)), (None, Some(9L)), (Some(-1L), None))
      .toDF("y", "x")
    val r = LinearClassifier.trainPerceptron(df, "y", Seq("x"), 1)
    assert(r.head.nMis == 1L)
  }

  test("matches the literal reference on random multi-feature data") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val x = Seq.fill(3)(rng.nextInt(21).toLong - 10)
      val y: Long = if (2 * x(0) - x(1) + 3 * x(2) - 1 > 0) 1L else -1L
      (y, x)
    }
    val df = rows.map { case (y, x) => (y, x(0), x(1), x(2)) }
      .toDF("y", "a", "b", "c")
    val got = LinearClassifier.trainPerceptron(df, "y", Seq("a", "b", "c"), 5)
      .map(r => (r.nMis, r.weights))
    assert(got == naive(rows, 5))
  }

  test("predict applies the trained boundary (margin > 0 → +1)") {
    val model = IndexedSeq(-3L, 1L) // pred = sign(x − 3), 0 → −1
    val out = LinearClassifier.predict(
        Seq(1L, 3L, 4L).toDF("x"), Seq("x"), model)
      .select("x", "margin", "pred").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, -2L, -1L), (3L, 0L, -1L), (4L, 1L, 1L)))
  }

  test("perceptronHistory emits one row per round per coefficient") {
    val df = Seq((1L, 2L), (-1L, 5L)).toDF("y", "x")
    val h = LinearClassifier.perceptronHistory(df, "y", Seq("x"), 2)
      .as[(Long, Long, String, Long)].collect().toSet
    // round 1: all 2 misclassified, w = (0, −3); round 2: margins
    // y·(−3x) → (1,2): −6 ≤ 0 mis, (−1,5): 15 > 0 ok → w = (1, −1)
    assert(h == Set(
      (1L, 2L, "bias", 0L), (1L, 2L, "x", -3L),
      (2L, 1L, "bias", 1L), (2L, 1L, "x", -1L)))
  }
}
