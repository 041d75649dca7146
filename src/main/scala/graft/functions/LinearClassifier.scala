package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier — the batch
  * perceptron (Rosenblatt's rule applied once per full pass), the
  * cluster-shaped way to FIT the fastText-style linear filters that
  * curation pipelines otherwise import as frozen artifacts (the CCNet /
  * LLaMA quality-filter pattern: a linear model over cheap integer text
  * statistics decides what enters the training mix). [[QualityFilters]]
  * APPLIES such rules; this module learns the weights on-cluster from a
  * labeled sample.
  *
  * Numeric contract (what makes a TRAINER oracle-checkable): labels are
  * ±1 longs, features are longs, weights are longs, and the update is the
  * batch rule
  *
  *   w ← w + Σ_{misclassified} y·x,   b ← b + Σ_{misclassified} y,
  *
  * where misclassified means y·(w·x + b) ≤ 0 under the PREVIOUS weights.
  * Long sums commute, so the shuffled aggregation order is irrelevant and
  * every round restates exactly in an external engine — float SGD (order-
  * dependent, transcendental losses) cannot be hash-compared; the batch
  * perceptron converges on linearly separable data all the same
  * (Novikoff's bound applies round-wise) and degrades gracefully to a
  * stable deterministic trajectory on noisy labels.
  *
  * Scale shape (100 TB): the featurized frame materializes ONCE
  * (`localCheckpoint`) and each round is ONE map-side-combinable
  * aggregation over it — d+2 long sums under a filter whose weights enter
  * as literals; the model (d+1 longs) lives on the driver, which is where
  * a model belongs. Nothing row-sized ever reaches the driver, no window,
  * no per-row state. Rounds are O(iters) sequential jobs by nature of the
  * algorithm.
  */
object LinearClassifier {

  /** One training round's outcome: the misclassified count under the
    * round's INCOMING weights, and the weights after its update.
    * `weights(0)` is the bias; `weights(j)` pairs with `featureCols(j-1)`. */
  final case class Round(iter: Int, nMis: Long, weights: IndexedSeq[Long])

  /** Train `iters` batch-perceptron rounds from zero weights. `labelCol`
    * must be ±1; rows with a null label or feature are dropped (they can
    * vote neither way). Returns every round's trajectory — the final
    * round's weights are the model. */
  def trainPerceptron(df: DataFrame, labelCol: String,
                      featureCols: Seq[String], iters: Int): Seq[Round] = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(iters >= 1, "iters must be positive")
    val cols = col(labelCol).cast("long").as("_y") +:
      featureCols.zipWithIndex.map { case (c, j) =>
        col(c).cast("long").as(s"_x$j")
      }
    val feats = df.select(cols: _*).na.drop().localCheckpoint()
    // margin and update sums run in DECIMAL(38,0): raw long arithmetic
    // wraps SILENTLY under Spark's non-ANSI default (while an external
    // engine errors) — at 100 TB row counts the per-round deltas
    // genuinely approach 2^63. Decimal keeps every round exact; the
    // driver-side extraction below fails loudly if a weight ever
    // outgrows a long.
    val dec = "decimal(38,0)"
    var w = IndexedSeq.fill(featureCols.size + 1)(0L)
    (1 to iters).map { it =>
      val margin = col("_y").cast(dec) * featureCols.indices
        .map(j => lit(w(j + 1)).cast(dec) * col(s"_x$j"))
        .foldLeft(lit(w(0)).cast(dec): Column)(_ + _)
      val sums = count(lit(1)).as("_n") +:
        sum(col("_y").cast(dec)).as("_db") +:
        featureCols.indices.map(j =>
          sum(col("_y").cast(dec) * col(s"_x$j")).as(s"_d$j"))
      // a 1-row aggregate is the only thing that ever reaches the driver
      val row = feats.filter(margin <= 0).agg(sums.head, sums.tail: _*)
        .collect()(0)
      val nMis = row.getLong(0)
      val deltas = (0 to featureCols.size).map { j =>
        if (row.isNullAt(j + 1)) 0L
        else row.getDecimal(j + 1).toBigInteger.longValueExact()
      }
      w = w.lazyZip(deltas).map(Math.addExact(_, _))
      Round(it, nMis, w)
    }
  }

  /** The training trajectory as a frame for auditing/gating: one row per
    * (round, coefficient) — `(iter, n_mis, feature, weight)` with the
    * bias reported as feature `bias` and weights AFTER the round's
    * update. Built from driver-held model state (d·iters rows). */
  def perceptronHistory(df: DataFrame, labelCol: String,
                        featureCols: Seq[String], iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val names = "bias" +: featureCols
    trainPerceptron(df, labelCol, featureCols, iters)
      .flatMap(r => names.zip(r.weights).map { case (f, wv) =>
        (r.iter.toLong, r.nMis, f, wv)
      })
      .toDF("iter", "n_mis", "feature", "weight")
  }

  /** Apply a trained model: appends integer `margin` (w·x + b) and `pred`
    * (+1 on margin > 0, else −1 — the training rule's own decision
    * boundary). `weights` as returned by [[trainPerceptron]].
    *
    * The dot product accumulates in DECIMAL(38,0) — the same hazard the
    * trainer guards against: a raw long multiply-add wraps silently
    * under Spark's non-ANSI default, and large trained weights × wide
    * features could flip the sign. The SIGN (and hence `pred`) is
    * decided on the exact decimal; `margin` is cast back to long for
    * the serving schema (exact whenever |w·x+b| < 2^63, null past it —
    * never silently wrapped). */
  def predict(df: DataFrame, featureCols: Seq[String],
              weights: IndexedSeq[Long]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      "weights must be bias +: one per feature")
    val dec = "decimal(38,0)"
    val marginDec = featureCols.zipWithIndex
      .map { case (c, j) =>
        lit(weights(j + 1)).cast(dec) * col(c).cast(dec)
      }
      .foldLeft(lit(weights(0)).cast(dec): Column)(_ + _)
    df.withColumn("_margin_dec", marginDec)
      .withColumn("margin", col("_margin_dec").cast("long"))
      .withColumn("pred",
        when(col("_margin_dec") > 0, 1L).otherwise(-1L))
      .drop("_margin_dec")
  }
}
