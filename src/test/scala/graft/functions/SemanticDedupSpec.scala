package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  // two tight clusters far apart, plus exact clones
  private val base: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1.00f, 0.00f, 0.0f, 0.0f),
    2L -> Seq(0.99f, 0.01f, 0.0f, 0.0f),
    3L -> Seq(0.0f, 0.0f, 1.00f, 0.00f),
    4L -> Seq(0.0f, 0.0f, 0.01f, 0.99f))

  test("exact clones are dropped, originals kept") {
    val corpus = base ++ base.map { case (id, v) => (id + 100L) -> v }
    val out = Similarity.semanticDedup(vecs(corpus), "vec_id", "embedding",
        k = 2, threshold = 0.999999)
      .select($"vec_id", $"cell", $"keep")
      .as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == corpus.size)
    base.foreach { case (id, _) =>
      assert(out(id)._2, s"original $id must keep")
      assert(!out(id + 100L)._2, s"clone ${id + 100L} must drop")
      // identical vectors land in the same cell (deterministic tie-break)
      assert(out(id)._1 == out(id + 100L)._1)
    }
  }

  test("keep/drop agrees with a naive within-cell all-pairs recount") {
    val corpus = base ++ base.map { case (id, v) => (id + 100L) -> v } ++
      Seq(50L -> Seq(0.7f, 0.7f, 0.1f, 0.0f)) // a loner near neither cluster
    val df = vecs(corpus)
    val threshold = 0.99
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
        k = 2, threshold = threshold)
      .select($"vec_id", $"keep").as[(Long, Boolean)].collect().toMap
    // recompute the same centroids and assignment driver-side
    val cents = Similarity.ivfCentroidsTrainedPortable(
      df, "embedding", "vec_id", k = 2)
    def cell(v: Seq[Float]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.minBy(identity)._2
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / math.max(math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)), 1e-12)
    }
    val want = corpus.map { case (id, v) =>
      id -> !corpus.exists { case (oid, ov) =>
        oid < id && cell(ov) == cell(v) && cos(ov, v) >= threshold
      }
    }.toMap
    assert(out == want)
  }
}
