package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  // dim 0 spans [0,1]; dim 1 spans [-2,2]; dim 2 is constant
  private val vecs = Seq(
    (1L, Seq(0.0f, -2.0f, 3.5f)),
    (2L, Seq(0.5f, 0.0f, 3.5f)),
    (3L, Seq(1.0f, 2.0f, 3.5f))).toDF("id", "vec")

  test("calibration finds per-dimension ranges") {
    val st = Quantize.dimStats(vecs, "vec").orderBy("dim")
      .as[(Int, Double, Double)].collect().toSeq
    assert(st == Seq((0, 0.0, 1.0), (1, -2.0, 2.0), (2, 3.5, 3.5)))
  }

  test("report: extremes map to 0 and 255, error bounded by scale/2") {
    val rep = Quantize.quantReport(vecs, "vec").orderBy("dim").collect()
    val d0 = rep(0)
    // dim0 levels: 0.0→0, 0.5→128 (0.5/scale=127.5, +0.5 → 128), 1.0→255
    assert(d0.getAs[Long]("sum_q") == 0L + 128L + 255L)
    assert(d0.getAs[Long]("n_sat") == 1L)
    val scale0 = 1.0 / 255.0
    assert(d0.getAs[Double]("max_abs_err") <= scale0 / 2 + 1e-12)
    // constant dimension: every level 0, zero error
    val d2 = rep(2)
    assert(d2.getAs[Long]("sum_q") == 0L)
    assert(d2.getAs[Double]("max_abs_err") == 0.0)
  }

  test("quantizeVectors round-trips within half a step everywhere") {
    val q = Quantize.quantizeVectors(vecs, "vec", "qvec")
    val rows = q.select("vec", "qvec")
      .as[(Seq[Float], Seq[Int])].collect()
    val stats = Quantize.dimStats(vecs, "vec").orderBy("dim")
      .as[(Int, Double, Double)].collect()
    rows.foreach { case (xs, qs) =>
      xs.indices.foreach { d =>
        val (_, mn, mx) = stats(d)
        val scale = (mx - mn) / 255.0
        if (scale == 0.0) assert(qs(d) == 0)
        else {
          val recon = mn + qs(d) * scale
          assert(math.abs(recon - xs(d)) <= scale / 2 + 1e-12)
          assert(qs(d) >= 0 && qs(d) <= 255)
        }
      }
    }
  }

  test("report levels match quantizeVectors levels (one formula)") {
    val q = Quantize.quantizeVectors(vecs, "vec", "qvec")
      .select(posexplode($"qvec").as(Seq("dim", "q")))
      .groupBy("dim").agg(sum($"q").as("sum_q"))
      .as[(Int, Long)].collect().toMap
    val rep = Quantize.quantReport(vecs, "vec")
      .select("dim", "sum_q").as[(Int, Long)].collect().toMap
    assert(q == rep)
  }
}
