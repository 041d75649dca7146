package graft.functions

import graft.SparkSpec

/** Centroid alignment: exact quantized sums, cross-multiplied cosine. */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def align(rows: Seq[(String, Seq[Float])], tNum: Long,
                    tDen: Long, dims: Int = 2)
      : Map[String, (Long, Long, Long, Long, Boolean)] =
    EmbeddingDrift.centroidAlignment(rows.toDF("g", "v"), "g", "v",
        dims, tNum, tDen)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("hand-checked 2-d case: quantized sums, dot, norms, verdict") {
    // a: (1,0)+(1,0) → gs=(2048,0); b: (0,1) → gs=(0,1024)
    // global gv = (2048, 1024)
    val got = align(Seq(
      "a" -> Seq(1.0f, 0.0f), "a" -> Seq(1.0f, 0.0f),
      "b" -> Seq(0.0f, 1.0f)), tNum = 8, tDen = 10)
    // a: dot = 2048*2048 = 4194304; na2 = 2048^2; nb2 = 2048^2+1024^2
    assert(got("a") == ((2L, 4194304L, 4194304L, 5242880L,
      // cos = 2048/sqrt(5242880/1024^2 ... ) — check by cross-mult:
      // dot^2*100 = 4194304^2*100 ; na2*nb2*64 → cos^2 = 4/5 = 0.8;
      // 0.8 >= 0.64 → aligned at t=0.8? cos = sqrt(0.8) ≈ 0.894 ≥ 0.8 ✓
      true)))
    // b: dot = 1024*1024; na2 = 1024^2; nb2 same; cos^2 = 1/5 → cos ≈ .447
    assert(got("b") == ((1L, 1048576L, 1048576L, 5242880L, false)))
  }

  test("opposite direction fails on the sign guard, not magnitude") {
    // group pointing AWAY from the global centroid: dot < 0 → never
    // aligned even at threshold 0
    val got = align(Seq(
      "pos" -> Seq(1.0f, 0.0f), "pos" -> Seq(1.0f, 0.0f),
      "pos" -> Seq(1.0f, 0.0f),
      "neg" -> Seq(-1.0f, 0.0f)), tNum = 0, tDen = 1)
    assert(got("neg")._5 == false)
    assert(got("pos")._5 == true)
  }

  test("quantization is floor, exactly (negative coordinates too)") {
    // -0.5 * 1024 = -512 exactly; 0.3*1024 = 307.2 → 307; -0.3 → -308
    val got = align(Seq("a" -> Seq(0.3f, -0.3f)), 0, 1)
    val (_, dot, na2, _, _) = got("a")
    // quantized vector: floor(0.3f*1024) with float->double widening
    val q0 = math.floor(0.3f.toDouble * 1024).toLong
    val q1 = math.floor(-0.3f.toDouble * 1024).toLong
    assert(na2 == q0 * q0 + q1 * q1)
    assert(dot == na2) // single group: global == group
  }
}
