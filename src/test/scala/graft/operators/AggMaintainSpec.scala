package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame) =
    df.orderBy("k")
      .as[(String, Long, Option[BigDecimal], Option[Double], Option[Double])]
      .collect().toSeq

  val base = Seq(("a", Some(1.0)), ("a", Some(2.5)), ("b", Some(10.0)),
    ("c", None)).toDF("k", "v")
  val delta = Seq(("a", Some(4.0)), ("c", Some(7.0)), ("d", Some(-1.0)),
    ("e", None)).toDF("k", "v")

  test("maintain(state(base), delta) equals state(base union delta) exactly") {
    val maintained = AggMaintain.maintain(
      AggMaintain.state(base, "k", "v"), delta, "k", "v")
    val recomputed = AggMaintain.state(base.unionByName(delta), "k", "v")
    assert(canon(maintained) == canon(recomputed))
  }

  test("keys only in delta and keys only in base both survive") {
    val out = canon(AggMaintain.maintain(
      AggMaintain.state(base, "k", "v"), delta, "k", "v")).map(r => r._1 -> r)
      .toMap
    assert(out("b") == (("b", 1L, Some(BigDecimal("10.00")), Some(10.0), Some(10.0))))
    assert(out("d") == (("d", 1L, Some(BigDecimal("-1.00")), Some(-1.0), Some(-1.0))))
  }

  test("all-null keys keep null sum/min/max but count rows") {
    val out = canon(AggMaintain.maintain(
      AggMaintain.state(base, "k", "v"), delta, "k", "v")).map(r => r._1 -> r)
      .toMap
    // c: null in base, 7.0 in delta — sum is 7, cnt is 2
    assert(out("c") == (("c", 2L, Some(BigDecimal("7.00")), Some(7.0), Some(7.0))))
    // e: only ever null — sum/min/max stay null, cnt counts the row
    assert(out("e") == (("e", 1L, None, None, None)))
  }

  test("folding many deltas one at a time matches one-shot recompute") {
    val deltas = (1 to 5).map(i =>
      Seq(("a", Some(i * 0.1)), (s"k$i", Some(i.toDouble))).toDF("k", "v"))
    val folded = deltas.foldLeft(AggMaintain.state(base, "k", "v")) {
      (st, d) => AggMaintain.maintain(st, d, "k", "v")
    }
    val all = deltas.foldLeft(base)(_ unionByName _)
    assert(canon(folded) == canon(AggMaintain.state(all, "k", "v")))
  }

  private def regsOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"hll_regs").as[(String, Seq[Int])]
      .collect().toMap

  test("maintained HLL registers are bit-identical to the one-shot " +
      "recompute, under any batching") {
    val vals = (1 to 400).map(i => (s"g${i % 3}", s"v${i % 97}"))
    val full = vals.toDF("k", "v")
    val oneShot = regsOf(AggMaintain.distinctState(full, "k", "v", p = 4))
    // three different batchings of the same rows
    for (nBatches <- Seq(2, 5, 8)) {
      val parts = vals.grouped(math.ceil(400.0 / nBatches).toInt).toSeq
      val folded = parts.tail.foldLeft(
          AggMaintain.distinctState(parts.head.toDF("k", "v"), "k", "v", 4)) {
        (st, b) => AggMaintain.maintainDistinct(st, b.toDF("k", "v"), "k", "v", 4)
      }
      assert(regsOf(folded) == oneShot, s"nBatches=$nBatches")
    }
  }

  test("register maintenance is idempotent: re-delivering a batch " +
      "changes nothing; new keys appear on either side") {
    val b0 = Seq(("a", "x"), ("a", "y")).toDF("k", "v")
    val d1 = Seq(("a", "y"), ("b", "z")).toDF("k", "v")
    val st1 = AggMaintain.maintainDistinct(
      AggMaintain.distinctState(b0, "k", "v", 4), d1, "k", "v", 4)
    val st2 = AggMaintain.maintainDistinct(st1, d1, "k", "v", 4) // replay
    assert(regsOf(st1) == regsOf(st2))
    assert(regsOf(st1).keySet == Set("a", "b"))
    assert(regsOf(st1) ==
      regsOf(AggMaintain.distinctState(b0.unionByName(d1), "k", "v", 4)))
  }

  test("quantile-sketch maintenance equals the one-shot sketch, " +
      "SATURATED: batch-dropped values resurface when the union keeps them") {
    // capacity 3; 6 distinct values per key, split so each batch holds
    // values the OTHER batch lacks — a batch-local trim that forgets a
    // dropped value's weight cannot reproduce the one-shot entries
    val b0 = Seq(("k", 10L), ("k", 10L), ("k", 20L), ("k", 30L),
      ("k", 40L)).toDF("g", "v")
    val d1 = Seq(("k", 10L), ("k", 50L), ("k", 60L), ("k", 20L))
      .toDF("g", "v")
    def entries(st: org.apache.spark.sql.DataFrame) =
      st.select($"g", explode($"q_sketch").as("e"))
        .select($"g", $"e.value", $"e.count")
        .as[(String, Long, Long)].collect().toSet
    val maintained = AggMaintain.maintainQuantiles(
      AggMaintain.quantileState(b0, "g", "v", 3), d1, "g", "v", 3)
    val oneShot = AggMaintain.quantileState(
      b0.unionByName(d1), "g", "v", 3)
    assert(entries(maintained) == entries(oneShot))
    // weights in the surviving entries are FULL-table counts
    val m = entries(maintained).map(t => t._2 -> t._3).toMap
    val truth = (b0.unionByName(d1)).groupBy($"v").count()
      .as[(Long, Long)].collect().toMap
    m.foreach { case (v, c) => assert(truth(v) == c, s"value $v") }
  }

  test("quantile maintenance: quantiles read identically off the " +
      "maintained state") {
    val b0 = (1 to 40).map(i => ("k", i.toLong)).toDF("g", "v")
    val d1 = (41 to 100).map(i => ("k", i.toLong)).toDF("g", "v")
    val st = AggMaintain.maintainQuantiles(
      AggMaintain.quantileState(b0, "g", "v", 256), d1, "g", "v", 256)
      .withColumn("_t", aggregate($"q_sketch", lit(0L),
        (acc, e) => acc + e.getField("count")))
    val p50 = st.select(graft.functions.Sketches
      .sketchQuantile($"q_sketch", $"_t", 0.5)).as[Long].head()
    assert(p50 == 50L) // unsaturated: exact
  }

  test("register estimate recovers small exact cardinalities") {
    // p=8 (m=256): linear counting regime is exact-ish for tiny sets
    val df = (1 to 50).map(i => ("k", s"val$i")).toDF("k", "v")
    val est = AggMaintain.distinctState(df, "k", "v", p = 8)
      .select(graft.functions.Sketches.hllEstimate($"hll_regs", 8))
      .as[Double].head()
    assert(math.abs(est - 50.0) < 5.0, s"est=$est")
  }
}
