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
}
