package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Hash60ExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused hash60 is bit-exact with the conv/substring/md5 chain") {
    val rows = Seq(Some("alpha"), Some(""), Some("café 你好"), None,
      Some("x" * 500), Some("1"), Some("entity 5"))
    val got = rows.toDF("t")
      .select(
        Hash60Expr.hash60($"t".cast("binary")).as("fused"),
        conv(substring(md5($"t".cast("binary")), 1, 15), 16, 10)
          .cast("long").as("chain"))
      .as[(Option[Long], Option[Long])].collect()
    got.foreach { case (f, c) => assert(f == c, s"$f != $c") }
    assert(got.count(_._1.isEmpty) == 1) // null propagates as null
  }

  test("string input hashes identically to its utf-8 binary cast") {
    val out = Seq("graft", "データ").toDF("t")
      .select(Hash60Expr.hash60($"t") === Hash60Expr.hash60($"t".cast("binary")))
      .as[Boolean].collect()
    assert(out.forall(identity))
  }

  test("values stay inside the non-negative 60-bit space") {
    val hs = spark.range(2000)
      .select(Hash60Expr.hash60($"id".cast("string")).as("h"))
      .as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < (1L << 60)))
    assert(hs.distinct.length == hs.length) // no collisions at this scale
  }

  test("wrong input type is rejected at analysis time") {
    val e = intercept[Exception] {
      spark.range(1).select(Hash60Expr.hash60($"id")).collect()
    }
    assert(e.getMessage.contains("hash60") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
