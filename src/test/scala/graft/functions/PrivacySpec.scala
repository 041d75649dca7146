package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("generalizeBand floors to the band lower bound, negatives toward -inf") {
    val out = Seq(0L, 7L, 10L, 19L, -1L, -10L, -11L).toDF("v")
      .select(Privacy.generalizeBand($"v", 10).as("b")).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 10L, 10L, -10L, -10L, -20L))
  }

  val df = Seq(
    ("10001", "m", "alice"), ("10001", "m", "bob"), ("10001", "m", "carol"),
    ("10002", "f", "dan"), // singleton group: must suppress
    ("10003", null, "eve"), ("10003", null, "fred") // null quasi group of 2
  ).toDF("zip", "sex", "payload")

  test("kAnonymizeSuppress stars under-k groups and keeps others verbatim") {
    val out = Privacy.kAnonymizeSuppress(df, Seq("zip", "sex"), k = 2)
      .orderBy("payload").as[(String, String, String)].collect().toSeq
    assert(out == Seq(
      ("10001", "m", "alice"), ("10001", "m", "bob"), ("10001", "m", "carol"),
      ("*", "*", "dan"),
      ("10003", null, "eve"), ("10003", null, "fred")))
  }

  test("suppression preserves row count and non-quasi columns") {
    val out = Privacy.kAnonymizeSuppress(df, Seq("zip", "sex"), k = 4)
    assert(out.count() == 6)
    assert(out.select("payload").as[String].collect().sorted.toSeq ==
      Seq("alice", "bob", "carol", "dan", "eve", "fred"))
    // k=4: every group is under k — everything suppresses
    assert(out.filter($"zip" === "*" && $"sex" === "*").count() == 6)
  }

  test("audit: suppressed release has zero violations; raw release flags them") {
    val released = Privacy.kAnonymizeSuppress(df, Seq("zip", "sex"), k = 2)
    assert(Privacy.kAnonymityAudit(released, Seq("zip", "sex"), k = 2)
      .filter($"violating").count() == 0)
    val rawViolations = Privacy.kAnonymityAudit(df, Seq("zip", "sex"), k = 2)
      .filter($"violating").select("zip").as[String].collect().toSeq
    assert(rawViolations == Seq("10002"))
  }
}
