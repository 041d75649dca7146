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

  test("a genuine value equal to the null sentinel is released verbatim, " +
      "never rewritten to null") {
    // the sentinel exists only on the internal join key; released values
    // are the originals — the collision merely groups the value with the
    // null group for COUNTING (both sides of that documented edge pinned)
    val s = Privacy.NullSentinel
    val odd = Seq((s, "w"), (s, "x"), (null.asInstanceOf[String], "y"),
      ("ok", "z")).toDF("q", "payload")
    val out = Privacy.kAnonymizeSuppress(odd, Seq("q"), k = 3)
      .orderBy("payload").as[(String, String)].collect().toSeq
    // sentinel-valued rows + the null row share one count group (3 >= k):
    // released; the genuine sentinel string survives UNCHANGED and the
    // null stays null; the "ok" singleton suppresses
    assert(out == Seq((s, "w"), (s, "x"), (null, "y"), ("*", "z")))
  }

  test("released quasi columns are string-typed; non-string inputs cast") {
    val n = Seq((1000L, 7, "a"), (1000L, 7, "b"), (2000L, 9, "c"))
      .toDF("band", "nation", "payload")
    val out = Privacy.kAnonymizeSuppress(n, Seq("band", "nation"), k = 2)
    assert(out.schema("band").dataType.typeName == "string")
    assert(out.schema("nation").dataType.typeName == "string")
    val got = out.orderBy("payload").as[(String, String, String)]
      .collect().toSeq
    assert(got == Seq(("1000", "7", "a"), ("1000", "7", "b"),
      ("*", "*", "c")))
  }

  test("audits flag null-quasi groups with a real boolean, never SQL " +
      "NULL (a filter(violating) consumer must not drop the leak)") {
    // a released >= k null-quasi group with ONE sensitive value: the
    // exact homogeneity leak; `col(c) === \"*\"` on null is NULL, so an
    // un-coalesced star test would null out `violating` for this row
    val rel = Seq((null.asInstanceOf[String], "flu", "a"),
      (null.asInstanceOf[String], "flu", "b"),
      ("10001", "flu", "c"), ("10001", "cold", "d"))
      .toDF("zip", "disease", "payload")
    val ldiv = Privacy.lDiversityAudit(rel, Seq("zip"), "disease", l = 2)
    assert(ldiv.filter($"violating").count() == 1) // only the null group
    assert(ldiv.filter($"violating".isNull).count() == 0)
    val kan = Privacy.kAnonymityAudit(rel, Seq("zip"), k = 3)
    assert(kan.filter($"violating").count() == 2) // both groups of 2 < 3
    assert(kan.filter($"violating".isNull).count() == 0)
  }

  test("lDiversityAudit: k-anonymous but homogeneous groups violate; " +
      "diverse and suppressed groups pass; null sensitive counts once") {
    val rel = Seq(
      ("10001", "flu", "a"), ("10001", "cold", "b"), ("10001", "flu", "c"),
      ("10002", "hiv", "d"), ("10002", "hiv", "e"), // k=2-fine, l=2-LEAK
      ("*", "flu", "f"), ("*", "flu", "g"),         // suppressed: exempt
      ("10003", null, "h"), ("10003", null, "i")    // null = one value
    ).toDF("zip", "disease", "payload")
    val audit = Privacy.lDiversityAudit(rel, Seq("zip"), "disease", l = 2)
      .orderBy("zip")
    val rows = audit.as[(String, Long, Boolean)].collect().toSeq
    assert(rows == Seq(
      ("*", 1L, false),      // suppressed group exempt even if homogeneous
      ("10001", 2L, false),  // diverse
      ("10002", 1L, true),   // the homogeneity attack
      ("10003", 1L, true)))  // all-null sensitive: one value, violates
  }
}
