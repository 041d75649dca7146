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

  test("tClosenessAudit: exact rational TVD — mirrored group is 0, skewed " +
      "group carries the hand-computed numerator, star group exempt") {
    // global: flu 4, cold 4 (N=8). zip A mirrors it exactly; zip B is
    // all-flu (the skew l-diversity would pass at l=1... and at l=2 via
    // a 3:1 mix it still leaks); star group skewed but exempt.
    val rel = Seq(
      ("A", "flu"), ("A", "flu"), ("A", "cold"), ("A", "cold"),
      ("B", "flu"), ("B", "flu"),
      ("*", "cold"), ("*", "cold")
    ).toDF("zip", "disease")
    val rows = Privacy.tClosenessAudit(rel, Seq("zip"), "disease",
        tNum = 1, tDen = 4).orderBy("zip")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // B (n_g=2): |n_flu*N - N_flu*n_g| = |2*8-4*2| = 8; cold term
    // |0*8-4*2| = 8 → tvd_num 16, tvd_den 2*2*8=32 → TVD 1/2 > 1/4
    // * (n_g=2): same skew arithmetic, exempt anyway
    // A (n_g=4): |2*8-4*4| = 0 both → TVD 0
    assert(rows == Seq(
      ("*", 2L, 16L, 32L, false),
      ("A", 4L, 0L, 64L, false),
      ("B", 2L, 16L, 32L, true)))
  }

  test("tClosenessAudit keeps NULL-quasi groups (null-unsafe joins would " +
      "silently drop the most-violating group)") {
    val rel = Seq(
      (Some("A"), "flu"), (Some("A"), "cold"),
      (None, "flu"), (None, "flu") // null zip, 100% flu: maximal skew
    ).toDF("zip", "disease")
    val rows = Privacy.tClosenessAudit(rel, Seq("zip"), "disease",
        tNum = 1, tDen = 4).orderBy(asc_nulls_first("zip"))
      .as[(Option[String], Long, Long, Long, Boolean)].collect().toSeq
    // global flu 3, cold 1 (N=4). null group (n_g=2): |2*4-3*2|+|0*4-1*2|
    // = 2+2 = 4... flu term |8-6|=2, cold |0-2|=2 → 4/16 = 1/4, not > 1/4
    // → make it violate: check exact numbers instead
    assert(rows == Seq(
      (None, 2L, 4L, 16L, false),      // TVD exactly 1/4: not strict >
      (Some("A"), 2L, 4L, 16L, false)))
    // and with a tighter t the null group DOES flag
    val tight = Privacy.tClosenessAudit(rel, Seq("zip"), "disease",
        tNum = 1, tDen = 5).orderBy(asc_nulls_first("zip"))
      .as[(Option[String], Long, Long, Long, Boolean)].collect().toSeq
    assert(tight.map(_._5) == Seq(true, true))
  }

  test("tClosenessAudit matches a naive driver computation on random data, " +
      "including values absent from a group and null sensitives") {
    val rnd = new scala.util.Random(61)
    val vals = Array("a", "b", "c", "d", null)
    val data = (1 to 400).map(_ =>
      (s"z${rnd.nextInt(6)}", vals(rnd.nextInt(vals.length))))
    val got = Privacy.tClosenessAudit(data.toDF("zip", "disease"),
        Seq("zip"), "disease", tNum = 1, tDen = 10)
      .orderBy("zip")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val n = data.size.toLong
    val globalC = data.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val want = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (z, rows) =>
      val ng = rows.size.toLong
      val gc = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val num = globalC.map { case (s, ns) =>
        math.abs(gc.getOrElse(s, 0L) * n - ns * ng)
      }.sum
      (z, ng, num, 2 * ng * n, num * 10 > 2 * ng * n)
    }
    assert(got == want)
  }
}
