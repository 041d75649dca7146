package graft.operators

import graft.SparkSpec

/** FD + RI profiling audits: exact violation accounting, SQL-standard
  * null semantics. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("fdAudit counts fanning lhs and surplus rhs separately") {
    // a->1 only (holds); b->{1,2}; c->{1,2,3}: 2 violating lhs, 1+2 extra
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 2),
      ("c", 1), ("c", 2), ("c", 3)).toDF("l", "r")
    val got = Profiling.fdAudit(df, Seq("l" -> "r"))
      .as[(String, String, Long, Long, Long, Boolean)].collect().head
    assert(got == (("l", "r", 3L, 2L, 3L, false)))
  }

  test("fdAudit: null rhs never violates; null lhs is a group") {
    val df = Seq((Some("a"), Option(1)), (Some("a"), Option.empty[Int]),
      (Option.empty[String], Option(7))).toDF("l", "r")
    val got = Profiling.fdAudit(df, Seq("l" -> "r"))
      .as[(String, String, Long, Long, Long, Boolean)].collect().head
    // groups: a -> {1, null} = 1 distinct; null -> {7}
    assert(got._3 == 2L && got._6)
  }

  test("riAudit counts orphans; null child keys are legal") {
    val child = Seq(Option(1L), Option(2L), Option(9L),
      Option.empty[Long]).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profiling.riAudit(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(got == (("c->p", 3L, 1L, false)))
  }

  test("riAudit intact relationship reports zero orphans") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Profiling.riAudit(child, "fk", parent, "pk", "ok")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(got == (("ok", 3L, 0L, true)))
  }
}
