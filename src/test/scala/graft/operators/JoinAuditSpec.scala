package graft.operators

import graft.SparkSpec

/** Join-cardinality pre-flight: exact per-key contributions without
  * running the join. */
class JoinAuditSpec extends SparkSpec {
  import spark.implicits._

  test("contributions are exact n_left * n_right and totals cover all " +
      "keys, not just the top-k") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 2L, 9L).toDF("k")
    val got = JoinAudit.joinCardinality(left, right, "k", "k", topK = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // key 1: 3*2=6 rows, key 2: 1*1=1; key 3/9 unmatched; total 7
    assert(got == Seq((1L, 3L, 2L, 6L, 7L, 2L, 857142L)))
    val actual = left.join(right, "k").count()
    assert(actual == 7L)
  }

  test("non-numeric keys are audited raw — never cast to null and " +
      "dropped from the report") {
    val left = Seq("a", "a", "b").toDF("k")
    val right = Seq("a", "x").toDF("k")
    val got = JoinAudit.joinCardinality(left, right, "k", "k")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // key "a": 2*1 = 2 rows; "b"/"x" unmatched — a long-cast audit
    // would null every key and report "no explosion"
    assert(got == Seq(("a", 2L, 1L, 2L, 2L, 1L, 1000000L)))
    assert(left.join(right, "k").count() == 2L)
  }

  test("a key missing from one side contributes nothing") {
    val got = JoinAudit.joinCardinality(
        Seq(5L).toDF("k"), Seq(6L).toDF("k"), "k", "k")
      .count()
    assert(got == 0L)
  }
}
