package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Null/degenerate-input sweep for the round-8 operators: corpus tables at
  * 100 TB always contain null texts, empty docs, and ragged rows — every
  * report must keep (or deliberately drop) them without throwing, and the
  * choice is pinned here. */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    (1L, Some("normal document text here with several tokens")),
    (2L, None),                    // null text
    (3L, Some("")),                // empty text
    (4L, Some("   ")),             // whitespace only
    (5L, Some("single")))
    .toDF("doc_id", "text")
    .select($"doc_id", $"text".as("text"))

  test("winnowReport keeps every id, zero fingerprints for degenerate rows") {
    val got = SpanDedup.winnowReport(dirty, "doc_id", "text", n = 3, w = 2)
      .select($"doc_id", $"n_fps").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(2L) == 0L && got(3L) == 0L && got(4L) == 0L && got(5L) == 0L)
    assert(got(1L) > 0L)
  }

  test("bigramSurprisalReport keeps every id, zero pairs for degenerate rows") {
    val got = LangModel.bigramSurprisalReport(dirty, "doc_id", "text")
      .select($"doc_id", $"n_pairs").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(2L) == 0L && got(3L) == 0L && got(5L) == 0L)
  }

  test("lengthOutlierReport tolerates a null length (row drops from stats)") {
    val d = Seq((1L, "g", Some(10L)), (2L, "g", Some(12L)),
      (3L, "g", None)).toDF("doc_id", "source", "len")
    val out = CorpusStats.lengthOutlierReport(d, "doc_id", "source", "len")
      .select($"doc_id", $"keep").as[(Long, Option[Boolean])].collect().toMap
    // percentile ignores nulls; the null row's dev is null → keep is null
    // → surfaces as a row but never as keep=true
    assert(out(1L).contains(true) && out(2L).contains(true))
    assert(out(3L).isEmpty)
  }

  test("snapshot diff treats a null compare column as a fingerprint value") {
    import graft.operators.SnapshotDiff
    val o = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val n = Seq((1L, Option("a")), (2L, Option("b"))).toDF("id", "text")
    val got = SnapshotDiff.diff(o, n, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "unchanged")
    assert(got(2L) == "changed") // null → "" fingerprint ≠ md5("b")
  }

  test("sequence packing drops null-weight rows instead of throwing") {
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("key", "w")
    val packed = Sharding.packSequences(d, "key", "w", capacity = 10)
    assert(packed.select("key").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("sparse retrieval on an empty query returns no rows") {
    val d = Seq((1L, "alpha beta")).toDF("id", "text")
    assert(TermStats.sparseTopK(d, "id", "text", "   ", 5).count() == 0L)
  }
}
