package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content-defined chunking: boundary re-alignment, span exactness,
  * short-doc and hash invariants. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)], w: Int = 4,
                       m: Int = 8) =
    Chunking.contentDefinedChunks(rows.toDF("id", "t"), "id", "t", w, m)

  test("chunks tile the document exactly: contiguous, full-cover, " +
      "hashes match the substring hash") {
    val text = "the quick brown fox jumps over the lazy dog and runs on"
    val got = chunksOf(Seq((1L, text)))
      .orderBy($"chunk_idx")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.head._3 == 1L) // starts at 1
    assert(got.map(_._4).sum == text.length) // full cover
    // contiguity: each start = previous start + previous len
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._4)
      case _ =>
    }
    // every chunk hash is hash60 of its substring
    val rebuilt = got.map { case (_, _, s, l, h) =>
      graft.expressions.Hash60Expr.hash60(
        text.substring(s.toInt - 1, s.toInt - 1 + l.toInt)
          .getBytes("UTF-8")) == h
    }
    assert(rebuilt.forall(identity))
  }

  test("content anchoring: a prefix edit leaves downstream chunk hashes " +
      "intact once boundaries re-align") {
    val base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk"
    val edited = "XY" + base
    val h1 = chunksOf(Seq((1L, base))).select("chunk_hash")
      .as[Long].collect().toSet
    val h2 = chunksOf(Seq((1L, edited))).select("chunk_hash")
      .as[Long].collect().toSet
    // the shared suffix must contribute shared chunk hashes
    assert((h1 intersect h2).nonEmpty)
  }

  test("a doc shorter than w is one whole-doc chunk; empty docs vanish") {
    val got = chunksOf(Seq((1L, "ab"), (2L, "")))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(1L))
    assert(got.length == 1 && got.head._4 == 2L)
  }

  test("chunkDedupReport counts distinct hashes per group") {
    val chunks = Seq((1L, "g1", 10L), (2L, "g1", 10L), (3L, "g1", 11L),
      (4L, "g2", 12L)).toDF("id", "g", "chunk_hash")
    val got = Chunking.chunkDedupReport(chunks, "g")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("g1", 3L, 2L, 333333L), ("g2", 1L, 1L, 0L)))
  }
}
