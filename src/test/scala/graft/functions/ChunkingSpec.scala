package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Token-window chunking (disjoint blocks, sliding overlap, ragged
  * tails, guards) and content-defined chunking (boundary re-alignment,
  * span exactness, short-doc and hash invariants). */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)], w: Int = 4,
                       m: Int = 8) =
    Chunking.contentDefinedChunks(rows.toDF("id", "t"), "id", "t", w, m)

  private def winChunks(text: String, maxTokens: Int, stride: Int) =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("id", "text"),
        "id", "text", maxTokens, stride)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Int, String, Long)].collect().toSeq

  test("disjoint blocks (stride == maxTokens) reconstruct the document") {
    val doc = (1 to 11).map(i => s"t$i").mkString(" ")
    val out = winChunks(doc, 4, 4)
    assert(out.map(_._1) == Seq(0, 1, 2))
    assert(out.map(_._3) == Seq(4L, 4L, 3L)) // ragged tail
    assert(out.map(_._2).mkString(" ") == doc)
  }

  test("sliding windows (stride < maxTokens) overlap by maxTokens - stride") {
    val out = winChunks("a b c d e f g h", 4, 2)
    assert(out.map(_._2) == Seq("a b c d", "c d e f", "e f g h"))
    assert(out.map(_._3) == Seq(4L, 4L, 4L))
  }

  test("last sliding window is ragged, never empty, and covers the tail") {
    val out = winChunks("a b c d e f g", 4, 2)
    // starts 0, 2, 4: ceil((7-4)/2)+1 = 3 chunks; last holds 3 tokens
    assert(out.map(_._2) == Seq("a b c d", "c d e f", "e f g"))
    assert(out.map(_._3) == Seq(4L, 4L, 3L))
  }

  test("short and empty documents in the token-window chunker") {
    assert(winChunks("a b", 4, 4) == Seq((0, "a b", 2L))) // one whole chunk
    assert(winChunks("", 4, 4).isEmpty)                   // no row, not empty row
  }

  test("parameter guards reject a zero or over-long stride") {
    intercept[IllegalArgumentException](Chunking.chunkStructs(col("x"), 4, 0))
    intercept[IllegalArgumentException](Chunking.chunkStructs(col("x"), 4, 5))
  }

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
