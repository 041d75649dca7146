package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, maxTokens: Int, stride: Int) =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("id", "text"),
        "id", "text", maxTokens, stride)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Int, String, Long)].collect().toSeq

  test("disjoint blocks (stride == maxTokens) reconstruct the document") {
    val doc = (1 to 11).map(i => s"t$i").mkString(" ")
    val out = chunks(doc, 4, 4)
    assert(out.map(_._1) == Seq(0, 1, 2))
    assert(out.map(_._3) == Seq(4L, 4L, 3L)) // ragged tail
    assert(out.map(_._2).mkString(" ") == doc)
  }

  test("sliding windows (stride < maxTokens) overlap by maxTokens - stride") {
    val out = chunks("a b c d e f g h", 4, 2)
    assert(out.map(_._2) ==
      Seq("a b c d", "c d e f", "e f g h"))
    assert(out.map(_._3) == Seq(4L, 4L, 4L))
  }

  test("last sliding window is ragged, never empty, and covers the tail") {
    val out = chunks("a b c d e f g", 4, 2)
    // starts 0, 2, 4: ceil((7-4)/2)+1 = 3 chunks; last holds 3 tokens
    assert(out.map(_._2) == Seq("a b c d", "c d e f", "e f g"))
    assert(out.map(_._3) == Seq(4L, 4L, 3L))
  }

  test("short and empty documents") {
    assert(chunks("a b", 4, 4) == Seq((0, "a b", 2L))) // one whole chunk
    assert(chunks("", 4, 4).isEmpty)                   // no row, not empty row
  }

  test("parameter guards reject a zero or over-long stride") {
    intercept[IllegalArgumentException](Chunking.chunkStructs(col("x"), 4, 0))
    intercept[IllegalArgumentException](Chunking.chunkStructs(col("x"), 4, 5))
  }
}
