package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking for pretraining sequence prep: split each
  * document's token stream into fixed-budget windows with a configurable
  * stride (stride == maxTokens → disjoint blocks; stride < maxTokens →
  * sliding overlap, the long-document strategy for models whose context is
  * shorter than the document). The counterpart AFTER chunking is
  * [[Sharding.packShards]], which packs the chunks into training shards.
  *
  * Scale shape: pure per-row work — tokenize once into a bound column, one
  * transform over chunk starts, one posexplode; no shuffle at all. The
  * output multiplies rows ~m/stride× but each row is one chunk wide, and
  * chunks distribute freely across partitions.
  */
object Chunking {

  /** (chunk_text, n_tokens) structs over an ALREADY-MATERIALIZED token
    * array column — the slicing lambda CAPTURES `toks`, and an inline
    * tokenization would re-run per chunk (the O(m²) trap; see
    * [[LineDedup.linesFromTokens]]). Documents with ≤ maxTokens tokens
    * yield one chunk; empty documents none. Every chunk has ≥ 1 token:
    * the last window starts at most (m − 1). */
  def chunkStructs(toks: Column, maxTokens: Int, stride: Int): Column = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride (maxTokens $maxTokens)")
    val m = size(toks)
    val nChunks = when(m <= maxTokens, lit(1))
      .otherwise(ceil((m - maxTokens).cast("double") / stride).cast("int") + 1)
    when(m === 0, array().cast("array<struct<chunk_text:string,n_tokens:int>>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1), i => struct(
        array_join(slice(toks, i * stride + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens), m - i * stride).as("n_tokens"))))
  }

  /** One row per (document, chunk): (idCol, chunk_idx, chunk_text,
    * n_tokens), chunk_idx 0-based in document order. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, stride: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        posexplode(chunkStructs(col("_toks"), maxTokens, stride))
          .as(Seq("chunk_idx", "_c")))
      .select(col(idCol), col("chunk_idx"),
        col("_c")("chunk_text").as("chunk_text"),
        col("_c")("n_tokens").cast("long").as("n_tokens"))
}
