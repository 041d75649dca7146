package graft.functions

import org.apache.spark.sql.Column

/** Unigram-LM (SentencePiece-style) tokenizer APPLICATION: Viterbi
  * segmentation against a scored vocabulary — the DP tokenizer next to
  * [[Bpe]] (merge rules) and [[WordPiece]] (greedy longest match).
  * Scores are exact scaled integers so the optimal path value — and,
  * through the longest-consistent-token backtrack rule, the chosen
  * segmentation itself — is engine-portable with no float comparison.
  *
  * Scale shape: identical to [[WordPiece]] — the scored vocabulary is
  * one broadcast-sized reference object inside a codegen'd expression
  * ([[graft.expressions.UnigramApplyExpr]]); per-row cost is word
  * length × longest token, vocabulary-size-independent. */
object Unigram {

  /** Tokenize a word column: the maximum-total-score segmentation as a
    * `|`-delimited token string, or `|[UNK]` when no full segmentation
    * exists or the word exceeds `maxWordChars` codepoints. Equal-score
    * segmentations resolve by taking the longest token at each
    * backtrack position (spec-pinned, oracle-shared). */
  def applyVocab(word: Column, vocab: Seq[(String, Long)],
                 unk: String = "[UNK]", maxWordChars: Int = 100): Column = {
    require(vocab.nonEmpty, "unigram: vocabulary must be non-empty")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UnigramApplyExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(word),
        vocab, unk, maxWordChars))
  }
}
