package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization of a single word against a fixed VOCABULARY —
  * greedy longest-match-first (the standard WordPiece/BERT rule): at each
  * position take the LONGEST vocabulary token matching the remaining
  * prefix, where every non-initial match carries the `##` continuation
  * prefix; if any position has no match, or the word exceeds
  * `maxWordChars` codepoints, the whole word becomes the single `unk`
  * token. Output is a `|`-delimited token string (`|play|##ing`), the
  * same representation [[BpeApplyExpr]] speaks. `##` is reserved: a
  * `##`-prefixed vocabulary entry is continuation-only, even for words
  * literally starting with `##` (such a word needs non-`##` tokens to
  * cover its prefix, or it is UNK).
  *
  * The vocabulary rides as ONE codegen reference object (a hash set probed
  * by the tight kernel loop), so a production-sized vocab is a single
  * whole-stage-codegen expression — the per-row cost is bounded by
  * word length × max token length, independent of vocabulary size.
  *
  * Determinism note for the oracle gate: `maxWordChars` counts UNICODE
  * CODEPOINTS (not UTF-16 units) and matches compare exact substrings,
  * so an engine counting codepoints (DuckDB) walks the identical token
  * sequence — a character outside the vocabulary alphabet strands the
  * walk at the same position in both engines.
  */
case class WordPieceApplyExpr(child: Expression, vocab: Seq[String],
                              unk: String, maxWordChars: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_apply requires a string word, got ${other.catalogString}")
    }

  private lazy val table: WordPieceApplyExpr.Table =
    WordPieceApplyExpr.buildTable(vocab, unk, maxWordChars)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      WordPieceApplyExpr.tokenize(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wordpieceVocab", table,
      classOf[WordPieceApplyExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.WordPieceApplyExpr.tokenize($v.toString(), $tableRef));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceApplyExpr =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_apply"
}

object WordPieceApplyExpr {

  /** Prepared vocabulary: the probe set plus the longest raw-match
    * length (UTF-16 units) to bound the backward scan. */
  final class Table(val vocab: java.util.HashSet[String], val unk: String,
                    val maxWordChars: Int, val maxRawLen: Int)
      extends Serializable

  def buildTable(vocab: Seq[String], unk: String, maxWordChars: Int): Table = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    val maxRaw = vocab.iterator
      .map(t => if (t.startsWith("##")) t.length - 2 else t.length)
      .foldLeft(1)(math.max)
    new Table(set, unk, maxWordChars, maxRaw)
  }

  /** The greedy longest-match-first walk (HF WordPiece semantics). */
  def tokenize(word: String, t: Table): String = {
    val len = word.length
    if (len == 0 || word.codePointCount(0, len) > t.maxWordChars)
      return "|" + t.unk
    val out = new java.lang.StringBuilder(len + 8)
    var start = 0
    while (start < len) {
      var e = math.min(len, start + t.maxRawLen)
      var matched: String = null
      while (matched == null && e > start) {
        val probe =
          if (start > 0) "##" + word.substring(start, e)
          else word.substring(start, e)
        // `##` is a RESERVED continuation marker: a `##`-prefixed vocab
        // entry never matches at the initial position even when the word
        // literally starts with `##` (so kernel, spec reference, and the
        // SQL oracle's cont/raw model agree on every input)
        if (t.vocab.contains(probe) &&
            (start > 0 || !probe.startsWith("##"))) matched = probe
        else e -= 1
      }
      if (matched == null) return "|" + t.unk
      out.append('|').append(matched)
      start = e
    }
    out.toString
  }
}
