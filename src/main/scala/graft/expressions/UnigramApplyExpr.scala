package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization of a single word: the
  * VITERBI segmentation maximizing the total score of the chosen
  * vocabulary tokens — the third tokenizer family next to
  * [[BpeApplyExpr]] (merge rules) and [[WordPieceApplyExpr]] (greedy
  * longest match). Unlike greedy matching, the DP considers every
  * segmentation: two short high-score tokens can beat one long one.
  *
  * Determinism contract (what makes the whole DP oracle-restatable):
  *  - scores are exact integers (scaled log-probs); path sums are exact;
  *  - forward pass: `dp[p] = max over tokens t ending at p of
  *    dp[p - |t|] + score(t)` — pure integer max, order-free;
  *  - backtrack: at each position take the LONGEST token consistent with
  *    the optimal value (`dp[p-|t|] + score(t) == dp[p]`), so equal-score
  *    segmentations resolve identically in any engine (two distinct
  *    tokens cannot share both end position and length);
  *  - a word with no full segmentation, or beyond `maxWordChars`
  *    CODEPOINTS, becomes the single `unk` token.
  *
  * The vocabulary rides as one codegen reference object (hash map +
  * the max token length bounding the inner scan); per-row cost is
  * O(word length × max token length), vocabulary-size-independent.
  */
case class UnigramApplyExpr(child: Expression, vocab: Seq[(String, Long)],
                            unk: String, maxWordChars: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_apply requires a string word, got ${other.catalogString}")
    }

  private lazy val table: UnigramApplyExpr.Table =
    UnigramApplyExpr.buildTable(vocab, unk, maxWordChars)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UnigramApplyExpr.tokenize(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramVocab", table,
      classOf[UnigramApplyExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.UnigramApplyExpr.tokenize($v.toString(), $tableRef));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramApplyExpr =
    copy(child = newChild)

  override def prettyName: String = "unigram_apply"
}

object UnigramApplyExpr {

  final class Table(val vocab: java.util.HashMap[String, java.lang.Long],
                    val unk: String, val maxWordChars: Int,
                    val maxTokLen: Int)
      extends Serializable

  def buildTable(vocab: Seq[(String, Long)], unk: String,
                 maxWordChars: Int): Table = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (t, s) =>
      require(t.nonEmpty, "unigram: empty vocabulary token")
      val prev = m.put(t, s)
      require(prev == null || prev.longValue() == s,
        s"unigram: token '$t' declared with two scores")
    }
    new Table(m, unk, maxWordChars,
      vocab.iterator.map(_._1.length).foldLeft(1)(math.max))
  }

  private val Neg = Long.MinValue

  /** Viterbi forward pass + longest-consistent-token backtrack. */
  def tokenize(word: String, t: Table): String = {
    val len = word.length
    if (len == 0 || word.codePointCount(0, len) > t.maxWordChars)
      return "|" + t.unk
    val dp = new Array[Long](len + 1)
    java.util.Arrays.fill(dp, Neg)
    dp(0) = 0L
    var p = 1
    while (p <= len) {
      var l = math.min(t.maxTokLen, p)
      var best = Neg
      while (l >= 1) {
        val q = p - l
        if (dp(q) != Neg) {
          val sc = t.vocab.get(word.substring(q, p))
          if (sc != null && dp(q) + sc.longValue() > best)
            best = dp(q) + sc.longValue()
        }
        l -= 1
      }
      dp(p) = best
      p += 1
    }
    if (dp(len) == Neg) return "|" + t.unk
    val parts = new Array[String](len)
    var n = 0
    var pos = len
    while (pos > 0) {
      var l = math.min(t.maxTokLen, pos)
      var chosen = 0
      while (chosen == 0) { // dp(pos) reachable => a consistent token exists
        val q = pos - l
        val sc = t.vocab.get(word.substring(q, pos))
        if (sc != null && dp(q) != Neg && dp(q) + sc.longValue() == dp(pos))
          chosen = l
        else l -= 1
      }
      parts(n) = word.substring(pos - chosen, pos)
      n += 1
      pos -= chosen
    }
    val out = new java.lang.StringBuilder(len + 8)
    var i = n - 1
    while (i >= 0) { out.append('|').append(parts(i)); i -= 1 }
    out.toString
  }
}
