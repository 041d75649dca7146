package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a whole BPE merge TABLE (rank order) to a `|`-delimited token
  * string in ONE expression — the scale path of
  * [[graft.functions.Bpe.applyMerges]]: the column-expression fold builds
  * one nested `aggregate` layer per merge, which overflows the analyzer
  * stack somewhere past a few hundred merges, while real trained
  * tokenizers carry thousands. Here the table rides as a single
  * reference object and the per-row work is a tight loop: for each merge
  * `(left, right)` in rank order, one greedy-leftmost pass over the
  * token buffer (merge when the previously kept token equals `left` and
  * the current equals `right`; a freshly merged token can never re-match
  * as `left` because `left+right ≠ left` — the exact
  * [[graft.functions.Bpe]] fold semantics, spec-pinned equal at every
  * depth the fold can reach).
  *
  * Codegen emits a call to the static kernel with the table as a
  * reference object, so the expression stays inside whole-stage codegen.
  * Null input → null.
  */
case class BpeApplyExpr(child: Expression,
                        merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply requires a delimited token string, got ${other.catalogString}")
    }

  private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeApplyExpr.applyAll(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table,
      "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.BpeApplyExpr.applyAll($v.toString(), $tableRef));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

object BpeApplyExpr {

  /** The greedy-leftmost fold for every merge in rank order. */
  def applyAll(s: String, merges: Array[Array[String]]): String = {
    var toks = s.split("\\|").filter(_.nonEmpty)
    var i = 0
    while (i < merges.length && toks.length > 1) {
      val a = merges(i)(0)
      val b = merges(i)(1)
      val out = new Array[String](toks.length)
      var n = 0
      var j = 0
      while (j < toks.length) {
        val t = toks(j)
        if (n > 0 && t == b && out(n - 1) == a) out(n - 1) = a + b
        else { out(n) = t; n += 1 }
        j += 1
      }
      toks = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      i += 1
    }
    if (toks.isEmpty) "" else toks.mkString("|", "|", "")
  }
}
