package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused span hashing for substring-level dedup: array<string> tokens →
  * ordered array of `xxhash64(space-joined n-token window)`, stride 1, one
  * hash PER POSITION (duplicates preserved — unlike [[WordShingleHashExpr]],
  * which sorts and dedupes for MinHash set semantics). Documents shorter
  * than n tokens yield an empty array, matching
  * `graft.functions.SpanDedup.spanHashes`' guard.
  *
  * This is the production fast path of the span-dedup report: the portable
  * md5 formulation pays an md5 + hex decode per window so a DuckDB oracle
  * can restate it; this kernel builds each window with one byte-level
  * `UTF8String.concatWs` and one xxhash64. Same-corpus keep/drop decisions
  * are pinned equal to the portable path by SpanHashExprSpec (both hashes
  * are collision-free at corpus scale — 64 vs 60 bits).
  *
  * Contract: token arrays must not contain nulls (`TextAnalysis.tokens`
  * never produces them).
  */
case class SpanHashExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hash requires array<string>, got ${other.simpleString(40)}")
    }

  override def nullSafeEval(input: Any): Any =
    SpanHashExpr.spansOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.expressions.SpanHashExpr.spansOf($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): SpanHashExpr =
    copy(child = newChild)

  override def prettyName: String = "span_hash"
}

object SpanHashExpr {

  private val SPACE = UTF8String.fromString(" ")

  /** One-pass kernel: hash every n-token window in position order. */
  def spansOf(toks: ArrayData, n: Int): GenericArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Long](0))
    val words = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { words(i) = toks.getUTF8String(i); i += 1 }
    val count = cnt - n + 1
    val hashes = new Array[Long](count)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < count) {
      System.arraycopy(words, i, window, 0, n)
      val gram = UTF8String.concatWs(SPACE, window: _*)
      hashes(i) = XxHash64Function.hash(gram, StringType, 42L)
      i += 1
    }
    new GenericArrayData(hashes)
  }

  /** Column entry point: ordered per-position hashed n-token windows. */
  def spanHashes(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SpanHashExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))
}
