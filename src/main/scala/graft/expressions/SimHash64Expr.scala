package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over an array<string> of tokens.
  *
  * Semantics identical to the built-in-expression formulation in
  * `graft.functions.Dedup.simhash64` (bit b of the result = sign of
  * Σ_tokens ±1 by bit b of xxhash64(token, seed=42)), but evaluated in ONE
  * pass over the tokens instead of 64 higher-order-function traversals —
  * the per-row cost drops from O(64·n) interpreted lambda calls to O(n)
  * hash computations plus 64 counter updates, all primitive arithmetic.
  *
  * This is the preference-order case (b) from the build plan: the semantics
  * are expressible with built-ins (and were), but the operator is hot enough
  * in a dedup pipeline that a codegen'd native expression is warranted.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString(100)}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(
      SimHash64Expr.simhashOf(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expressions.SimHash64Expr.simhashOf($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64Expr {

  /** Single-pass simhash kernel (shared by interpreted eval and codegen). */
  def simhashOf(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null tokens vote with the unchanged seed (42L) — exactly what the
      // HOF formulation computes, since Spark's xxhash64 leaves the seed
      // untouched for a null child; kernel and executable spec agree on
      // null-containing token arrays
      val h =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i): UTF8String, StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level entry point (classic-API Column↔Expression bridge). */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64Expr(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
}
