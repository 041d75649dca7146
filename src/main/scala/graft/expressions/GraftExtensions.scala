package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering this engine's native expressions
  * for SQL use:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: spark.sql.extensions=graft.expressions.GraftExtensions
  *   spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  *   spark.sql("SELECT minhash_sig(hashed_shingles(text, 5), 64) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Every native expression, by SQL name. Integer parameters arrive as
    * foldable literals (`minhash_sig(hs, 64)`). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64Expr(exprs.head)),
    "minhash_sig" -> (exprs =>
      MinHashSigExpr(exprs.head, intArg(exprs, 1, "minhash_sig"))),
    "hashed_shingles" -> (exprs =>
      HashedShinglesExpr(exprs.head, intArg(exprs, 1, "hashed_shingles"))),
    "word_shingle_hash" -> (exprs =>
      WordShingleHashExpr(exprs.head, intArg(exprs, 1, "word_shingle_hash"))),
    "span_hash" -> (exprs =>
      SpanHashExpr(exprs.head, intArg(exprs, 1, "span_hash"))),
    "jaccard_sorted" -> (exprs => JaccardSortedExpr(exprs(0), exprs(1))),
    "kmv_sketch" -> (exprs =>
      KmvSketchAgg(exprs.head, intArg(exprs, 1, "kmv_sketch"))
        .toAggregateExpression()),
    "kmv_merge" -> (exprs =>
      KmvMergeAgg(exprs.head, intArg(exprs, 1, "kmv_merge"))
        .toAggregateExpression()),
    "top_k" -> (exprs =>
      TopKAgg(exprs(0), exprs(1), intArg(exprs, 2, "top_k"))
        .toAggregateExpression()),
    "dot_product" -> (exprs => DotProductExpr(exprs(0), exprs(1))),
    "simhash60_portable" -> (exprs => SimHashPortableExpr(exprs.head)),
    "json_leaf_keys" -> (exprs => JsonLeafKeysExpr(exprs.head)),
    // fused one-pass ingest parse: json_keyset_tuple(raw, 'a', 'b', ...)
    // returns struct(_keyset, a, b, ...); the _nested variant keysets on
    // dotted leaf paths (drift-aware nested ingest)
    "json_keyset_tuple" -> (exprs =>
      JsonKeysetTupleExpr(exprs.head,
        exprs.tail.zipWithIndex.map { case (e, i) =>
          strArg(e, i, "json_keyset_tuple") }, nested = false)),
    "jaro_winkler" -> (exprs => JaroWinklerExpr(exprs(0), exprs(1))),
    "json_keyset_tuple_nested" -> (exprs =>
      JsonKeysetTupleExpr(exprs.head,
        exprs.tail.zipWithIndex.map { case (e, i) =>
          strArg(e, i, "json_keyset_tuple_nested") }, nested = true)))

  private def strArg(e: Expression, i: Int, fn: String): String = {
    import org.apache.spark.sql.types.StringType
    if (e.foldable && e.dataType == StringType && e.eval() != null)
      e.eval().toString
    else throw new IllegalArgumentException(
      s"$fn: argument ${i + 2} must be a string literal field name")
  }

  private def intArg(exprs: Seq[Expression], i: Int, fn: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    exprs.lift(i) match {
      case Some(e) if e.foldable &&
          Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType) =>
        e.eval().toString.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal")
    }
  }

  /** Register on an already-built session (e.g. the driver-owned one). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
