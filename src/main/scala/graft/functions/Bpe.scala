package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the merge
  * table every LLM data pipeline ships next to its corpus, learned with
  * the classic Sennrich formulation: work over the WORD VOCABULARY with
  * frequencies, not the corpus, so after one corpus-sized word count
  * every iteration touches a vocabulary-sized frame (at 100 TB the
  * corpus is scanned once; the N merge iterations run over millions of
  * distinct words, each a map-side-combinable pair count plus a narrow
  * projection).
  *
  * Determinism (the oracle gate): pair counts are exact integer sums;
  * the winning pair is argmax by (count DESC, left ASC, right ASC); and
  * merge APPLICATION is a left fold over the word's token sequence —
  * merge whenever the previously-emitted token equals `left` and the
  * current equals `right` (greedy leftmost; a freshly merged token can
  * never re-match as `left` because `left+right` ≠ `left`). The fold is
  * a plain string recurrence over a `|`-delimited token string, so
  * DuckDB restates it verbatim with `list_reduce` and the whole
  * training loop unrolls as SQL — every iteration of the gated table is
  * engine-checked, not just the final state.
  *
  * Representation: a word's token state is `'|' + tokens.mkString("|")`
  * (no trailing separator — the fold's natural output). Tokens are the
  * word's characters initially, merged substrings afterwards; words
  * containing `'|'` must be filtered upstream ([[wordCounts]] does).
  *
  * Driver materialization: ONE row per iteration (the winning pair) —
  * the [[Similarity]] Lloyd-training discipline. State is
  * `localCheckpoint`ed per iteration so lineage stays linear in N.
  */
object Bpe {

  /** Token list of a delimited token string. */
  private def toks(s: Column): Column =
    filter(split(s, "\\|"), x => x =!= "")

  /** Initial token state of a word: its characters, delimited. */
  def delimit(word: Column): Column =
    concat(lit("|"), concat_ws("|", split(word, "")))

  /** The word-frequency table BPE trains on: `(word, s, freq)` with `s`
    * the delimited character state — the raw word rides along so a
    * tokenize pass shares ONE corpus aggregation (and one definition of
    * the word-extraction rule) with training. Lower-cased whitespace
    * tokenization; words containing the `|` separator are dropped (they
    * would corrupt the delimited state). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains("|"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), delimit(col("word")).as("s"), col("freq"))

  /** Apply ONE merge (left, right) to a delimited token string: the
    * greedy-leftmost fold (see class doc). */
  def applyMerge(s: Column, left: Column, right: Column): Column =
    aggregate(toks(s), lit(""),
      (acc, x) =>
        when(x === right && acc.endsWith(concat(lit("|"), left)),
          concat(acc, x))
        .otherwise(concat(acc, lit("|"), x)))

  /** Apply a whole merge TABLE in rank order (tokenize with a trained
    * tokenizer). Delegates to the native
    * [[graft.expressions.BpeApplyExpr]] kernel: the table rides as ONE
    * reference object inside whole-stage codegen, so a
    * thousands-of-merges production tokenizer is one expression — the
    * nested-[[applyMerge]] formulation (kept as [[applyMergesFolded]]
    * for the equality pin) overflows the analyzer past a few hundred
    * layers. */
  def applyMerges(s: Column, merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) s
    else org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.BpeApplyExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(s), merges))

  /** The built-ins-only nested-fold formulation of [[applyMerges]] —
    * the chain the DuckDB oracles restate; kept as the native kernel's
    * equality pin (spec-fuzzed identical at every reachable depth). */
  def applyMergesFolded(s: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(s) { case (acc, (a, b)) =>
      applyMerge(acc, lit(a), lit(b))
    }

  /** All adjacent token pairs of each word (overlapping positions
    * count), weighted by word frequency. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val t = toks(col("s"))
    words.select(col("freq"),
        explode(filter(
          zip_with(t, slice(t, lit(2), greatest(size(t), lit(1))),
            (a, b) => struct(a.as("a"), b.as("b"))),
          p => p("b").isNotNull)).as("p"))
      .groupBy(col("p.a").as("left"), col("p.b").as("right"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Learn `numMerges` merges from a `(s, freq)` word table (see
    * [[wordCounts]]). Returns the merge table
    * `(rank, left, right, merged, pair_count)` — fewer rows if the
    * vocabulary runs out of adjacent pairs first. */
  def train(words0: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "train: need at least one merge")
    val spark = words0.sparkSession
    var words = words0.select(col("s"), col("freq")).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (i <- 1 to numMerges if !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((i, a, b, a + b, n))
        words = words
          .withColumn("s", applyMerge(col("s"), lit(a), lit(b)))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
      .withColumn("rank", col("rank").cast("long"))
  }
}
