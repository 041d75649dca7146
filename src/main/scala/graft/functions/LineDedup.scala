package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level exact deduplication (the "exact substring dedup" pass of
  * training-data curation: boilerplate lines, repeated headers/footers, and
  * licence blocks recur across millions of pages — dedup must act BELOW
  * document granularity).
  *
  * Documents split into fixed-token-width lines; each distinct line keeps
  * exactly its FIRST occurrence corpus-wide (lowest (id, position)), and
  * each document reports its surviving line count plus the reconstructed
  * kept text.
  *
  * Scale shape: one shuffle keyed by line text assigns first-occurrence
  * ranks (line values are near-unique after hashing; the heaviest key is a
  * boilerplate line, bounded by its corpus frequency), and one shuffle
  * keyed by document id reassembles — no join, no all-pairs. The window
  * carries only (line, id, idx) — document text never shuffles whole.
  */
object LineDedup {

  /** Fixed-width token lines over an ALREADY-MATERIALIZED token-array
    * column: ⌈n/lineTokens⌉ lines, the last one ragged. Empty array → empty
    * result. `toks` must be a bound attribute (a real column produced by a
    * prior projection), not an inline tokenization expression: higher-order
    * functions evaluate interpreted and re-evaluate captured expressions
    * once PER LAMBDA ELEMENT, so an inline `tokens(text)` here turns O(m)
    * into O(m²) per document. */
  def linesFromTokens(toks: Column, lineTokens: Int): Column = {
    val nLines = ceil(size(toks).cast("double") / lineTokens).cast("int")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(toks, i * lineTokens + 1, lit(lineTokens)), " ")))
  }

  /** Fixed-width token lines of a text column. Prefer [[linesFromTokens]]
    * over a materialized token column in per-row hot paths (see its note on
    * lambda-capture re-evaluation). */
  def lines(textCol: Column, lineTokens: Int): Column =
    linesFromTokens(TextAnalysis.tokens(textCol), lineTokens)

  /** Per-document line-dedup report: (idCol, n_lines, n_kept, kept_text)
    * where a line is kept iff this document holds its corpus-wide first
    * occurrence (ordered by (id, line index) — fully deterministic).
    * Documents with empty text produce no output row. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 lineTokens: Int = 5): DataFrame = {
    // tokenize into a real column first: the line lambda then slices a
    // bound attribute (O(lineTokens) per element) instead of re-running
    // the regex tokenization per line (the O(m²) trap)
    val exploded = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        posexplode(linesFromTokens(col("_toks"), lineTokens))
          .as(Seq("line_idx", "line")))
    // a window, not a min_by-join: every exploded row needs its keep flag
    // back, so the shuffle-by-line is inherent and the window does it once
    val firstOcc = Window.partitionBy(col("line"))
      .orderBy(col(idCol), col("line_idx"))
    exploded.withColumn("_keep", row_number().over(firstOcc) === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("line_idx"), col("line"))))),
          s => s.getField("line")), " ").as("kept_text"))
  }
}
