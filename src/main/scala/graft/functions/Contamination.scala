package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents that
  * share word-n-gram shingles with a held-out benchmark/eval set (the
  * standard n-gram-overlap decontamination run before pretraining).
  *
  * Scale shape (100 TB corpus, benchmark ≪ corpus): the benchmark's
  * distinct shingle set is tiny (eval suites are at most a few million
  * n-grams) and is BROADCAST — the corpus side never shuffles for the
  * membership probe. The only shuffle is the per-document hit-count
  * aggregation, keyed by the document id (no skew: ids are unique). The
  * shingle explode multiplies rows ~tokens-per-doc×, but each exploded row
  * is (id, hit-flag) wide only — the text never leaves the scan stage.
  */
object Contamination {

  /** Distinct word n-gram shingles over an already-materialized lowercased
    * token-array column. The slicing lambda in wordShingles CAPTURES the
    * token array: pass a bound attribute, not an inline tokenization
    * expression (HOFs re-evaluate captures per element — O(m²)). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(Dedup.wordShingles(toks, n))

  /** Distinct word n-gram shingles of a text column (lowercased). Prefer
    * [[shinglesFromTokens]] over a materialized token column in hot paths. */
  def shingles(textCol: Column, n: Int): Column =
    shinglesFromTokens(TextAnalysis.tokens(lower(textCol)), n)

  /** Per-document benchmark-overlap report: for every corpus document, the
    * number of distinct n-gram shingles, the number shared with `bench`,
    * the contamination fraction, and a contaminated flag.
    *
    * Output: (idCol, n_shingles, n_hits, contam_frac, contaminated),
    * one row per corpus document.
    */
  def overlapReport(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8): DataFrame =
    overlapReportFromShingles(corpus, idCol, textCol,
      benchShingleSet(bench, benchTextCol, n), "_g_sh", n)

  /** The benchmark's distinct shingle set — the standing artifact a
    * STREAMING decontamination gate persists once and probes per
    * micro-batch ([[graft.streaming.StreamContamination]]). */
  def benchShingleSet(bench: DataFrame, benchTextCol: String,
                      n: Int = 8): DataFrame =
    bench
      .select(TextAnalysis.tokens(lower(col(benchTextCol))).as("_g_toks"))
      .select(explode(shinglesFromTokens(col("_g_toks"), n)).as("_g_sh"))
      .distinct()

  /** [[overlapReport]] against an ALREADY-MATERIALIZED benchmark
    * shingle set (one column `shingleCol`, distinct) — the single
    * definition both the batch and the streaming gates share. */
  def overlapReportFromShingles(corpus: DataFrame, idCol: String,
                                textCol: String, benchShingles: DataFrame,
                                shingleCol: String, n: Int = 8): DataFrame = {
    val bs = benchShingles.select(col(shingleCol).as("_g_sh"))
      .withColumn("_g_hit", lit(1))
    val docShingles = corpus
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("_g_toks"))
      .select(col(idCol), explode(shinglesFromTokens(col("_g_toks"), n)).as("_g_sh"))
    docShingles
      .join(broadcast(bs), Seq("_g_sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("_g_hit")).as("n_hits"))
      .withColumn("contam_frac",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** The decontaminated corpus: documents whose benchmark-overlap fraction
    * is at most `maxFrac` (0.0 = drop on any shared shingle).
    *
    * Shaped as a LEFT ANTI join against only the CONTAMINATED id set: that
    * set is typically tiny (benchmark leakage is rare), so AQE converts
    * the anti join to broadcast at runtime and the corpus never shuffles —
    * a left join against the full one-row-per-document report would
    * sort-merge the whole corpus. (No forced broadcast hint: a pathological
    * fully-contaminated corpus must degrade to a shuffle, not OOM the
    * driver.)
    * Documents absent from the report (null/empty text) are kept, matching
    * the previous left-join + coalesce(0.0) semantics. The corpus plan is
    * still evaluated twice (once under the report, once as the join
    * probe) — persist the corpus frame at the call site when it is not a
    * plain scan. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8, maxFrac: Double = 0.0): DataFrame = {
    val contaminatedIds =
      overlapReport(corpus, idCol, textCol, bench, benchTextCol, n)
        .filter(col("contam_frac") > maxFrac)
        .select(col(idCol))
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }
}
