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

  /** Distinct word n-gram shingles of a text column (lowercased). */
  def shingles(textCol: Column, n: Int): Column =
    array_distinct(Dedup.wordShingles(TextAnalysis.tokens(lower(textCol)), n))

  /** Per-document benchmark-overlap report: for every corpus document, the
    * number of distinct n-gram shingles, the number shared with `bench`,
    * the contamination fraction, and a contaminated flag.
    *
    * Output: (idCol, n_shingles, n_hits, contam_frac, contaminated),
    * one row per corpus document.
    */
  def overlapReport(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8): DataFrame = {
    val benchShingles = bench
      .select(explode(shingles(col(benchTextCol), n)).as("_g_sh"))
      .distinct()
      .withColumn("_g_hit", lit(1))
    val docShingles = corpus.select(col(idCol),
      explode(shingles(col(textCol), n)).as("_g_sh"))
    docShingles
      .join(broadcast(benchShingles), Seq("_g_sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("_g_hit")).as("n_hits"))
      .withColumn("contam_frac",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** The decontaminated corpus: documents whose benchmark-overlap fraction
    * is at most `maxFrac` (0.0 = drop on any shared shingle). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8, maxFrac: Double = 0.0): DataFrame = {
    val report = overlapReport(corpus, idCol, textCol, bench, benchTextCol, n)
      .select(col(idCol), col("contam_frac"))
    corpus.join(report, Seq(idCol), "left")
      .filter(coalesce(col("contam_frac"), lit(0.0)) <= maxFrac)
      .drop("contam_frac")
  }
}
