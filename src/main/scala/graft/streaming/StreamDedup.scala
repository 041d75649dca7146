package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication on a content fingerprint — the live-ingest
  * counterpart of [[graft.functions.Dedup.exactDedup]]: documents arriving
  * on a stream keep only their first occurrence, with dedup state BOUNDED
  * by the watermark delay instead of growing with the corpus
  * (`dropDuplicatesWithinWatermark` evicts fingerprints once the event-time
  * watermark passes them — the only way streaming dedup survives at 100 TB/
  * day; an unwatermarked `dropDuplicates` keeps every key forever).
  *
  * The fingerprint is md5 of the text, so state per document is one hash,
  * never the document itself — same narrow-state discipline as
  * [[graft.operators.SnapshotDiff]].
  */
object StreamDedup {

  /** First occurrence per text fingerprint within the watermark window.
    * `tsCol` must be an event-time timestamp column; duplicates arriving
    * within `watermarkDelay` of each other collapse to the earliest-seen
    * row. Works identically on a batch frame (one "micro-batch"). */
  def dedupByFingerprint(df: DataFrame, tsCol: String, textCol: String,
                         watermarkDelay: String): DataFrame =
    df.withColumn("_graft_fp", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_graft_fp")
      .drop("_graft_fp")
}
