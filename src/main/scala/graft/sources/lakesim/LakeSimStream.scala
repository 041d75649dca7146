package graft.sources.lakesim

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offset = number of index entries (data objects) already processed. The
  * lake's append-only object list makes this a monotone cursor, exactly the
  * reference's extraction-history semantics: each micro-batch covers the
  * objects that appeared since the last checkpointed offset, so every
  * object is extracted exactly once across restarts. */
final case class LakeOffset(objectCount: Long) extends Offset {
  override def json(): String = objectCount.toString
}

/** Streaming side of the lakesim source: `spark.readStream.format(...)`
  * turns the paginated lake scan into a checkpointed incremental extract —
  * the reference's schedule/retry loop (SURVEY.md §2.11) with the engine
  * supplying offsets, retries, and exactly-once batch planning.
  *
  * Admission control ([[SupportsTriggerAvailableNow]]): under
  * `Trigger.AvailableNow` the target offset is pinned ONCE at query start
  * (`prepareForTriggerAvailableNow`), so the run drains exactly the
  * objects that existed then — objects appended mid-run wait for the next
  * scheduled run, and the drain terminates even under continuous appends
  * (the reference's bounded extraction-history pass, not a tail). The
  * `maxObjectsPerBatch` option bounds each micro-batch's object count,
  * giving real multi-batch AvailableNow drains with per-batch commit
  * boundaries instead of one giant catch-up batch. */
class LakeSimMicroBatchStream(path: String, required: StructType,
                              pushed: Array[Filter], pageSize: Int,
                              maxObjectsPerBatch: Int = 0)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** End offset pinned at query start for an AvailableNow run; None for
    * a continuously-triggered query (each batch re-reads the live index). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(LakeIndex.load(path).size.toLong)

  override def initialOffset(): Offset = LakeOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    if (maxObjectsPerBatch > 0) ReadLimit.maxFiles(maxObjectsPerBatch)
    else ReadLimit.allAvailable()

  /** Admission-controlled progress: never past the pinned AvailableNow
    * target, at most `maxFiles` objects per batch (an object is the
    * lake's file-like unit). ReadMaxRows is honored conservatively via
    * the index's declared per-object counts — at least one object always
    * admits, so progress is guaranteed. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowTarget
      .getOrElse(LakeIndex.load(path).size.toLong)
    val from = start.asInstanceOf[LakeOffset].objectCount
    val capped = limit match {
      case mf: ReadMaxFiles =>
        math.min(avail, from + math.max(1, mf.maxFiles()))
      case mr: ReadMaxRows =>
        val entries = LakeIndex.load(path)
        var idx = from
        var rows = 0L
        while (idx < avail &&
            (idx == from || rows + entries(idx.toInt).count <= mr.maxRows())) {
          rows += entries(idx.toInt).count
          idx += 1
        }
        idx
      case _: ReadAllAvailable => avail
      case _ => avail
    }
    LakeOffset(capped)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (this " +
      "stream implements SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset =
    LakeOffset(LakeIndex.load(path).size.toLong)

  override def deserializeOffset(json: String): Offset =
    LakeOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LakeOffset].objectCount.toInt
    val to = end.asInstanceOf[LakeOffset].objectCount.toInt
    val entries = LakeIndex.load(path).slice(from, to)
    entries.flatMap { e =>
      val pages = math.max(1L, (e.count + pageSize - 1) / pageSize)
      (0L until pages).map(p =>
        LakeSimPartition(s"$path/${e.file}", p * pageSize, pageSize,
          required, pushed): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeSimReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
