package graft.sources.lakesim

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  */
class LakeSimMicroBatchStream(path: String, required: StructType,
                              pushed: Array[Filter], pageSize: Int)
    extends MicroBatchStream {

  override def initialOffset(): Offset = LakeOffset(0L)

  override def latestOffset(): Offset =
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
