package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** The stream record envelope — the engine's one fundamental data type,
  * mirroring the reference's `Record`
  * (reference: src/main/scala/px/kinesis/stream/consumer/Record.scala:13-23).
  *
  * Differences from the reference, by design (SURVEY.md §1.4):
  *  - `data` is `Array[Byte]` (Spark `BinaryType`), not a ByteString;
  *  - there is NO `markProcessed` callback column: commit semantics belong to
  *    the engine (offsets are committed per micro-batch after the sink
  *    succeeds), not to individual rows — see Consumer.commitFlow.
  *
  * Ordering contract: within a shard, records are strictly ordered by
  * `(sequenceNumber, subSequenceNumber)` (the sequence number is
  * zero-padded decimal, so lexical = numeric order, the same trick the
  * reference's fixtures rely on). With KPL aggregation the sub-sequence
  * number is the REQUIRED tie-breaker — K records share each sequence
  * number (KCL's ExtendedSequenceNumber, reference Record.scala:22);
  * without aggregation it is always 0 and the sequence number alone is
  * strict. Across shards there is no order — exactly Spark's
  * per-partition ordering guarantee.
  */
final case class Record(
    key: String,
    data: Array[Byte],
    sequenceNumber: String,
    subSequenceNumber: Long,
    shardId: String,
    approximateArrivalTimestamp: java.sql.Timestamp) {

  /** UTF-8 view of the payload (reference: examples Main.scala:22). */
  def dataUtf8: String = new String(data, java.nio.charset.StandardCharsets.UTF_8)
}

object Record {
  /** The fixed envelope schema every sharded source produces. */
  val schema: StructType = Encoders.product[Record].schema
}
