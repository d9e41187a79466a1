package graft.streaming

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Producer-side surface — the reference's example producer
  * (reference: examples/src/main/scala/Producer.scala:15-27, via kpl-scala)
  * wrote (key, bytes) records to the stream. The Spark-native sink analog
  * writes a `Dataset[Record]` to a stream backend:
  *
  *  - batch: one write job, records land partitioned however the backend
  *    shards them (here: parquet, the offline stand-in);
  *  - streaming: `foreachBatch` — the idiomatic place to call an external
  *    producer client per micro-batch with bounded parallelism (the
  *    `mapAsync(1)(send)` analog, SURVEY.md §2.2-T6). Each batch is written
  *    atomically-per-partition by the backend client; Spark retries failed
  *    batches, so the sink must be idempotent for exactly-once (same rule
  *    the file sink follows via its commit log).
  */
object Producer {

  /** A record as the producer hands it to the service: partition key +
    * payload (sequence numbers are assigned server-side).
    */
  final case class ProducerRecord(key: String, data: Array[Byte])

  /** KPL-style producer aggregation: pack runs of up to `k` consecutive
    * records per partition into ONE aggregated wire record (the client-side
    * batching that makes the consumer's `aggregation = K` sub-sequence
    * model necessary — the packed position 0..k-1 becomes the consumer's
    * subSequenceNumber). The aggregate's partition key is its first
    * record's key, matching KPL routing (all sub-records ride the shard
    * the first key hashes to).
    *
    * Encoding (not KPL's protobuf — an equivalent length-prefixed form,
    * since wire compatibility is out of scope offline): 4-byte big-endian
    * sub-record count, then per sub-record [keyLen][keyBytes][dataLen]
    * [dataBytes].
    *
    * Scale design: `mapPartitions` — genuinely imperative per-partition
    * packing, zero shuffle; each partition independently emits its runs
    * (the final partial run included), cutting the per-record service
    * round-trips by k. [[deaggregate]] is the exact inverse;
    * ProducerAggregationSpec pins the round trip.
    */
  def aggregate(records: Dataset[ProducerRecord], k: Int): Dataset[ProducerRecord] = {
    require(k >= 1, s"aggregation factor must be >= 1, got $k")
    import records.sparkSession.implicits._
    if (k == 1) records
    else records.mapPartitions { it =>
      it.grouped(k).map { run =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        out.writeInt(run.length)
        run.foreach { r =>
          val kb = r.key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(r.data.length); out.write(r.data)
        }
        ProducerRecord(run.head.key, bos.toByteArray)
      }
    }
  }

  /** Inverse of [[aggregate]]: the sub-records of one aggregated payload,
    * in packed (sub-sequence) order.
    */
  def deaggregate(blob: Array[Byte]): Seq[ProducerRecord] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
    val n = in.readInt()
    require(n >= 0, s"corrupt aggregate: negative count $n")
    (0 until n).map { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val db = new Array[Byte](in.readInt()); in.readFully(db)
      ProducerRecord(new String(kb, java.nio.charset.StandardCharsets.UTF_8), db)
    }
  }

  /** Dataset-level inverse of [[aggregate]] (order within each partition is
    * the packed order — the consumer-side per-shard ordering contract).
    */
  def deaggregateAll(records: Dataset[ProducerRecord]): Dataset[ProducerRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap(r => deaggregate(r.data)))
  }

  /** Batch write: the `ScalaKinesisProducer.send` loop becomes one job. */
  def write(records: Dataset[Record], path: String): Unit =
    records.write.mode(SaveMode.Append).parquet(path)

  /** Streaming write through foreachBatch — swap the body for a real
    * service client without touching callers.
    */
  def writeStream(
      records: Dataset[Record],
      path: String,
      checkpointLocation: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Record], batchId: Long) =>
        // per-batch producer call site; parquet stands in for the service
        batch.write.mode(SaveMode.Append).parquet(path)
        ()
      }
      .start()
}
