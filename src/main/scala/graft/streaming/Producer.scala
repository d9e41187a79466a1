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
