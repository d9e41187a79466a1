package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming analytics over the record stream (SURVEY.md §2.5 streaming row,
  * M5): payload decode, event-time windows with watermarks, streaming dedup.
  *
  * All of these operate on an unbounded `Dataset[Record]` from
  * `Consumer.source` and are engine-native (Structured Streaming state
  * store, watermark eviction) — nothing here materializes the stream.
  */
object StreamingOps {

  /** Payload schema of the replay source's JSON envelope. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StructType(Seq(StructField("k", IntegerType))))))

  /** Decode opaque payload bytes into typed event columns (the reference
    * delegated this to user code — Main.scala:22 `utf8String`; here it is
    * `cast(string)` + `from_json`, SURVEY.md §1.4).
    */
  def decode(records: Dataset[Record]): DataFrame =
    records
      .withColumn("event", from_json(col("data").cast("string"), payloadSchema))
      .select(col("shardId"), col("sequenceNumber"),
        col("approximateArrivalTimestamp").as("arrival"),
        col("event.*"))
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Tumbling event-time counts with late-data eviction. */
  def tumblingCounts(decoded: DataFrame, window_ : String, watermark: String): DataFrame =
    decoded
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Session windows per user with the given inactivity gap. */
  def sessionCounts(decoded: DataFrame, gap: String, watermark: String): DataFrame =
    decoded
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))

  /** Streaming exact dedup bounded by the watermark — the engine-native
    * form of exact dedup for unbounded input (state is evicted once the
    * watermark passes, so state size tracks the dedup horizon, not the
    * stream length).
    */
  def dedupWithinWatermark(decoded: DataFrame, watermark: String): DataFrame =
    decoded.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
