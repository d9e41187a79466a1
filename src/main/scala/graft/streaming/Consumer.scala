package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Consumer configuration — the reference's `ConsumerConfig`
  * (reference: Consumer.scala:55-90) re-expressed as source options
  * (SURVEY.md §1.3/§2.1-S3). HOCON parsing becomes `fromMap` over the same
  * keys the reference documents in its reference.conf.
  *
  * Reference → here:
  *  - streamName + AWS clients → `streamPath` (the shard backend locator)
  *  - appName (consumer group)  → `appName`; distinct checkpoint dirs give
  *    distinct groups their own committed frontier (the DynamoDB analog)
  *  - position.initial latest / trim-horizon / at-timestamp
  *    (Consumer.scala:125-143) → `startingPosition` / `startingTimestampMs`
  *  - CheckpointConfig (maxBufferSize 10000 / maxDuration 60s) → the trigger
  *    interval bounds checkpoint cadence; buffer-size triggering has no
  *    engine analog (micro-batches already bound in-flight volume)
  */
final case class ConsumerConfig(
    streamPath: String,
    appName: String = "graft-consumer",
    numShards: Int = 4,
    startingPosition: String = "trim_horizon",
    startingTimestampMs: Option[Long] = None,
    maxRecordsPerTrigger: Option[Long] = None,
    reshardAtMs: Option[Long] = None,
    deliveryMode: String = "at_least_once",
    aggregation: Int = 1,
    mergeAtMs: Option[Long] = None,
    controlPlaneUrl: Option[String] = None,
    dataPlaneUrl: Option[String] = None,
    leaseUrl: Option[String] = None)

object ConsumerConfig {
  /** Config-map parsing mirroring the reference's HOCON keys
    * (reference: src/main/resources/reference.conf:9-19).
    */
  def fromMap(m: Map[String, String]): ConsumerConfig = ConsumerConfig(
    streamPath = m.getOrElse("stream-name", sys.error("stream-name required")),
    appName = m.getOrElse("application-name", "graft-consumer"),
    numShards = m.get("shards").map(_.toInt).getOrElse(4),
    startingPosition =
      m.getOrElse("position.initial", "latest").replace('-', '_'),
    startingTimestampMs = m.get("position.time").map(_.toLong),
    maxRecordsPerTrigger = m.get("max-records-per-trigger").map(_.toLong),
    reshardAtMs = m.get("reshard-at-ms").map(_.toLong),
    deliveryMode =
      m.getOrElse("delivery-mode", "at_least_once").replace('-', '_'),
    aggregation = m.get("aggregation").map(_.toInt).getOrElse(1),
    mergeAtMs = m.get("merge-at-ms").map(_.toLong),
    controlPlaneUrl = m.get("control-plane-url"),
    dataPlaneUrl = m.get("data-plane-url"),
    leaseUrl = m.get("lease-url"))

  /** HOCON-text parsing — reference parity for the `Config`-taking
    * `ConsumerConfig.fromConfig` (reference: Consumer.scala:113-184), which
    * reads the `reference.conf`-documented keys. This environment pins the
    * dependency set (no com.typesafe:config on the Spark-jars classpath),
    * so the overload accepts HOCON TEXT and parses the subset those
    * configs actually use — nested blocks, dotted keys, `=`/`:`,
    * quoted/unquoted scalars, `#`/`//` comments — flattening to the same
    * key-map `fromMap` consumes. A build with typesafe-config present can
    * delegate via `fromMap(config.entrySet.asScala.map(...).toMap)`
    * unchanged.
    */
  def fromHocon(text: String): ConsumerConfig = fromMap(Hocon.flatten(text))
}

/** Minimal HOCON-subset reader (self-contained: the frozen classpath has
  * no typesafe-config). Supports exactly the shapes in the reference's
  * reference.conf: `key = value`, `key: value`, nested `key { ... }`
  * blocks, dotted keys, double-quoted or unquoted scalars, and `#` / `//`
  * comments. No substitutions/includes/arrays — those never appear in
  * consumer configs.
  */
private[streaming] object Hocon {
  def flatten(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val path = scala.collection.mutable.Stack.empty[String]
    def strip(line: String): String = {
      // cut comments not inside quotes
      var inQ = false
      val b = new StringBuilder
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '"') { inQ = !inQ; b.append(c); i += 1 }
        else if (!inQ && (c == '#' ||
          (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/'))) i = line.length
        else { b.append(c); i += 1 }
      }
      b.toString.trim
    }
    def unquote(v: String): String =
      if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
        v.substring(1, v.length - 1)
      else v
    text.linesIterator.map(strip).filter(_.nonEmpty).foreach { line =>
      if (line == "}") {
        require(path.nonEmpty, s"unbalanced '}' in config")
        path.pop()
      } else if (line.endsWith("{")) {
        path.push(line.dropRight(1).trim.stripSuffix(":").stripSuffix("=").trim)
      } else {
        val sep = line.indexWhere(c => c == '=' || c == ':')
        require(sep > 0, s"unparseable config line: '$line'")
        val key = line.substring(0, sep).trim
        val value = unquote(line.substring(sep + 1).trim)
        out((path.toSeq.reverse :+ key).mkString(".")) = value
      }
    }
    require(path.isEmpty, "unbalanced '{' in config")
    out.toMap
  }
}

/** The consumer API — reference parity for `px.kinesis.stream.consumer`
  * (SURVEY.md §2.1-S1/S2, §2.2-T1, M3).
  *
  * `source(...)` returns an unbounded `Dataset[Record]` merging all shards,
  * strictly ordered within each shard — the `Source[Record, Future[Done]]`
  * analog. The materialized `Future[Done]` maps to the `StreamingQuery`
  * returned by `run`/`DataStreamWriter.start()`: `awaitTermination()` is the
  * completion future.
  */
object Consumer {

  /** Reference `consumer.source(config)` (Consumer.scala:37-48). */
  def source(config: ConsumerConfig)(implicit spark: SparkSession): Dataset[Record] = {
    import spark.implicits._
    var r = spark.readStream
      .format("sharded-replay")
      .option("path", config.streamPath)
      .option("shards", config.numShards)
      .option("startingPosition", config.startingPosition)
    config.startingTimestampMs.foreach(t => r = r.option("startingTimestampMs", t))
    config.maxRecordsPerTrigger.foreach(m => r = r.option("maxRecordsPerTrigger", m))
    config.reshardAtMs.foreach(t => r = r.option("reshardAtMs", t))
    if (config.deliveryMode != "at_least_once")
      r = r.option("deliveryMode", config.deliveryMode)
    if (config.aggregation != 1)
      r = r.option("aggregation", config.aggregation)
    config.mergeAtMs.foreach(t => r = r.option("mergeAtMs", t))
    config.controlPlaneUrl.foreach(u => r = r.option("controlPlaneUrl", u))
    config.dataPlaneUrl.foreach(u => r = r.option("dataPlaneUrl", u))
    config.leaseUrl.foreach(u => r = r.option("leaseUrl", u))
    r.load().as[Record]
  }

  /** Reference `consumer.source(streamName, appName)` overload
    * (Consumer.scala:50-52): defaults, trim_horizon for replay determinism.
    */
  def source(streamPath: String, appName: String)(implicit spark: SparkSession): Dataset[Record] =
    source(ConsumerConfig(streamPath = streamPath, appName = appName))

  /** The reference's `commitFlow` (CommitGraphStages.scala:16-17) marked
    * every record processed with bounded parallelism; here commit is a
    * whole-engine concern: offsets for batch N are committed to the
    * checkpoint log only after batch N's sink write succeeds, which is
    * exactly the contiguous-prefix rule the reference's tracker enforced
    * per record (ShardCheckpointTrackerActor.scala:86). This is therefore
    * an intentional no-op pass-through, kept so reference call sites
    * translate one-to-one; delivery is at-least-once end-to-end
    * (exactly-once with idempotent sinks). The reference's at-most-once
    * mode (commit BEFORE process — commitFlow placed ahead of the
    * processing stage, README.md:44-45) is selected here with
    * `ConsumerConfig(deliveryMode = "at_most_once")`: the source commits
    * the planned frontier eagerly, so a failed batch is dropped on
    * restart instead of redelivered (ShardedReplaySpec asserts it).
    */
  def commitFlow(ds: Dataset[Record]): Dataset[Record] = ds

  /** Run a record stream into a sink, returning the query handle (the
    * `Future[Done]` analog). Caller owns `awaitTermination`/`stop` —
    * mirroring StreamScheduler start/shutdown (StreamScheduler.scala:27-59).
    */
  def run(
      ds: Dataset[Record],
      checkpointLocation: String)(
      configure: DataStreamWriter[Record] => DataStreamWriter[Record]): StreamingQuery =
    configure(ds.writeStream.option("checkpointLocation", checkpointLocation)).start()

  /** One shard's consumer position vs the stream head at a batch boundary. */
  final case class ShardLag(shard: Int, committed: Long, latest: Long) {
    /** Records available but not yet processed (the MillisBehindLatest
      * analog, in records — the replay clock is the sequence number). */
    def lag: Long = math.max(0L, latest - committed)
  }

  /** One micro-batch's progress: how much was read and how far behind the
    * stream head each shard still is after the batch. */
  final case class ProgressReport(
      batchId: Long, numInputRows: Long, shards: Seq[ShardLag]) {
    def totalLag: Long = shards.map(_.lag).sum
    def caughtUp: Boolean = totalLag == 0
  }

  /** Per-shard lag over the query's retained progress history — the
    * KCL/CloudWatch `MillisBehindLatest` monitoring surface re-expressed
    * on engine metrics (SURVEY.md §2.1-S7 termination watch / ops
    * visibility). Reads ONLY `StreamingQueryProgress` — the engine already
    * reports the per-batch end offset and the stream head
    * (`reportLatestOffset`), so observability costs no extra I/O, runs on
    * the driver against in-memory history, and works identically on a
    * 1000-executor cluster (progress events are driver-side there too).
    *
    * Backpressure tuning loop: if `totalLag` grows batch-over-batch while
    * `numInputRows` sits at the `maxRecordsPerTrigger` cap, the consumer
    * is under-provisioned — raise the cap or add shards.
    */
  def lagReport(query: StreamingQuery): Seq[ProgressReport] = {
    import graft.sources.replay.ShardPositions
    query.recentProgress.toSeq.flatMap { p =>
      p.sources.headOption.flatMap { src =>
        (Option(src.endOffset), Option(src.latestOffset)) match {
          case (Some(end), Some(latest)) =>
            val e = ShardPositions.parse(end)
            val l = ShardPositions.parse(latest)
            Some(ProgressReport(p.batchId, p.numInputRows,
              l.positions.keys.toSeq.sorted.map(k => ShardLag(k, e(k), l(k)))))
          case _ => None
        }
      }
    }
  }
}
