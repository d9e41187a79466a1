package graft.sources.replay

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.Record

/** A DataSource V2 source with Kinesis consumer semantics, backed by a
  * parquet event file replayed as N shards (SURVEY.md §2.1-S1/S3/S4, M2).
  *
  * Reference behaviors re-expressed on the Spark engine:
  *  - per-shard strict ordering, unordered across shards
  *    (reference Consumer.scala:39-40 MergeHub) → one `InputPartition` per
  *    shard; a streaming DataFrame is the union of its partitions;
  *  - demand-driven fetch / backpressure (RecordProcessorFactoryImpl.scala:21)
  *    → `SupportsAdmissionControl` with `maxRecordsPerTrigger`;
  *  - initial positions trim-horizon / latest / at-timestamp
  *    (Consumer.scala:125-143) → `startingPosition` option;
  *  - contiguous-prefix checkpointing (ShardCheckpointTrackerActor.scala:86)
  *    → the engine's offset log: an `Offset` here is a per-shard frontier
  *    position, which IS the longest processed prefix.
  *
  * The file backend is the offline test double for the real service (zero
  * egress — no AWS). A production provider would implement the same
  * partition-per-shard / frontier-offset contract against the service API;
  * everything driver-side (offsets, planning, admission control) is the
  * scale-relevant part and is identical in both cases. The per-JVM record
  * cache makes executor reads O(1) after first touch; at 100 TB you would
  * never replay from one file — shards stream independently, which is what
  * the partition readers model.
  *
  * Options: `path` (parquet file/dir), `shards` (default 4), `startingPosition`
  * (trim_horizon | latest | at_timestamp), `startingTimestampMs`,
  * `maxRecordsPerTrigger` (per-trigger total across shards).
  */
class ShardedReplayProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sharded-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    ReplayConfig.fromOptions(options) // fail fast on bad options at load()
    Record.schema
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShardedReplayTable
}

final class ShardedReplayTable extends Table with SupportsRead {
  override def name(): String = "sharded-replay"
  override def schema(): StructType = Record.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardedReplayScan(ReplayConfig.fromOptions(options))
}

final case class ReplayConfig(
    path: String,
    numShards: Int,
    startingPosition: String,
    startingTimestampMs: Long,
    maxRecordsPerTrigger: Option[Long])

object ReplayConfig {
  def fromOptions(o: CaseInsensitiveStringMap): ReplayConfig = {
    require(o.containsKey("path"), "sharded-replay requires a 'path' option")
    val pos = o.getOrDefault("startingPosition", "trim_horizon").toLowerCase
    require(Seq("trim_horizon", "latest", "at_timestamp").contains(pos),
      s"unknown startingPosition '$pos'")
    ReplayConfig(
      path = o.get("path"),
      numShards = o.getInt("shards", 4),
      startingPosition = pos,
      startingTimestampMs = o.getLong("startingTimestampMs", 0L),
      maxRecordsPerTrigger =
        Option(o.get("maxRecordsPerTrigger")).map(_.toLong))
  }
}

final class ShardedReplayScan(conf: ReplayConfig) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = Record.schema
  override def toBatch: Batch = new ShardedReplayBatch(conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedReplayMicroBatchStream(conf)
}

/** Offset = per-shard frontier: records [0, position) are committed. The
  * JSON form is the engine-checkpoint analog of the reference's
  * DynamoDB (shard → highest contiguous sequence number) table.
  */
final case class ShardPositions(positions: SortedMap[Int, Long]) extends Offset {
  override def json(): String =
    positions.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  def apply(shard: Int): Long = positions.getOrElse(shard, 0L)
}

object ShardPositions {
  def parse(json: String): ShardPositions = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val m = JsonMethods.parse(json) match {
      case JObject(fields) => fields.map {
        case (k, JInt(v)) => k.toInt -> v.toLong
        case (k, JLong(v)) => k.toInt -> v
        case (k, v) => sys.error(s"bad offset field $k=$v")
      }
      case other => sys.error(s"bad offset json $other")
    }
    ShardPositions(SortedMap.from(m))
  }
  def zeros(n: Int): ShardPositions =
    ShardPositions(SortedMap.from((0 until n).map(_ -> 0L)))
}

/** Pure admission-control arithmetic, exposed for property tests: advances
  * `current` toward `counts` by at most `maxRows` total, spreading the
  * budget round-robin so no shard starves (the KCL analog: every shard
  * consumer gets demand).
  */
object AdmissionPlanner {
  def advance(current: ShardPositions, counts: Array[Long], maxRows: Option[Long]): ShardPositions = {
    val n = counts.length
    val backlog = (0 until n).map(i => math.max(0L, counts(i) - current(i)))
    val take = maxRows match {
      case None => backlog
      case Some(budget) =>
        // Round-robin: give each shard an equal slice, then redistribute
        // leftover to shards that still have backlog (two passes suffice
        // for the per-trigger granularity we need).
        val base = budget / n
        val first = backlog.map(b => math.min(b, base))
        var left = budget - first.sum
        val extra = backlog.zip(first).map { case (b, f) =>
          val e = math.min(b - f, left); left -= e; e
        }
        first.zip(extra).map { case (f, e) => f + e }
    }
    ShardPositions(SortedMap.from((0 until n).map(i => i -> (current(i) + take(i)))))
  }
}

final class ShardedReplayMicroBatchStream(conf: ReplayConfig)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private lazy val shards = ShardStore.shards(conf.path, conf.numShards)
  private lazy val counts: Array[Long] = shards.map(_.length.toLong)

  // Trigger.AvailableNow: snapshot the frontier once; per-batch read limits
  // still apply, so the drain takes several admission-bounded batches.
  @volatile private var availableNowCap: Option[Array[Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(counts.clone())
  private def frontier: Array[Long] = availableNowCap.getOrElse(counts)

  override def initialOffset(): Offset = conf.startingPosition match {
    case "trim_horizon" => ShardPositions.zeros(conf.numShards)
    case "latest" =>
      ShardPositions(SortedMap.from(counts.indices.map(i => i -> counts(i))))
    case "at_timestamp" =>
      val t = conf.startingTimestampMs * 1000L // micros
      ShardPositions(SortedMap.from(shards.indices.map { i =>
        i -> shards(i).count(_.tsMicros < t).toLong
      }))
  }

  override def getDefaultReadLimit: ReadLimit =
    conf.maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = start.asInstanceOf[ShardPositions]
    limit match {
      case _: ReadAllAvailable => AdmissionPlanner.advance(cur, frontier, None)
      case r: ReadMaxRows => AdmissionPlanner.advance(cur, frontier, Some(r.maxRows()))
      case _ => AdmissionPlanner.advance(cur, frontier, None)
    }
  }

  override def reportLatestOffset(): Offset =
    ShardPositions(SortedMap.from(counts.indices.map(i => i -> counts(i))))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardPositions]
    val e = end.asInstanceOf[ShardPositions]
    // Reshard guard: a checkpoint written with a different shard count must
    // not silently replay (missing shards would restart at 0 → duplicates)
    // or drop data. Real resharding (shard split/merge, reference L4) is a
    // planned offset-format evolution, not a silent remap.
    require(s.positions.size == conf.numShards,
      s"checkpoint has ${s.positions.size} shards but source is configured " +
        s"with ${conf.numShards}; resharding a checkpointed stream is not " +
        "supported — start a new checkpoint or restore the original count")
    shards.indices.collect {
      case i if e(i) > s(i) =>
        ReplayInputPartition(conf.path, conf.numShards, i, s(i), e(i))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory
  override def deserializeOffset(json: String): Offset = ShardPositions.parse(json)
  override def commit(end: Offset): Unit = () // engine-managed (commit log)
  override def stop(): Unit = ()
}

final class ShardedReplayBatch(conf: ReplayConfig) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val shards = ShardStore.shards(conf.path, conf.numShards)
    shards.indices.map { i =>
      ReplayInputPartition(conf.path, conf.numShards, i, 0L, shards(i).length.toLong)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory
}

final case class ReplayInputPartition(
    path: String, numShards: Int, shard: Int, from: Long, until: Long)
  extends InputPartition

object ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayInputPartition]
    new ReplayPartitionReader(p)
  }
}

final class ReplayPartitionReader(p: ReplayInputPartition)
    extends PartitionReader[InternalRow] {
  private val rows = ShardStore.shards(p.path, p.numShards)(p.shard)
  private var pos = p.from - 1

  override def next(): Boolean = { pos += 1; pos < p.until }

  override def get(): InternalRow = {
    val ev = rows(pos.toInt)
    // Envelope fields in Record.schema order; payload is the event as a
    // deterministic JSON document (opaque bytes to the engine, decoded
    // downstream with from_json — reference Main.scala:22 utf8String).
    InternalRow(
      UTF8String.fromString(ev.userId.toString),
      ev.payloadJson.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      UTF8String.fromString("%020d".format(pos)),
      0L,
      UTF8String.fromString("shardId-%012d".format(p.shard)),
      ev.tsMicros)
  }

  override def close(): Unit = ()
}

/** Per-JVM shard cache for the replay backend. Records are hash-routed to
  * shards by partition key (userId — the Kinesis partition-key analog) and
  * ordered by (arrival time, event id) within a shard.
  */
object ShardStore {
  final case class Ev(
      eventId: Long, tsMicros: Long, userId: Long,
      eventType: String, value: Double, props: String) {
    def payloadJson: String =
      s"""{"event_id":$eventId,"ts_us":$tsMicros,"user_id":$userId,""" +
        s""""event_type":${ShardStore.jsonString(eventType)},""" +
        s""""value":${ShardStore.jsonNumber(value)},"props":$props}"""
  }

  /** JSON string literal with full escaping — the payload must stay valid
    * JSON for any event_type value (from_json downstream returns null rows
    * on malformed documents, silently corrupting the replayed stream).
    */
  def jsonString(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** NaN/Infinity are not valid JSON numbers — emit null (what from_json
    * would produce for them anyway, but without poisoning the whole row).
    */
  def jsonNumber(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"

  private val cache = new ConcurrentHashMap[(String, Int), Array[Array[Ev]]]()

  def shards(path: String, numShards: Int): Array[Array[Ev]] =
    cache.computeIfAbsent((path, numShards), { case (p, n) => load(p, n) })

  private def load(path: String, numShards: Int): Array[Array[Ev]] = {
    val hconf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      else Array(root)
    val evs = files.iterator.flatMap { f =>
      val reader = ParquetReader.builder(new GroupReadSupport(), f).withConf(hconf).build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
        Ev(
          eventId = g.getLong("event_id", 0),
          tsMicros = g.getLong("ts", 0) / 1000L, // TIMESTAMP(NANOS) → micros
          userId = g.getLong("user_id", 0),
          eventType = g.getString("event_type", 0),
          value = g.getDouble("value", 0),
          props = g.getString("props", 0))
      }.toArray.iterator // drain fully before closing the reader
      finally reader.close()
    }.toArray
    val byShard = evs.groupBy(e => math.floorMod(e.userId, numShards.toLong).toInt)
    (0 until numShards).map { i =>
      byShard.getOrElse(i, Array.empty[Ev]).sortBy(e => (e.tsMicros, e.eventId))
    }.toArray
  }
}
