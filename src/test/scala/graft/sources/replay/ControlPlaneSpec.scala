package graft.sources.replay

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import graft.streaming.{Consumer, ConsumerConfig, Record}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

/** Runtime topology discovery against a CONTROL-PLANE SERVICE — the
  * reference's "the worker learns about resharding from stream metadata,
  * never from user configuration" behavior
  * (RecordProcessorImpl.scala:102-113), exercised over a real loopback
  * HTTP service (zero egress: `com.sun.net.httpserver` ships in the JDK).
  * The scripted `reshardAtMs` option remains the deterministic harness;
  * these tests pin that the DISCOVERED path is byte-equivalent to it.
  */
class ControlPlaneSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val eventsPath = s"$sf/events.parquet"
  private lazy val nEvents: Long = graft.Tables.events(spark, sf).count()
  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private val topology = new AtomicReference[String]("numShards=4")
  private val leaseTable = new AtomicReference[Map[String, String]](
    Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
  private lazy val server: HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/topology", exchange => {
      val body = topology.get().getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    // The data plane: serves record pages for the layout the CURRENT
    // topology describes (the service owns both views, like a real
    // stream backend).
    srv.createContext("/records", exchange => {
      val params = exchange.getRequestURI.getQuery.split("&")
        .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      val t = ControlPlane.parse(topology.get())
      val layout = ShardStore.shards(eventsPath, t.numShards,
        t.reshardAtMs.map(_ * 1000L), t.mergeAtMs.map(_ * 1000L))
      val shard = params("shard").toInt
      val body = (params.get("atMicros") match {
        case Some(at) =>
          // The timestamp scan (GetShardIterator AT_TIMESTAMP): the first
          // position with ts >= atMicros.
          val p = layout(shard).count(_.tsMicros < at.toLong).toLong
          s"position=$p"
        case None =>
          val from = params("from").toLong
          val to = math.min(params("to").toLong,
            from + params("limit").toLong)
          (from until math.min(to, layout(shard).length.toLong))
            .map { pos =>
              val ev = layout(shard)(pos.toInt)
              s"$pos\t${ev.tsMicros}\t${ev.userId}\t" +
                java.util.Base64.getEncoder.encodeToString(
                  ev.payloadJson.getBytes("UTF-8"))
            }.mkString("\n")
      }).getBytes("UTF-8")
      exchange.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) exchange.getResponseBody.write(body)
      exchange.close()
    })
    // The lease table: worker → owned shard subset (disjoint, together
    // covering the stream — KCL's DynamoDB coordination, service-side).
    // Mutable: reassigning a row between triggers IS the rebalance.
    srv.createContext("/lease", exchange => {
      val worker = exchange.getRequestURI.getQuery.stripPrefix("worker=")
      val body = leaseTable.get().getOrElse(worker,
        s"# unknown worker $worker\nshards=").getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    srv.start()
    srv
  }
  private def url = s"http://127.0.0.1:${server.getAddress.getPort}/topology"
  private def dataUrl = s"http://127.0.0.1:${server.getAddress.getPort}/records"
  private def leaseUrl(worker: String) =
    s"http://127.0.0.1:${server.getAddress.getPort}/lease?worker=$worker"

  /** Publish a topology with per-shard counts (the DescribeStream view). */
  private def publish(numShards: Int, reshardAtMs: Option[Long],
      counts: Seq[Long]): Unit =
    topology.set(s"numShards=$numShards\n" +
      reshardAtMs.map(t => s"reshardAtMs=$t\n").getOrElse("") +
      s"counts=${counts.mkString(",")}")

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private lazy val splitMs: Long = {
    val medianSec = graft.Tables.events(spark, sf)
      .selectExpr("percentile_approx(cast(ts as double), 0.5)").as[Double].head()
    (medianSec * 1000).toLong
  }

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("topology text parses shard count, instants, comments, and blanks") {
    val t = ControlPlane.parse(
      "# control plane\n\nnumShards = 8\nreshardAtMs = 123\n")
    assert(t === ControlPlane.Topology(8, Some(123L), None))
    assert(ControlPlane.parse("numShards=2\nmergeAtMs=9") ===
      ControlPlane.Topology(2, None, Some(9L)))
    intercept[RuntimeException](ControlPlane.parse("reshardAtMs=1"))
    intercept[IllegalArgumentException](
      ControlPlane.parse("numShards=2\nreshardAtMs=1\nmergeAtMs=2"))
  }

  test("lease floors outside the assignment are dropped, not fatal") {
    // During a handoff the lease table's pos. lines can be visible
    // before/after the shards= line updates; a per-trigger re-fetch must
    // tolerate the one-trigger inconsistency instead of failing the
    // whole streaming query.
    val l = ControlPlane.Lease(Set(0, 2), Map(0 -> 5L, 1 -> 9L, 3 -> 7L))
    assert(l.shards === Set(0, 2))
    assert(l.floors === Map(0 -> 5L), "stray floors (1, 3) must be dropped")
    // In-assignment floors are untouched.
    assert(ControlPlane.Lease(Set(1), Map(1 -> 4L)).floors === Map(1 -> 4L))
  }

  test("batch read discovers its topology from the service (split case)") {
    topology.set(s"numShards=4\nreshardAtMs=$splitMs")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("shardId").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    val viaService = spark.read.format("sharded-replay")
      .option("path", eventsPath)
      .option("controlPlaneUrl", url).load()
    val viaOptions = spark.read.format("sharded-replay")
      .option("path", eventsPath)
      .option("shards", 4).option("reshardAtMs", splitMs).load()
    assert(viaService.count() === nEvents)
    assert(shape(viaService) === shape(viaOptions),
      "discovered topology must tile the stream exactly like the scripted one")
  }

  test("a reshard announced MID-STREAM is discovered, gated, and exactly-once") {
    topology.set("numShards=4") // nothing announced at query start
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long)]()
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4, // ignored: control plane rules
      maxRecordsPerTrigger = Some(100),
      controlPlaneUrl = Some(url)))
    val q = ds.writeStream
      .option("checkpointLocation", tmpDir("ckpt_cp"))
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], batchId: Long) =>
        df.groupBy("shardId").count().collect().foreach { r =>
          batches.add((batchId, r.getString(0).stripPrefix("shardId-").toInt,
            r.getLong(1)))
        }
        ()
      }.start()
    try {
      // Let a couple of pre-announcement batches commit (100 records per
      // trigger over 4 shards — far below the per-parent split point),
      // then ANNOUNCE the split on the service. The next trigger's poll
      // must pick it up.
      import scala.jdk.CollectionConverters._
      def total: Long = batches.iterator().asScala.map(_._3).sum
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (total < 200 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(total >= 200, "stream must make progress before the announcement")
      topology.set(s"numShards=4\nreshardAtMs=$splitMs")
      while (total < nEvents && System.nanoTime() < deadline) Thread.sleep(100)
      assert(total === nEvents, s"drained $total of $nEvents")
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val seen = batches.iterator().asScala.toSeq
    // Children (ids >= 4) exist at all = the announcement was discovered.
    assert(seen.exists(_._2 >= 4),
      "children must appear after the mid-stream announcement")
    // The shardEnded gate must hold exactly as in the scripted path:
    // every parent's last batch strictly precedes its children's first.
    (0 until 4).foreach { p =>
      val lastParent = seen.filter(_._2 == p).map(_._1).maxOption
      val firstChild = seen.filter(b => Seq(4 + p, 8 + p).contains(b._2))
        .map(_._1).minOption
      for (lp <- lastParent; fc <- firstChild)
        assert(lp < fc, s"parent $p last batch $lp vs child first batch $fc")
    }
    // Exactly-once across the discovery: per-shard totals equal the
    // scripted layout's shard contents.
    val got = seen.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val want = spark.read.format("sharded-replay")
      .option("path", eventsPath)
      .option("shards", 4).option("reshardAtMs", splitMs).load()
      .groupBy("shardId").count().as[(String, Long)].collect()
      .map { case (sid, n) => sid.stripPrefix("shardId-").toInt -> n }.toMap
    assert(got === want.filter(_._2 > 0),
      "discovered-reshard delivery must tile exactly like the scripted one")
  }

  private def fileLayout = ShardStore.shards(eventsPath, 4)

  test("batch read over the data plane equals the file-backed read byte-for-byte") {
    publish(4, None, fileLayout.map(_.length.toLong).toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("data").cast("string"),
          col("sequenceNumber"), col("subSequenceNumber"), col("shardId"),
          col("approximateArrivalTimestamp").cast("long"))
        .as[(String, String, String, Long, String, Long)]
        .collect().toSet
    val viaService = spark.read.format("sharded-replay")
      .option("path", eventsPath)
      .option("controlPlaneUrl", url).option("dataPlaneUrl", dataUrl).load()
    val viaFile = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4).load()
    assert(rows(viaService) === rows(viaFile),
      "wire-fetched envelopes must be identical to file-read ones")
  }

  test("streaming over the data plane drains exactly-once under admission control") {
    publish(4, None, fileLayout.map(_.length.toLong).toSeq)
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      maxRecordsPerTrigger = Some(300),
      controlPlaneUrl = Some(url), dataPlaneUrl = Some(dataUrl)))
    val q = ds.writeStream
      .format("memory").queryName("dp_drain")
      .option("checkpointLocation", tmpDir("ckpt_dp"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dp_drain")
    assert(got.count() === nEvents)
    assert(got.select("key").distinct().count() ===
      graft.Tables.events(spark, sf).select("user_id").distinct().count())
    assert(q.recentProgress.length > 1, "several admission-bounded batches")
  }

  test("live tail: the stream follows the service's growing counts") {
    val full = fileLayout.map(_.length.toLong).toSeq
    val half = full.map(_ / 2)
    publish(4, None, half)
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      maxRecordsPerTrigger = Some(200),
      controlPlaneUrl = Some(url), dataPlaneUrl = Some(dataUrl)))
    val q = ds.writeStream
      .format("memory").queryName("dp_tail")
      .option("checkpointLocation", tmpDir("ckpt_dp_tail"))
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def count: Long = spark.table("dp_tail").count()
      // Drain what the service admits to having...
      while (count < half.sum && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(count === half.sum, s"should idle at the served frontier, got $count")
      Thread.sleep(500) // a few idle triggers: must NOT run past the frontier
      assert(count === half.sum, "the source must not invent records")
      // ...then the stream grows server-side and the tail follows.
      publish(4, None, full)
      while (count < full.sum && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(count === full.sum, s"tail must catch up, got $count of ${full.sum}")
    } finally q.stop()
    assert(spark.table("dp_tail").count() === nEvents)
  }

  test("at_timestamp start is byte-identical between file and service backends") {
    publish(4, None, fileLayout.map(_.length.toLong).toSeq)
    def drain(sink: String, service: Boolean): Unit = {
      val base = ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        startingPosition = "at_timestamp",
        startingTimestampMs = Some(splitMs),
        maxRecordsPerTrigger = Some(500))
      val cfg =
        if (service) base.copy(controlPlaneUrl = Some(url),
          dataPlaneUrl = Some(dataUrl))
        else base
      val q = Consumer.source(cfg)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", tmpDir(s"ckpt_at_$sink"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain("at_file", service = false)
    drain("at_svc", service = true)
    def rows(name: String) = spark.table(name)
      .select(col("key"), col("data").cast("string"),
        col("sequenceNumber"), col("subSequenceNumber"), col("shardId"),
        col("approximateArrivalTimestamp").cast("long"))
      .as[(String, String, String, Long, String, Long)].collect().toSet
    val file = rows("at_file")
    val svc = rows("at_svc")
    assert(file.nonEmpty && file.size < nEvents,
      "the timestamp cut must drop some records and keep some")
    assert(svc === file,
      "service-backed at_timestamp must deliver exactly the file backend's rows")
  }

  test("two leased workers tile the stream: disjoint shards, union exactly-once") {
    leaseTable.set(Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
    publish(4, None, fileLayout.map(_.length.toLong).toSeq)
    def runWorker(worker: String, sink: String): Unit = {
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = 4,
          maxRecordsPerTrigger = Some(300),
          leaseUrl = Some(leaseUrl(worker))))
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", tmpDir(s"ckpt_lease_$worker"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // Concurrent consumer group: both workers run side by side, each
    // draining only its lease.
    val ta = new Thread(() => runWorker("a", "lease_a"))
    val tb = new Thread(() => runWorker("b", "lease_b"))
    ta.start(); tb.start(); ta.join(150000); tb.join(150000)
    val a = spark.table("lease_a")
    val b = spark.table("lease_b")
    val shardsA = a.select("shardId").distinct().as[String].collect()
      .map(_.stripPrefix("shardId-").toInt).toSet
    val shardsB = b.select("shardId").distinct().as[String].collect()
      .map(_.stripPrefix("shardId-").toInt).toSet
    assert(shardsA === Set(0, 1), s"worker a must only consume its lease: $shardsA")
    assert(shardsB === Set(2, 3), s"worker b must only consume its lease: $shardsB")
    assert(a.count() + b.count() === nEvents,
      "the group's union must be the whole stream, exactly once")
  }

  test("mid-stream lease handoff: reassigned shards resume at the old owner's commit, exactly once") {
    // The reference behavior (RecordProcessorImpl.scala:90-100): a worker
    // losing its lease stops at a checkpoint boundary; the service hands
    // the shards — WITH that final checkpoint — to the next worker, whose
    // lease poll picks them up. Sequence here: A and B each drain their
    // half of a half-served stream and stop (AvailableNow = a trigger
    // boundary); the lease table then reassigns A's shards to B, floors
    // set to A's committed positions; the stream grows to full; B's
    // restart resumes its own shards from ITS checkpoint and A's shards
    // from the handoff floors. Union must tile the stream exactly once.
    val full = fileLayout.map(_.length.toLong).toSeq
    val half = full.map(_ / 2)
    leaseTable.set(Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
    publish(4, None, half)
    val ckptB = tmpDir("ckpt_handoff_b")
    // foreachBatch sinks (the memory sink cannot recover from a
    // checkpoint, and B must RESTART on its own checkpoint after the
    // rebalance).
    def drain(worker: String, ckpt: String): Set[(Int, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = 4,
          maxRecordsPerTrigger = Some(300),
          controlPlaneUrl = Some(url), dataPlaneUrl = Some(dataUrl),
          leaseUrl = Some(leaseUrl(worker))))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], _: Long) =>
          df.select(col("shardId"), col("sequenceNumber").cast("long"))
            .as[(String, Long)].collect().foreach { case (sid, seq) =>
              got.add(sid.stripPrefix("shardId-").toInt -> seq)
            }
          ()
        }.start()
      q.awaitTermination(120000)
      import scala.jdk.CollectionConverters._
      got.iterator().asScala.toSet
    }
    val aRows = drain("a", tmpDir("ckpt_handoff_a"))
    val b1Rows = drain("b", ckptB)
    assert(aRows.map(_._1) === Set(0, 1) && b1Rows.map(_._1) === Set(2, 3))
    assert(aRows.size.toLong === half(0) + half(1),
      "A must have drained exactly the served half of its lease")
    // The rebalance: A's lease is revoked; B acquires 0,1 with floors =
    // A's final committed positions (the lease table publishes them only
    // after A's last commit — the test sequences that by construction).
    leaseTable.set(Map(
      "a" -> "shards=",
      "b" -> s"shards=0,1,2,3\npos.0=${half(0)}\npos.1=${half(1)}"))
    publish(4, None, full)
    val b2Rows = drain("b", ckptB)
    // Disjoint across the handoff: B never re-reads what A consumed…
    assert((aRows & b2Rows) === Set.empty,
      "the new owner replayed records below the handoff floor")
    assert((b1Rows & b2Rows) === Set.empty,
      "B replayed its own checkpointed records")
    // …and the union is the WHOLE stream, exactly once.
    val union = aRows ++ b1Rows ++ b2Rows
    assert(union.size.toLong === aRows.size.toLong + b1Rows.size + b2Rows.size)
    assert(union.size.toLong === nEvents,
      s"union ${union.size} of $nEvents: the group lost or duplicated records")
    // Restore the default table for any later test.
    leaseTable.set(Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
  }

  test("chaos handoff: a kill between offset-log and commit-log write replays the same batch, exactly once") {
    // The mid-stream handoff sequence above, but the new owner is
    // KILLED MID-BATCH:
    // Structured Streaming writes the offset log BEFORE running a batch
    // and the commit log after, so a sink that throws after reading its
    // rows dies exactly in the window between the two — the crash the
    // trigger-boundary handoff test never exercises. On recovery the
    // engine must re-run THAT batch from the offset log (same offset
    // range — the replayed rows are a superset-free identical set) and
    // the handoff floors must hold across the crash: nothing below a
    // floor re-read, nothing skipped, union exactly once.
    val full = fileLayout.map(_.length.toLong).toSeq
    val half = full.map(_ / 2)
    leaseTable.set(Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
    publish(4, None, half)
    val ckptB = tmpDir("ckpt_chaos_b")
    def drain(worker: String, ckpt: String): Set[(Int, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = 4,
          maxRecordsPerTrigger = Some(300),
          controlPlaneUrl = Some(url), dataPlaneUrl = Some(dataUrl),
          leaseUrl = Some(leaseUrl(worker))))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], _: Long) =>
          df.select(col("shardId"), col("sequenceNumber").cast("long"))
            .as[(String, Long)].collect().foreach { case (sid, seq) =>
              got.add(sid.stripPrefix("shardId-").toInt -> seq)
            }
          ()
        }.start()
      q.awaitTermination(120000)
      import scala.jdk.CollectionConverters._
      got.iterator().asScala.toSet
    }
    val aRows = drain("a", tmpDir("ckpt_chaos_a"))
    val b1Rows = drain("b", ckptB)
    assert(aRows.size.toLong === half(0) + half(1))
    // Rebalance: B acquires A's shards with floors = A's final commits.
    leaseTable.set(Map(
      "a" -> "shards=",
      "b" -> s"shards=0,1,2,3\npos.0=${half(0)}\npos.1=${half(1)}"))
    publish(4, None, full)
    // B restarts and is killed between offset-log and commit-log: the
    // sink reads the batch's rows, then throws.
    val killed = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val qk = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(300),
        controlPlaneUrl = Some(url), dataPlaneUrl = Some(dataUrl),
        leaseUrl = Some(leaseUrl("b"))))
      .writeStream
      .option("checkpointLocation", ckptB)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], _: Long) =>
        df.select(col("shardId"), col("sequenceNumber").cast("long"))
          .as[(String, Long)].collect().foreach { case (sid, seq) =>
            killed.add(sid.stripPrefix("shardId-").toInt -> seq)
          }
        sys.error("chaos: killed between offset-log and commit-log write")
      }.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qk.awaitTermination(120000)
      throw qk.exception.getOrElse(
        sys.error("chaos kill did not fail the query"))
    }
    import scala.jdk.CollectionConverters._
    val killedRows = killed.iterator().asScala.toSet
    assert(killedRows.nonEmpty, "the killed batch must have read rows")
    // Recovery on the same checkpoint with a healthy sink.
    val b2Rows = drain("b", ckptB)
    // The failed batch replays IDENTICALLY from the offset log…
    assert(killedRows.subsetOf(b2Rows),
      "recovery must re-deliver the killed batch's rows from the offset log")
    // …the floors hold across the crash (nothing of A's half re-read,
    // nothing of B's own checkpointed history re-read)…
    assert((aRows & b2Rows) === Set.empty,
      "the recovered owner replayed records below the handoff floor")
    assert((b1Rows & b2Rows) === Set.empty,
      "the recovered owner replayed its own checkpointed records")
    // …and the union still tiles the stream exactly once.
    val union = aRows ++ b1Rows ++ b2Rows
    assert(union.size.toLong === aRows.size.toLong + b1Rows.size + b2Rows.size)
    assert(union.size.toLong === nEvents,
      s"union ${union.size} of $nEvents after the chaos kill")
    leaseTable.set(Map("a" -> "shards=0,1", "b" -> "shards=2,3"))
  }

  test("restart revalidates the DISCOVERED instant like a configured one") {
    // Run to completion with the service announcing a split from the
    // start; then restart the same checkpoint with the service moved to a
    // DIFFERENT instant — must be rejected, not remapped.
    topology.set(s"numShards=4\nreshardAtMs=$splitMs")
    val ckpt = tmpDir("ckpt_cp_restart")
    def run(): Unit = {
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = 4,
          controlPlaneUrl = Some(url)))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    topology.set(s"numShards=4\nreshardAtMs=${splitMs + 60000}")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = 4,
          controlPlaneUrl = Some(url)))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      throw new IllegalStateException("restart must not succeed")
    }
    assert(ex.getMessage.contains("reshard") ||
      Option(ex.getCause).exists(_.getMessage.contains("reshard")),
      s"expected the instant-mismatch rejection, got: ${ex.getMessage}")
  }
}
