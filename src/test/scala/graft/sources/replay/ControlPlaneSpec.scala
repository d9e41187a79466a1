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
  private lazy val server: HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/topology", exchange => {
      val body = topology.get().getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    srv.start()
    srv
  }
  private def url = s"http://127.0.0.1:${server.getAddress.getPort}/topology"

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
