package graft.sources.replay

import graft.SparkSpec
import graft.streaming.{Consumer, ConsumerConfig, Record}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

class ShardedReplaySpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val eventsPath = s"$sf/events.parquet"
  private lazy val nEvents: Long = graft.Tables.events(spark, sf).count()
  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("batch read exposes every event exactly once across shards") {
    val df = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4).load()
    assert(df.count() === nEvents)
    assert(df.select("shardId").distinct().count() === 4)
    // event ids recovered from payloads are exactly the source's ids
    val ids = df.select(get_json_object(col("data").cast("string"), "$.event_id")
      .cast("long").as("id"))
    assert(ids.distinct().count() === nEvents)
  }

  test("per-shard ordering: sequence numbers are dense and arrival-ordered") {
    val df = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4).load()
    val bad = df.select(col("shardId"), col("sequenceNumber").cast("long").as("seq"),
        col("approximateArrivalTimestamp").as("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shardId").orderBy("seq")))
      .filter(col("prev_ts") > col("ts"))
    assert(bad.count() === 0, "arrival timestamps must be monotone per shard")
    // dense positions 0..n-1 per shard
    val dense = df.groupBy("shardId")
      .agg(count(lit(1)).as("n"), min(col("sequenceNumber").cast("long")).as("lo"),
        max(col("sequenceNumber").cast("long")).as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(dense.count() === 0, "sequence numbers must be dense per shard")
  }

  test("streaming AvailableNow delivers all records exactly once") {
    val ds = Consumer.source(ConsumerConfig(streamPath = eventsPath, numShards = 4))
    val q = Consumer.commitFlow(ds).writeStream
      .format("memory").queryName("replay_all")
      .option("checkpointLocation", tmpDir("ckpt_all"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("replay_all")
    assert(got.count() === nEvents)
  }

  test("maxRecordsPerTrigger bounds each micro-batch (admission control)") {
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4, maxRecordsPerTrigger = Some(300)))
    val q = ds.writeStream
      .format("memory").queryName("replay_limited")
      .option("checkpointLocation", tmpDir("ckpt_lim"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("replay_limited").count() === nEvents)
    val progress = q.recentProgress
    assert(progress.length > 1, "should take several micro-batches")
    assert(progress.forall(_.numInputRows <= 300),
      s"batch sizes: ${progress.map(_.numInputRows).toSeq}")
  }

  test("lagReport tracks per-shard lag to zero across the drain") {
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4, maxRecordsPerTrigger = Some(300)))
    val q = ds.writeStream
      .format("memory").queryName("replay_lag")
      .option("checkpointLocation", tmpDir("ckpt_lag"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val reports = Consumer.lagReport(q)
    assert(reports.length > 1, "should take several micro-batches")
    assert(reports.map(_.batchId) === reports.map(_.batchId).sorted)
    // Capped batches leave the consumer behind the head; the drain ends
    // caught up on every shard.
    assert(reports.head.totalLag > 0, "first capped batch must show lag")
    assert(reports.last.caughtUp,
      s"drained query must report zero lag: ${reports.last.shards}")
    assert(reports.last.shards.map(_.shard) === Seq(0, 1, 2, 3))
    // Committed frontiers never move backwards, latest never below
    // committed, and the batches read the whole stream exactly.
    reports.sliding(2).foreach {
      case Seq(a, b) =>
        a.shards.zip(b.shards).foreach { case (x, y) =>
          assert(y.committed >= x.committed) }
      case _ =>
    }
    assert(reports.forall(_.shards.forall(s => s.latest >= s.committed)))
    assert(reports.map(_.numInputRows).sum === nEvents)
  }

  test("lagReport spans the reshard universe (v2 offsets) and drains to zero") {
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      maxRecordsPerTrigger = Some(300), reshardAtMs = Some(splitMs)))
    val q = ds.writeStream
      .format("memory").queryName("replay_lag_reshard")
      .option("checkpointLocation", tmpDir("ckpt_lag_reshard"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val reports = Consumer.lagReport(q)
    assert(reports.nonEmpty)
    // Post-split offsets carry 4 parents + 8 children; the lag report
    // must parse the v2 JSON and track all 12.
    assert(reports.last.shards.map(_.shard) === (0 until 12))
    assert(reports.last.caughtUp,
      s"drained reshard query must report zero lag: ${reports.last.shards}")
    assert(reports.map(_.numInputRows).sum === nEvents)
  }

  test("restart from checkpoint resumes at the committed frontier (exactly-once)") {
    val ckpt = tmpDir("ckpt_restart")
    val out = tmpDir("out_restart")
    def run(stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4, maxRecordsPerTrigger = Some(250)))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        // Stop mid-stream once the first batch has committed.
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    run(stopEarly = true)
    val partial = spark.read.parquet(out).count()
    assert(partial < nEvents, "first run should stop before draining")
    run(stopEarly = false)
    // File sink + offset log → exactly-once end-to-end across the restart.
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id").cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once: no loss, no duplication")
    assert(got.distinct().count() === nEvents)
  }

  test("startingPosition=latest sees nothing on a static stream") {
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4, startingPosition = "latest"))
    val q = ds.writeStream
      .format("memory").queryName("replay_latest")
      .option("checkpointLocation", tmpDir("ckpt_latest"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("replay_latest").count() === 0)
  }

  test("startingPosition=at_timestamp replays only records at/after the time") {
    val cutoff = graft.Tables.events(spark, sf)
      .selectExpr("percentile_approx(cast(ts as double), 0.5)").as[Double].head()
    val cutoffMs = (cutoff * 1000).toLong
    val expected = graft.Tables.events(spark, sf)
      .filter(col("ts") >= timestamp_millis(lit(cutoffMs))).count()
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      startingPosition = "at_timestamp", startingTimestampMs = Some(cutoffMs)))
    val q = ds.writeStream
      .format("memory").queryName("replay_ts")
      .option("checkpointLocation", tmpDir("ckpt_ts"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("replay_ts").count() === expected)
  }

  test("record envelope round-trips through the typed Dataset API") {
    val ds = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 2).load().as[Record]
    val r = ds.head()
    assert(r.shardId.startsWith("shardId-"))
    assert(r.subSequenceNumber === 0L)
    assert(r.dataUtf8.contains("\"event_type\""))
    assert(r.key.nonEmpty)
  }

  test("restart with a different shard count is rejected, not silently remapped") {
    val ckpt = tmpDir("ckpt_reshard")
    val out = tmpDir("out_reshard")
    def run(shards: Int): Unit = {
      val q = Consumer.source(ConsumerConfig(
          streamPath = eventsPath, numShards = shards))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run(shards = 4)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(shards = 8)
    }
    assert(e.getMessage.contains("resharding") ||
      Option(e.getCause).exists(_.getMessage.contains("resharding")))
  }

  // ---- resharding (shard split — reference L4 shardEnded lifecycle) --------

  /** Split instant: the median event time, so parents and children both
    * hold a substantial slice.
    */
  private lazy val splitMs: Long = {
    val medianSec = graft.Tables.events(spark, sf)
      .selectExpr("percentile_approx(cast(ts as double), 0.5)").as[Double].head()
    (medianSec * 1000).toLong
  }

  test("reshard offset v2 json round-trips seals and lineage") {
    import scala.collection.immutable.{SortedMap, SortedSet}
    val off = ShardPositions(
      SortedMap(0 -> 5L, 1 -> 9L, 2 -> 0L, 4 -> 3L, 5 -> 0L),
      sealedShards = SortedSet(0, 1),
      lineage = SortedMap(4 -> Seq(0), 5 -> Seq(1)))
    assert(ShardPositions.parse(off.json()) === off)
    assert(off.gen0 === 3)
    // single-parent lineage keeps the original v2 bare-int wire form
    assert(off.json().contains(""""lineage":{"4":0,"5":1}"""))
    // merge lineage: a child with two parents round-trips as an array
    val merged = ShardPositions(
      SortedMap(0 -> 5L, 1 -> 9L, 2 -> 1L),
      sealedShards = SortedSet(0, 1),
      lineage = SortedMap(2 -> Seq(0, 1)))
    assert(ShardPositions.parse(merged.json()) === merged)
    assert(merged.json().contains(""""lineage":{"2":[0,1]}"""))
    // v1 stays v1 (existing checkpoints parse unchanged)
    val v1 = ShardPositions(SortedMap(0 -> 2L, 1 -> 7L))
    assert(v1.json() === """{"0":2,"1":7}""")
    assert(ShardPositions.parse(v1.json()) === v1)
  }

  test("reshard batch read: parents + children tile the stream exactly once") {
    val df = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4)
      .option("reshardAtMs", splitMs).load()
    assert(df.count() === nEvents)
    val ids = df.select(get_json_object(col("data").cast("string"), "$.event_id")
      .cast("long").as("id"))
    assert(ids.distinct().count() === nEvents)
    // children exist and carry the post-split records
    val shardIds = df.select("shardId").distinct().as[String].collect()
      .map(_.stripPrefix("shardId-").toInt).toSet
    assert(shardIds.exists(_ >= 4), "child shards must carry data")
  }

  test("reshard streaming: every parent seals before any of its children emits") {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      maxRecordsPerTrigger = Some(300), reshardAtMs = Some(splitMs)))
    val q = ds.writeStream
      .option("checkpointLocation", tmpDir("ckpt_seal"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], batchId: Long) =>
        df.select("shardId").distinct().collect().foreach { r =>
          batches.add(batchId -> r.getString(0).stripPrefix("shardId-").toInt)
        }
        ()
      }.start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val seen = batches.iterator().asScala.toSeq
    (0 until 4).foreach { p =>
      val lastParent = seen.filter(_._2 == p).map(_._1).maxOption
      val children = Seq(4 + p, 8 + p)
      val firstChild = seen.filter(b => children.contains(b._2)).map(_._1).minOption
      for (lp <- lastParent; fc <- firstChild)
        assert(lp < fc,
          s"parent $p last batch $lp must precede its children's first batch $fc")
    }
    assert(seen.exists(_._2 >= 4), "children must emit after the seal")
  }

  test("merge batch read: parents + merged children tile the stream exactly once") {
    val df = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4)
      .option("mergeAtMs", splitMs).load()
    assert(df.count() === nEvents)
    val ids = df.select(get_json_object(col("data").cast("string"), "$.event_id")
      .cast("long").as("id"))
    assert(ids.distinct().count() === nEvents)
    // exactly N/2 = 2 merged children carry the post-merge records
    val shardIds = df.select("shardId").distinct().as[String].collect()
      .map(_.stripPrefix("shardId-").toInt).toSet
    assert(shardIds.filter(_ >= 4) === Set(4, 5),
      s"expected merged children 4 and 5, got ${shardIds.filter(_ >= 4)}")
  }

  test("merge streaming: a child emits only after BOTH its parents seal") {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4,
      maxRecordsPerTrigger = Some(300), mergeAtMs = Some(splitMs)))
    val q = ds.writeStream
      .option("checkpointLocation", tmpDir("ckpt_merge_seal"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], batchId: Long) =>
        df.select("shardId").distinct().collect().foreach { r =>
          batches.add(batchId -> r.getString(0).stripPrefix("shardId-").toInt)
        }
        ()
      }.start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val seen = batches.iterator().asScala.toSeq
    (0 until 2).foreach { j =>
      val child = 4 + j
      val parents = Seq(j, j + 2)
      val firstChild = seen.filter(_._2 == child).map(_._1).minOption
      parents.foreach { p =>
        val lastParent = seen.filter(_._2 == p).map(_._1).maxOption
        for (lp <- lastParent; fc <- firstChild)
          assert(lp < fc,
            s"parent $p last batch $lp must precede merged child $child's first batch $fc")
      }
    }
    assert(seen.exists(_._2 >= 4), "merged children must emit after the seals")
  }

  test("restart across a merge boundary is exactly-once; v1 checkpoints evolve") {
    val ckpt = tmpDir("ckpt_merge_restart")
    val out = tmpDir("out_merge_restart")
    def run(merge: Option[Long], stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(200), mergeAtMs = merge))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    // Run 1: before the merge exists — v1 offsets, small pre-merge prefix.
    run(merge = None, stopEarly = true)
    assert(spark.read.parquet(out).count() < nEvents / 2,
      "first run must stop before the merge point for a valid evolution")
    // Run 2: the stream merged at splitMs; parent positions carry over and
    // the merged children drain the rest exactly once.
    run(merge = Some(splitMs), stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once across the merge boundary")
    assert(got.distinct().count() === nEvents)
  }

  test("a split checkpoint restarted as a merge is rejected (lineage mismatch)") {
    val ckpt = tmpDir("ckpt_kind_mismatch")
    def run(opts: Map[String, Long]): Unit = {
      var ds = spark.readStream.format("sharded-replay")
        .option("path", eventsPath).option("shards", 4)
        .option("maxRecordsPerTrigger", 200)
      opts.foreach { case (k, v) => ds = ds.option(k, v) }
      val q = ds.load().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q.awaitTermination(120000)
    }
    run(Map("reshardAtMs" -> splitMs)) // commits v2 split offsets
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Map("mergeAtMs" -> splitMs))
    }
    assert(Option(e.getCause).map(_.toString).getOrElse(e.toString)
      .contains("lineage"), s"unexpected failure: $e")
  }

  test("a checkpoint from a different reshard INSTANT is rejected, not remapped") {
    // Same geometry (split at T1 vs split at T2), so lineage matches — only
    // the recorded instant distinguishes them, and moving it relocates
    // records between parents and children (silent replay/loss).
    val ckpt = tmpDir("ckpt_instant_mismatch")
    def run(atMs: Long): Unit = {
      val q = spark.readStream.format("sharded-replay")
        .option("path", eventsPath).option("shards", 4)
        .option("maxRecordsPerTrigger", 200)
        .option("reshardAtMs", atMs)
        .load().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q.awaitTermination(120000)
    }
    run(splitMs)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(splitMs + 60000) // one minute later: same lineage, moved records
    }
    assert(Option(e.getCause).map(_.toString).getOrElse(e.toString)
      .contains("reshard at"), s"unexpected failure: $e")
  }

  test("restart across the reshard boundary is exactly-once (no loss, no dup)") {
    val ckpt = tmpDir("ckpt_resh_restart")
    val out = tmpDir("out_resh_restart")
    def run(stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(250), reshardAtMs = Some(splitMs)))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    run(stopEarly = true)
    assert(spark.read.parquet(out).count() < nEvents)
    run(stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once across the seal boundary")
    assert(got.distinct().count() === nEvents)
  }

  test("pre-reshard (v1) checkpoint evolves: restart with reshardAtMs keeps exactly-once") {
    val ckpt = tmpDir("ckpt_evolve")
    val out = tmpDir("out_evolve")
    def run(reshard: Option[Long], stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(200), reshardAtMs = reshard))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    // Run 1: the stream has not split yet — v1 offsets, small prefix only
    // (a 200-record batch stays far inside the pre-split half).
    run(reshard = None, stopEarly = true)
    assert(spark.read.parquet(out).count() < nEvents / 2,
      "first run must stop before the split point for a valid evolution")
    // Run 2: the stream split at splitMs; the v1 checkpoint's parent
    // positions carry over (pre-split prefixes are layout-identical).
    run(reshard = Some(splitMs), stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "v1→v2 evolution must not lose or duplicate")
    assert(got.distinct().count() === nEvents)
  }

  test("at-most-once: a failed batch's records are dropped, not redelivered") {
    val ckpt = tmpDir("ckpt_amo")
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(failOn: Option[Long]): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(300), deliveryMode = "at_most_once"))
      val q = ds.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Record], batchId: Long) =>
          // read the batch first (processing started), THEN fail — the
          // at-most-once window the reference's commit-before-process has
          val ids = df.select(get_json_object(col("data").cast("string"),
            "$.event_id").cast("long")).as[Long].collect()
          if (failOn.contains(batchId)) throw new RuntimeException("boom")
          ids.foreach(delivered.add)
          ()
        }.start()
      try q.awaitTermination(120000)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    }
    run(failOn = Some(1L))
    run(failOn = None)
    import scala.jdk.CollectionConverters._
    val got = delivered.iterator().asScala.toSeq
    assert(got.distinct.size === got.size, "no duplicates under at-most-once")
    assert(got.size === nEvents - 300,
      s"exactly the failed 300-record batch is lost (got ${got.size} of $nEvents)")
  }

  test("continuous ProcessingTime trigger drains and then idles on empty batches") {
    val ds = Consumer.source(ConsumerConfig(
      streamPath = eventsPath, numShards = 4, maxRecordsPerTrigger = Some(400)))
    val q = ds.writeStream.format("memory").queryName("replay_pt")
      .option("checkpointLocation", tmpDir("ckpt_pt"))
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("replay_pt").count() < nEvents &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    Thread.sleep(500) // a few empty triggers after the drain
    q.stop(); q.awaitTermination(60000)
    assert(spark.table("replay_pt").count() === nEvents, "drained exactly once")
  }

  // ---- gated admission property (reshard parent-before-child) --------------
  // Under any sequence of limited triggers over a random split universe,
  // children never advance while their parent is incomplete, prefixes stay
  // contiguous, and the stream still fully drains.
  test("gated admission: children wait for their parent's seal, then everything drains") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { trial =>
      // Alternate split geometry (child ← 1 parent) and merge geometry
      // (child ← 2 parents): the gate must hold for any parent fan-in.
      val merge = trial % 2 == 0
      val nParents = (1 + rnd.nextInt(4)) * (if (merge) 2 else 1)
      val n = if (merge) nParents + nParents / 2 else 3 * nParents
      def parentsOf(i: Int): Seq[Int] =
        if (i < nParents) Nil
        else if (merge) Seq(i - nParents, i - nParents + nParents / 2)
        else Seq((i - nParents) % nParents)
      val cnt = Array.fill(n)(rnd.nextLong(500L))
      val lims = List.fill(rnd.nextInt(10))(1L + rnd.nextLong(300L))
      var cur = ShardPositions.zeros(n)
      (lims.map(Option(_)) ++ Seq(None, None)).foreach { lim =>
        val eligible = AdmissionPlanner.gate(cur, cnt, parentsOf)
        val next = AdmissionPlanner.advance(cur, eligible, lim)
        (0 until n).foreach { i =>
          assert(next(i) >= cur(i) && next(i) <= cnt(i))
          parentsOf(i).foreach { p =>
            if (cur(p) < cnt(p))
              assert(next(i) === cur(i),
                s"child $i advanced while parent $p incomplete")
          }
        }
        cur = next
      }
      // two unlimited triggers suffice: one finishes every parent, the
      // next drains every (now unblocked) child
      (0 until n).foreach(i => assert(cur(i) === cnt(i), s"shard $i not drained"))
    }
  }

  // ---- contiguous-prefix property (reference C3 semantics) -----------------
  // The committed frontier after any sequence of limited triggers is always
  // a contiguous prefix per shard, and triggers tile [0, count) disjointly.
  test("admission planning commits contiguous per-shard prefixes, no gaps/overlap") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val nShards = 1 + rnd.nextInt(6)
      val cnt = Array.fill(nShards)(rnd.nextLong(2000L))
      val lims = List.fill(rnd.nextInt(12))(1L + rnd.nextLong(700L))
      var cur = ShardPositions.zeros(cnt.length)
      val seen = Array.fill(cnt.length)(scala.collection.mutable.Set.empty[Long])
      val allLims = lims :+ -1L // final unlimited trigger drains the stream
      allLims.foreach { lim =>
        val next = AdmissionPlanner.advance(cur, cnt,
          if (lim < 0) None else Some(lim))
        cnt.indices.foreach { i =>
          assert(next(i) >= cur(i) && next(i) <= cnt(i)) // monotone, bounded
          (cur(i) until next(i)).foreach { p =>
            assert(!seen(i)(p), s"position $p of shard $i delivered twice")
            seen(i) += p
          }
        }
        if (lim >= 0)
          assert(cnt.indices.map(i => next(i) - cur(i)).sum <= lim)
        cur = next
      }
      cnt.indices.foreach { i =>
        assert(seen(i).size.toLong === cnt(i), s"shard $i not fully drained")
      }
    }
  }

  test("KPL aggregation: runs of K records share a sequence number with dense sub-sequences") {
    val K = 3
    val df = spark.read.format("sharded-replay")
      .option("path", eventsPath).option("shards", 4)
      .option("aggregation", K).load()
    assert(df.count() === nEvents) // de-aggregation is lossless
    // Every (shard, seq) wire record holds exactly K sub-records with
    // subSequenceNumbers 0..K-1 — except the final partial aggregate.
    val groups = df.groupBy(col("shardId"), col("sequenceNumber"))
      .agg(count(lit(1)).as("n"), min("subSequenceNumber").as("lo"),
        max("subSequenceNumber").as("hi"))
      .withColumn("last_seq",
        max(col("sequenceNumber")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("shardId")))
    val bad = groups.filter(
      col("lo") =!= 0 || col("hi") =!= col("n") - 1 ||
        (col("n") =!= K && col("sequenceNumber") =!= col("last_seq")))
    assert(bad.count() === 0,
      s"non-dense aggregates:\n${bad.limit(5).collect().mkString("\n")}")
    // (seq, subSeq) ordering is the arrival ordering within each shard.
    val disorder = df.select(col("shardId"),
        col("sequenceNumber").cast("long").as("seq"),
        col("subSequenceNumber").as("sub"),
        col("approximateArrivalTimestamp").as("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shardId")
          .orderBy("seq", "sub")))
      .filter(col("prev_ts") > col("ts"))
    assert(disorder.count() === 0,
      "ExtendedSequenceNumber order must follow arrival order")
  }

  test("restart mid-aggregate resumes at the exact sub-record (exactly-once)") {
    val K = 3
    val ckpt = tmpDir("ckpt_agg")
    val out = tmpDir("out_agg")
    def run(stopEarly: Boolean): Unit = {
      // 7 records/trigger with K=3 guarantees batch boundaries INSIDE
      // aggregates — the sub-sequence-granular checkpoint case.
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(7), aggregation = K))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 2 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(600000)
    }
    run(stopEarly = true)
    val partial = spark.read.parquet(out)
    assert(partial.count() < nEvents, "first run should stop before draining")
    run(stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once across a mid-aggregate restart")
    assert(got.distinct().count() === nEvents)
  }

  test("planning from a mid-aggregate offset resumes at the exact sub-record") {
    // Drive the DSv2 contract directly with an explicit offset INSIDE an
    // aggregate (position 4 with K=3 → wire record 1, sub-record 1): the
    // next batch must start at exactly (seq 1, sub 1) — KCL's
    // ExtendedSequenceNumber restart semantics — with no loss or overlap.
    val K = 3
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", eventsPath, "shards", "1", "aggregation", K.toString))
    val conf = ReplayConfig.fromOptions(opts)
    val stream = new ShardedReplayMicroBatchStream(conf,
      tmpDir("ckpt_midagg_plan"))
    def rows(from: Long, until: Long): Seq[(String, Long)] = {
      val parts = stream.planInputPartitions(
        ShardPositions(scala.collection.immutable.SortedMap(0 -> from)),
        ShardPositions(scala.collection.immutable.SortedMap(0 -> until)))
      parts.flatMap { p =>
        val r = ReplayReaderFactory.createReader(p)
        val out = scala.collection.mutable.Buffer.empty[(String, Long)]
        while (r.next()) {
          val row = r.get()
          out += ((row.getUTF8String(2).toString, row.getLong(3)))
        }
        out.toSeq
      }.toSeq
    }
    val first = rows(0, 4)
    assert(first.map(_._2) === Seq(0L, 1L, 2L, 0L)) // last one is mid-aggregate
    val resumed = rows(4, 8)
    assert(resumed === Seq(
      ("%020d".format(1), 1L), ("%020d".format(1), 2L),
      ("%020d".format(2), 0L), ("%020d".format(2), 1L)),
      "resume must begin at (seq 1, sub 1), not re-serve or skip sub-records")
  }

  test("KPL aggregation composed with a reshard restart stays exactly-once") {
    // The nastiest option interaction in the source: sub-sequence-granular
    // offsets (aggregation = 3) AND a shard split, with a restart that —
    // 250 not being divisible by 3 — lands mid-aggregate near the seal
    // boundary. Offsets must resume at the exact sub-record in whichever
    // shard generation holds it.
    val ckpt = tmpDir("ckpt_agg_resh")
    val out = tmpDir("out_agg_resh")
    def run(stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(250), reshardAtMs = Some(splitMs),
        aggregation = 3))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    run(stopEarly = true)
    assert(spark.read.parquet(out).count() < nEvents)
    run(stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once under aggregation + reshard")
    assert(got.distinct().count() === nEvents)
    // Aggregation really was on: runs share sequence numbers with
    // sub-sequence 0..K-1.
    val subs = spark.read.parquet(out)
      .groupBy(col("sequenceNumber"))
      .agg(count(lit(1)).as("n"), max(col("subSequenceNumber")).as("mx"))
    assert(subs.filter(col("n") > 1).count() > 0, "expected aggregated runs")
    assert(subs.filter(col("mx") >= 3).count() === 0, "sub-sequence exceeds K-1")
  }

  test("KPL aggregation composed with a shard MERGE restart stays exactly-once") {
    // The merge half of the composition: a child waits for BOTH parents'
    // committed seals, and sub-sequence offsets must survive the
    // parent-pair handoff too.
    val ckpt = tmpDir("ckpt_agg_merge")
    val out = tmpDir("out_agg_merge")
    def run(stopEarly: Boolean): Unit = {
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 4,
        maxRecordsPerTrigger = Some(250), mergeAtMs = Some(splitMs),
        aggregation = 3))
      val q = ds.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      if (stopEarly) {
        val deadline = System.currentTimeMillis() + 60000
        while (q.recentProgress.length < 1 && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        q.stop(); q.awaitTermination(60000)
      } else q.awaitTermination(120000)
    }
    run(stopEarly = true)
    assert(spark.read.parquet(out).count() < nEvents)
    run(stopEarly = false)
    val got = spark.read.parquet(out)
      .select(get_json_object(col("data").cast("string"), "$.event_id")
        .cast("long").as("id"))
    assert(got.count() === nEvents, "exactly-once under aggregation + merge")
    assert(got.distinct().count() === nEvents)
  }
}
