package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Event-time streaming analytics over the replay source (SURVEY.md M5):
  * windows, watermarks, streaming dedup. Each result is checked against the
  * equivalent batch computation on the same data — the streaming answer on a
  * drained bounded stream must equal the batch answer.
  */
class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val eventsPath = s"$sf/events.parquet"
  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def decoded() =
    StreamingOps.decode(Consumer.source(ConsumerConfig(eventsPath, numShards = 4)))

  test("tumbling window counts equal the batch computation") {
    val q = StreamingOps.tumblingCounts(decoded(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt_win"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("win_counts")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val want = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    // Append mode emits only windows closed by the final watermark; every
    // emitted window must match batch exactly, and most windows must emit.
    val joined = got.as("g").join(want.as("w"), Seq("ws", "event_type"))
    assert(joined.filter(col("g.n") =!= col("w.n")).count() === 0)
    assert(got.count() > want.count() / 2, "most windows should have closed")
    assert(got.groupBy("ws", "event_type").count().filter(col("count") > 1).count() === 0,
      "no window emitted twice")
  }

  test("observed metrics surface per batch and sum to the batch truth") {
    val q = StreamingOps.observed(decoded())
      .writeStream.format("memory").queryName("observed_stream")
      .option("checkpointLocation", tmp("ckpt_obs"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("graft")))
    assert(rows.nonEmpty, "observe() metrics must appear in progress")
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_records")).sum === nEvents)
    assert(rows.map(_.getAs[Long]("n_null_ids")).sum === 0L)
    val batchSum = graft.Tables.events(spark, sf)
      .agg(sum(col("value"))).as[Double].head()
    val streamSum = rows.map(_.getAs[Double]("value_sum")).sum
    assert(math.abs(streamSum - batchSum) < 1e-6,
      s"value_sum $streamSum must equal batch $batchSum")
  }

  test("streaming signature dedup keeps one doc per simhash within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.Native.register(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // three distinct texts; the first appears three times (re-crawl)
    input.addData(
      (1L, "alpha beta gamma delta", t0),
      (2L, "alpha beta gamma delta", t0),
      (3L, "totally different words here", t0),
      (4L, "alpha beta gamma delta", t0),
      (5L, "and a third unique document", t0))
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps.dedupNearBySignature(docs, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sig_dedup")
      .option("checkpointLocation", tmp("ckpt_sigdedup"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val kept = spark.table("sig_dedup")
    assert(kept.count() === 3, "one survivor per distinct signature")
    assert(kept.select("sig").distinct().count() === 3)
    // survivors cover all three distinct texts
    assert(kept.select("text").distinct().count() === 3)
  }

  test("gatedWrite passes clean data through and trips on a poisoned batch") {
    // clean stream: every event value is finite and ids are present
    val out = new java.util.concurrent.atomic.AtomicLong(0)
    val clean = StreamingOps.gatedWrite(
      StreamingOps.decode(Consumer.source(
        ConsumerConfig(eventsPath, numShards = 4))),
      Seq("null_id" -> col("event_id").isNull,
        "negative_value" -> (col("value") < -1e18)),
      tmp("ckpt_gate_ok"),
      Trigger.AvailableNow()) { (batch, _) => out.addAndGet(batch.count()); () }
    clean.awaitTermination(120000)
    assert(out.get() === nEventsLocal, "clean stream must fully publish")
    // a rule every row violates: the gate must stop the query by name
    val gated = StreamingOps.gatedWrite(
      StreamingOps.decode(Consumer.source(
        ConsumerConfig(eventsPath, numShards = 4))),
      Seq("impossible_bound" -> (col("value") < 1e18)),
      tmp("ckpt_gate_bad"),
      Trigger.AvailableNow()) { (_, _) => () }
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gated.awaitTermination(120000); gated.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("data gate tripped")),
      s"unexpected failure: ${messages(err).mkString(" | ")}")
  }

  private lazy val nEventsLocal: Long = graft.Tables.events(spark, sf).count()

  /** Median event time — the reshard/merge instant both compose tests use. */
  private lazy val medianMs: Long = (graft.Tables.events(spark, sf)
    .selectExpr("percentile_approx(cast(ts as double), 0.5)").as[Double].head()
    * 1000).toLong

  /** Shared harness: drain a (possibly resharded) stream through tumbling
    * windows and compare every closed window against the batch answer.
    */
  private def assertTumblingEqualsBatch(name: String,
      config: ConsumerConfig): Unit = {
    val ds = StreamingOps.decode(Consumer.source(config))
    val q = StreamingOps.tumblingCounts(ds, "1 hour", "2 hours")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmp(s"ckpt_$name"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val want = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = got.as("g").join(want.as("w"), Seq("ws", "event_type"))
    assert(joined.filter(col("g.n") =!= col("w.n")).count() === 0)
    assert(got.count() > want.count() / 2, "most windows should have closed")
  }

  test("tumbling window counts over a RESHARDED stream equal the batch computation") {
    // Resharding must compose with event-time aggregation: parents carry
    // the pre-split events and drain first, children carry the post-split
    // tail — the watermark advances monotonically across the seal.
    assertTumblingEqualsBatch("win_counts_reshard", ConsumerConfig(
      eventsPath, numShards = 4, maxRecordsPerTrigger = Some(400),
      reshardAtMs = Some(medianMs)))
  }

  test("tumbling window counts over a MERGED stream equal the batch computation") {
    // The merge direction of resharding composes the same way: both
    // parents of each merged child drain fully before the child's tail.
    assertTumblingEqualsBatch("win_counts_merge", ConsumerConfig(
      eventsPath, numShards = 4, maxRecordsPerTrigger = Some(400),
      mergeAtMs = Some(medianMs)))
  }

  test("session windows per user equal the batch session computation") {
    val q = StreamingOps.sessionCounts(decoded(), "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt_sess"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sess_counts")
      .select(col("session_window.start").as("ss"), col("user_id"), col("n_events"))
    val want = graft.Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("ss"), col("user_id"), col("n_events"))
    val joined = got.as("g").join(want.as("w"), Seq("ss", "user_id"))
    assert(joined.filter(col("g.n_events") =!= col("w.n_events")).count() === 0)
    assert(got.count() > 0)
  }

  test("dropDuplicatesWithinWatermark removes replayed records") {
    // Duplicate the stream by unioning it with itself: every event arrives
    // twice; streaming dedup must restore exactly-once.
    val doubled = decoded().union(decoded())
    val q = StreamingOps.dedupWithinWatermark(doubled, "2 hours")
      .writeStream.format("memory").queryName("dedup_stream")
      .option("checkpointLocation", tmp("ckpt_dedup"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = graft.Tables.events(spark, sf).count()
    assert(spark.table("dedup_stream").count() === total)
    assert(spark.table("dedup_stream").select("event_id").distinct().count() === total)
  }

  test("stream-static enrichment join matches the batch join and keeps all rows") {
    val dim = spark.range(0, 10000).toDF("user_id")
      .withColumn("tier", when(col("user_id") % 3 === 0, "gold")
        .when(col("user_id") % 3 === 1, "silver").otherwise("bronze"))
    val q = StreamingOps.enrichWithStatic(decoded(), dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .option("checkpointLocation", tmp("ckpt_enrich"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("enriched")
    val want = graft.Tables.events(spark, sf)
      .join(dim, Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-stream interval join matches the batch range join") {
    // Two independent instances of the source feed the two join sides.
    val q = StreamingOps.clickAttribution(decoded(), "2 hours")
      .writeStream.format("memory").queryName("attrib")
      .option("checkpointLocation", tmp("ckpt_ssj"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("attrib").select("purchase_id", "click_id")
    val ev = graft.Tables.events(spark, sf)
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts")),
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
      .select("purchase_id", "click_id")
    assert(got.count() === want.count(), "same match count as batch")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("left-outer stream-stream join: matches equal batch, unmatched only past watermark") {
    val q = StreamingOps.clickAttributionOuter(decoded(), "2 hours")
      .writeStream.format("memory").queryName("attrib_outer")
      .option("checkpointLocation", tmp("ckpt_ssj_outer"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("attrib_outer")
    val ev = graft.Tables.events(spark, sf)
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts")),
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"),
        "left_outer")
    // Matched rows: identical to the batch left join's matched half.
    val gm = got.filter(col("click_id").isNotNull).select("purchase_id", "click_id")
    val wm = want.filter(col("click_id").isNotNull).select("purchase_id", "click_id")
    assert(gm.exceptAll(wm).count() === 0 && wm.exceptAll(gm).count() === 0)
    // Unmatched: only provably-unmatched purchases emit — a SUBSET of the
    // batch unmatched (tail rows still inside the final watermark horizon
    // stay unemitted), and plenty must have emitted across the span.
    val gu = got.filter(col("click_id").isNull).select("purchase_id")
    val wu = want.filter(col("click_id").isNull).select("purchase_id")
    assert(gu.exceptAll(wu).count() === 0,
      "streaming emitted an unmatched purchase the batch join matched")
    assert(gu.count() > 0, "watermark never released any unmatched purchase")
    assert(gu.count() <= wu.count())
  }

  test("stateful sessionization matches batch session_window semantics") {
    val q = StreamingOps.sessionizeStateful(decoded(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_state")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt_fmgs"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("sess_state")
      .select(col("user_id"), timestamp_micros(col("session_start_us")).as("ss"),
        col("n_events"), round(col("value_sum"), 6).as("v"))
    val want = graft.Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("v"))
      .select(col("user_id"), col("session_window.start").as("ss"),
        col("n_events"), col("v"))
    // Every emitted session must match a batch session exactly; sessions
    // still open at end-of-stream are not emitted (append semantics).
    val mismatched = got.as("g").join(want.as("w"), Seq("user_id", "ss"))
      .filter(col("g.n_events") =!= col("w.n_events") || col("g.v") =!= col("w.v"))
    assert(mismatched.count() === 0)
    assert(got.join(want, Seq("user_id", "ss"), "left_anti").count() === 0,
      "no emitted session absent from batch truth")
    assert(got.count() > want.count() / 2, "most sessions should have closed")
  }

  test("transformWithState sessionization equals flatMapGroupsWithState") {
    // The Spark-4 stateful API needs the RocksDB state store provider.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.sessionizeTws(decoded(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_tws")
        .outputMode("append")
        .option("checkpointLocation", tmp("ckpt_tws"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      val got = spark.table("sess_tws")
        .select(col("user_id"), timestamp_micros(col("session_start_us")).as("ss"),
          col("n_events"), round(col("value_sum"), 6).as("v"))
      val want = graft.Tables.events(spark, sf)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("v"))
        .select(col("user_id"), col("session_window.start").as("ss"),
          col("n_events"), col("v"))
      assert(got.join(want, Seq("user_id", "ss"), "left_anti").count() === 0,
        "every emitted session matches batch truth")
      val matched = got.as("g").join(want.as("w"), Seq("user_id", "ss"))
        .filter(col("g.n_events") =!= col("w.n_events") || col("g.v") =!= col("w.v"))
      assert(matched.count() === 0)
      assert(got.count() > 0)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stateless pipeline operators (gopherFilter) run unchanged on a stream") {
    // The training-data quality filter is a pure per-row projection, so it
    // composes with any streaming source: filtering a streamed corpus must
    // give exactly the batch answer.
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    ms.addData(docs)
    val filtered = graft.operators.TextAnalysis.gopherFilter(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = filtered.writeStream.format("memory").queryName("gopher_stream")
      .option("checkpointLocation", tmp("ckpt_gopher")).start()
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination(60000) }
    val streamed = spark.table("gopher_stream")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
    val batch = graft.operators.TextAnalysis.gopherFilter(
        graft.Tables.documents(spark, sf), "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
    assert(streamed === batch)
    assert(batch.exists(_._2) && batch.exists(!_._2)) // both classes present
  }

  test("deterministic sampling and split assignment run unchanged on a stream") {
    // md5-draw operators are pure per-row expressions: streamed decisions
    // must equal the batch decisions row for row — the property that lets
    // an ingest stream pre-assign splits/samples consistently with any
    // later batch rebuild.
    import graft.operators.PipelineOps
    val ids = (0L until 2000L).toVector
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    ms.addData(ids)
    val decided = ms.toDF().toDF("id").select($"id",
      PipelineOps.weightedSamplePredicate($"id", lit(20000)).as("keep"),
      PipelineOps.splitAssign($"id",
        Seq("train" -> 205, "val" -> 25, "test" -> 26)).as("split"))
    val q = decided.writeStream.format("memory").queryName("draws_stream")
      .option("checkpointLocation", tmp("ckpt_draws")).start()
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination(60000) }
    val streamed = spark.table("draws_stream")
      .as[(Long, Boolean, String)].collect().toSet
    val batch = ids.toDF("id").select($"id",
        PipelineOps.weightedSamplePredicate($"id", lit(20000)).as("keep"),
        PipelineOps.splitAssign($"id",
          Seq("train" -> 205, "val" -> 25, "test" -> 26)).as("split"))
      .as[(Long, Boolean, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.count(_._2) > 0)
    assert(streamed.map(_._3) === Set("train", "val", "test"))
  }

  test("hstScore streams live anomaly scores equal to the batch scan, across a restart") {
    // The linear-cost outlier scorer's streaming face: a batch-trained
    // HstModel is pure literal metadata, so scoring is a stateless map —
    // stream scores must equal the batch scores row for row, and a NEW
    // query over the same checkpoint must resume scoring data that
    // arrived while it was down (zero state to rebuild).
    import graft.operators.Similarity
    val e = graft.Tables.embeddings(spark, sf)
    val dims = Seq(col("embedding").getItem(0), col("embedding").getItem(1))
    val model = Similarity.hstFit(e, "vec_id", dims, depth = 6)
    val rows = e.select(col("vec_id"),
        col("embedding").getItem(0).cast("double"),
        col("embedding").getItem(1).cast("double"))
      .as[(Long, Double, Double)].collect().toSeq
    val (half1, half2) = rows.splitAt(rows.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Double)](spark)
    val ckpt = tmp("ckpt_hst")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def scoredStream = Similarity.hstScore(
      ms.toDF().toDF("vec_id", "x", "y"), "vec_id", Seq($"x", $"y"), model)
    def start() = scoredStream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1))))
      }.start()
    val q1 = start()
    try { ms.addData(half1); q1.processAllAvailable() }
    finally { q1.stop(); q1.awaitTermination(60000) }
    // Data lands while the query is down; the restarted query picks it up.
    ms.addData(half2)
    val q2 = start()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination(60000) }
    import scala.jdk.CollectionConverters._
    val streamed = buf.asScala.toMap
    val batch = Similarity.hstScore(e, "vec_id", dims, model)
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }

  test("hammingAdmit streams admission decisions equal to batch, across a restart") {
    // The online half of the dedup pipeline: a batch-built banded index
    // filters incoming documents with broadcast joins + row-local
    // exists() — zero state, so streamed decisions must equal the batch
    // run row for row and a restarted query must pick up rows that
    // arrived while it was down.
    import graft.operators.Dedup
    val sh = Dedup.simhash(graft.Tables.documents(spark, sf),
      "doc_id", "text")
    val index = Dedup.hammingIndex(sh.filter(col("doc_id") < 300),
      "doc_id", "simhash", bands = 4, bandBits = 8).localCheckpoint()
    val incoming = sh.filter(col("doc_id") >= 300)
      .as[(Long, Long)].collect().toSeq
    val (half1, half2) = incoming.splitAt(incoming.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](spark)
    val ckpt = tmp("ckpt_admit")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    def admittedStream = Dedup.hammingAdmit(
      ms.toDF().toDF("doc_id", "simhash"), "simhash", index,
      bands = 4, bandBits = 8, maxHamming = 3)
    def start() = admittedStream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        d.select(col("doc_id"), col("admitted")).collect()
          .foreach(r => buf.add((r.getLong(0), r.getBoolean(1))))
      }.start()
    val q1 = start()
    try { ms.addData(half1); q1.processAllAvailable() }
    finally { q1.stop(); q1.awaitTermination(60000) }
    ms.addData(half2)
    val q2 = start()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination(60000) }
    import scala.jdk.CollectionConverters._
    val streamed = buf.asScala.toMap
    val batch = Dedup.hammingAdmit(sh.filter(col("doc_id") >= 300),
        "simhash", index, bands = 4, bandBits = 8, maxHamming = 3)
      .select(col("doc_id"), col("admitted"))
      .as[(Long, Boolean)].collect().toMap
    assert(streamed === batch)
    // Both decision classes genuinely occur on the fixture.
    assert(batch.values.exists(identity) && batch.values.exists(!_))
  }

  test("hammingAdmissionSink grows its own index across batches and a restart") {
    // The online dedup pipeline composed end to end: admitted rows fold
    // into the index, so later near-dups of ADMITTED STREAM rows are
    // rejected too; the sink is the state, so a restarted query resumes
    // from exactly the admitted set it wrote.
    import graft.operators.Dedup
    val sh = Dedup.simhash(graft.Tables.documents(spark, sf),
      "doc_id", "text").localCheckpoint()
    val ref = sh.filter(col("doc_id") < 100)
    val incoming = sh.filter(col("doc_id") >= 100)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val batches = Seq(incoming.slice(0, 120), incoming.slice(120, 250),
      incoming.drop(250))
    val out = tmp("admit_out")
    val ckpt = tmp("ckpt_admit_sink")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](spark)
    def start() = Dedup.hammingAdmissionSink(
      ms.toDF().toDF("doc_id", "simhash"), "doc_id", "simhash",
      ref, out, ckpt, bands = 4, bandBits = 8, maxHamming = 3)
    val q1 = start()
    try { ms.addData(batches(0)); q1.processAllAvailable() }
    finally { q1.stop(); q1.awaitTermination(60000) }
    // Restart between batches; one batch lands while the query is down.
    ms.addData(batches(1))
    val q2 = start()
    try { q2.processAllAvailable(); ms.addData(batches(2))
      q2.processAllAvailable() }
    finally { q2.stop(); q2.awaitTermination(60000) }
    val streamed = spark.read.parquet(out)
      .select(col("doc_id"), col("simhash"))
      .as[(Long, Long)].collect().toSet
    // Reference fold: per batch, a distributed hammingAdmit against
    // reference ∪ previously-admitted, exactly the pipeline's contract.
    var state = ref
    var expect = Set.empty[(Long, Long)]
    for (b <- batches) {
      val idx = Dedup.hammingIndex(state, "doc_id", "simhash", 4, 8)
      val adm = Dedup.hammingAdmit(b.toDF("doc_id", "simhash"),
          "simhash", idx, 4, 8, 3)
        .filter(col("admitted")).drop("admitted")
        .as[(Long, Long)].collect().toSet
      expect ++= adm
      state = state.unionByName(adm.toSeq.toDF("doc_id", "simhash"))
        .localCheckpoint()
    }
    assert(streamed === expect)
    // Self-maintenance is load-bearing: some row admitted against the
    // static reference alone is REJECTED by the growing index (a
    // near-dup of an earlier admitted stream row).
    val refOnly = Dedup.hammingAdmit(incoming.toDF("doc_id", "simhash"),
        "simhash", Dedup.hammingIndex(ref, "doc_id", "simhash", 4, 8),
        4, 8, 3)
      .filter(col("admitted")).drop("admitted")
      .as[(Long, Long)].collect().toSet
    assert(streamed.subsetOf(refOnly) && streamed.size < refOnly.size,
      s"expected the growing index to reject extra rows " +
        s"(${streamed.size} vs ${refOnly.size})")
    // The maintained index holds exactly the trailing two compactions
    // (the engine can only replay the LAST batch; older folds are GC'd).
    val uptoDirs = new java.io.File(s"$out/_index").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(uptoDirs.exists(_.startsWith("upto=")) && uptoDirs.size <= 2,
      s"expected at most the trailing two compactions, got $uptoDirs")
  }

  test("cosineAdmissionSink grows its own index across batches and a restart") {
    // The embedding half of the online dedup pipeline: admitted vectors
    // fold into the per-cluster IVF index, so later near-dups of
    // ADMITTED STREAM rows are rejected too; the sink is the state, so a
    // restarted query resumes from exactly the admitted set it wrote.
    // nprobe = K keeps every decision exact, so the whole run must equal
    // a batch-by-batch cosineAdmit fold bit for bit.
    import graft.operators.Dedup
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val seeds = e.filter(col("vec_id") < 16)
    val ref = e.filter(col("vec_id") < 100)
    val incoming = e.filter(col("vec_id") >= 100)
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val batches = Seq(incoming.slice(0, 140), incoming.slice(140, 280),
      incoming.drop(280))
    val out = tmp("cos_admit_out")
    val ckpt = tmp("ckpt_cos_admit_sink")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    def start() = Dedup.cosineAdmissionSink(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      ref, seeds, out, ckpt, threshold = 0.4, nprobe = 16)
    val q1 = start()
    try { ms.addData(batches(0)); q1.processAllAvailable() }
    finally { q1.stop(); q1.awaitTermination(60000) }
    // Restart between batches; one batch lands while the query is down.
    ms.addData(batches(1))
    val q2 = start()
    try { q2.processAllAvailable(); ms.addData(batches(2))
      q2.processAllAvailable() }
    finally { q2.stop(); q2.awaitTermination(60000) }
    val streamed = spark.read.parquet(out)
      .select(col("vec_id")).as[Long].collect().toSet
    // Reference fold: per batch, a distributed cosineAdmit against
    // reference ∪ previously-admitted, exactly the pipeline's contract.
    var state = ref
    var expect = Set.empty[Long]
    for (b <- batches) {
      val idx = Dedup.cosineIndex(state, seeds, "vec_id", "embedding")
      val adm = Dedup.cosineAdmit(b.toDF("vec_id", "embedding"),
          "embedding", idx, seeds, "vec_id", "embedding", 0.4, 16)
        .filter(col("admitted")).drop("admitted")
      expect ++= adm.select(col("vec_id")).as[Long].collect()
      state = state.unionByName(adm).localCheckpoint()
    }
    assert(streamed === expect)
    // Self-maintenance is load-bearing: some row admitted against the
    // static reference alone is REJECTED by the growing index.
    val refOnly = Dedup.cosineAdmit(incoming.toDF("vec_id", "embedding"),
        "embedding", Dedup.cosineIndex(ref, seeds, "vec_id", "embedding"),
        seeds, "vec_id", "embedding", 0.4, 16)
      .filter(col("admitted")).select(col("vec_id"))
      .as[Long].collect().toSet
    assert(streamed.subsetOf(refOnly) && streamed.size < refOnly.size,
      s"expected the growing index to reject extra rows " +
        s"(${streamed.size} vs ${refOnly.size})")
    // The maintained index holds at most the trailing two compactions.
    val uptoDirs = new java.io.File(s"$out/_index").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(uptoDirs.exists(_.startsWith("upto=")) && uptoDirs.size <= 2,
      s"expected at most the trailing two compactions, got $uptoDirs")
  }

  test("hammingAdmissionSink per-trigger reads are bounded by Δ + index, not admitted-so-far") {
    // The maintained index (r11 verdict Next #2): batch 0 indexes the
    // reference ONCE; afterwards a trigger reads only its own Δ plus
    // the compacted index, whose row count is bounded by
    // bands · 2^bandBits (= 64 here) regardless of how much was ever
    // admitted. With a 4000-row reference over three triggers, the old
    // rebuild-every-trigger sink read ≥ 3 × 4000 reference rows (plus
    // all accumulated admitted parquet); the maintained sink reads the
    // reference once. Records-read are attributed to THIS query via its
    // runId job group, so parallel suites can't pollute the count.
    import graft.operators.Dedup
    val nRef = 4000
    val ref = (0 until nRef)
      .map(i => (i.toLong, i.toLong * 2654435761L))
      .toDF("doc_id", "simhash").localCheckpoint()
    val batches = (nRef until nRef + 90)
      .map(i => (i.toLong, i.toLong * 2654435761L + 1L))
      .grouped(30).toSeq
    val out = tmp("admit_out_io")
    val ckpt = tmp("ckpt_admit_io")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](spark)
    @volatile var runId: String = null
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val reads = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null && runId != null && g.contains(runId))
          js.stageIds.foreach(i => stages.add(i))
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (stages.contains(te.stageId) && te.taskMetrics != null)
          reads.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val q = Dedup.hammingAdmissionSink(
        ms.toDF().toDF("doc_id", "simhash"), "doc_id", "simhash",
        ref, out, ckpt, bands = 4, bandBits = 4, maxHamming = 2)
      runId = q.runId.toString
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally { q.stop(); q.awaitTermination(60000) }
      Thread.sleep(1000) // listener events are delivered asynchronously
      val total = reads.get()
      // Rebuild-per-trigger would read the reference on all three
      // triggers (≥ 12000 records); the maintained index reads it once.
      // Generous slack covers the Δs, the ≤64-row compaction reads, and
      // cached-block re-reads of the per-trigger checkpoints.
      assert(total > 0L, "listener attributed no reads to the query")
      assert(total < 2L * nRef,
        s"per-trigger reads grew with admitted-so-far: $total records " +
          s"read over 3 triggers vs a $nRef-row reference")
      // All three batch directories landed.
      val batchDirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName)
        .filter(_.matches("batch=\\d+")).toSet
      assert(batchDirs === Set("batch=0", "batch=1", "batch=2"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("decode recovers every typed event field from payload bytes") {
    val q = decoded().writeStream.format("memory").queryName("decoded_all")
      .option("checkpointLocation", tmp("ckpt_dec"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("decoded_all")
    val want = graft.Tables.events(spark, sf)
    assert(got.count() === want.count())
    // Spot-check: per-type counts and value sums match the batch table.
    val g = got.groupBy("event_type").agg(count(lit(1)).as("n"),
      round(sum("value"), 6).as("v")).orderBy("event_type").collect()
    val w = want.groupBy("event_type").agg(count(lit(1)).as("n"),
      round(sum("value"), 6).as("v")).orderBy("event_type").collect()
    assert(g.toSeq === w.toSeq)
    // props JSON survived the envelope round-trip
    assert(got.filter(col("props.k").isNotNull).count() > 0)
  }

  test("streaming heavy hitters keep hot keys with valid bounds across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[String](spark)
      // Per batch: two hot keys (30 hits each) drowned in 20 one-off keys.
      def batch(n: Int): Seq[String] =
        (1 to 60).map(i => s"hot${i % 2}") ++ (1 to 20).map(i => s"rare_${n}_$i")
      ms.addData(batch(1))
      val out = StreamingOps.heavyHittersStream(ms.toDF().toDF("k"), "k",
        capacity = 4, shards = 2)
      val q = out.writeStream.format("memory").queryName("hh_stream")
        .outputMode("update")
        .option("checkpointLocation", tmp("ckpt_hh")).start()
      try {
        q.processAllAvailable()
        ms.addData(batch(2)); q.processAllAvailable()
        ms.addData(batch(3)); q.processAllAvailable()
      } finally { q.stop(); q.awaitTermination(60000) }
      val rows = spark.table("hh_stream")
        .as[StreamingOps.HHCandidate].collect().toSeq
      // Latest emission per shard (a shard's batch counter only advances
      // on batches that routed rows to it).
      val finalRows = rows.groupBy(_.shard).flatMap { case (_, rs) =>
        val last = rs.map(_.batches).max
        rs.filter(_.batches == last)
      }.toSeq
      // True count 90 each; shard substream N <= 210, so the MG threshold
      // N/(capacity+1) <= 42 < 90 guarantees presence; bounds must bracket.
      for (h <- Seq("hot0", "hot1")) {
        val c = finalRows.find(_.key == h)
        assert(c.isDefined, s"$h missing from final candidates: $finalRows")
        assert(c.get.est_min <= 90 && 90 <= c.get.est_max, s"$h bounds: $c")
      }
      // Every emission is capacity-bounded.
      rows.groupBy(r => (r.shard, r.batches)).foreach { case (g, rs) =>
        assert(rs.size <= 4, s"shard/batch $g emitted ${rs.size} candidates")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming heavy-hitter state survives a restart from the checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[String](spark)
      def batch(n: Int): Seq[String] =
        (1 to 30).map(_ => "hot") ++ (1 to 10).map(i => s"rare_${n}_$i")
      val ckpt = tmp("ckpt_hh_restart")
      val out = StreamingOps.heavyHittersStream(ms.toDF().toDF("k"), "k",
        capacity = 4, shards = 1)
      // The memory sink refuses checkpoint recovery — collect emissions
      // through foreachBatch (which supports it) into per-run buffers.
      def sinkTo(buf: java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.HHCandidate]) =
        out.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (d: org.apache.spark.sql.Dataset[StreamingOps.HHCandidate], _: Long) =>
              d.collect().foreach(buf.add)
          }

      val run1 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.HHCandidate]()
      val q1 = sinkTo(run1).start()
      try {
        ms.addData(batch(1)); q1.processAllAvailable()
        ms.addData(batch(2)); q1.processAllAvailable()
      } finally { q1.stop(); q1.awaitTermination(60000) }
      assert(run1.size > 0)

      // Data arriving while the query is down, then a NEW query over the
      // same checkpoint: the sketch must resume, not restart.
      ms.addData(batch(3))
      val run2 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.HHCandidate]()
      val q2 = sinkTo(run2).start()
      try q2.processAllAvailable()
      finally { q2.stop(); q2.awaitTermination(60000) }

      import scala.jdk.CollectionConverters._
      val rows = run2.asScala.toSeq
      assert(rows.nonEmpty)
      // The run-2 sink holds only post-restart emissions; their batch
      // counter proves the persisted state absorbed batches 1-2.
      assert(rows.forall(_.batches == 3), s"state did not resume: $rows")
      val hot = rows.find(_.key == "hot")
      assert(hot.isDefined)
      assert(hot.get.est_min <= 90 && 90 <= hot.get.est_max,
        s"bounds must bracket the THREE-batch total: $hot")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("latestPerKeyStream maintains the current view as an idempotent change feed") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String)](spark)
      val ckpt = tmp("ckpt_kv")
      val out = StreamingOps.latestPerKeyStream(
        ms.toDF().toDF("k", "ord", "tie", "payload"), "k", "ord", "tie",
        "payload")
      def sinkTo(buf: java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.KvUpdate]) =
        out.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (d: org.apache.spark.sql.Dataset[StreamingOps.KvUpdate], _: Long) =>
              d.collect().foreach(buf.add)
          }
      import scala.jdk.CollectionConverters._

      val run1 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.KvUpdate]()
      val q1 = sinkTo(run1).start()
      val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
      try {
        val b1 = Seq((1L, 10L, 1L, "a1"), (2L, 10L, 2L, "b1"))
        all ++= b1; ms.addData(b1); q1.processAllAvailable()
        // batch 2: key 1 advances; key 2 gets a STALE row (absorbed, no
        // emission); a replay of key 1's batch-1 row rides along too
        val b2 = Seq((1L, 20L, 3L, "a2"), (2L, 5L, 4L, "bstale"),
          (1L, 10L, 1L, "a1"))
        all ++= b2; ms.addData(b2); q1.processAllAvailable()
      } finally { q1.stop(); q1.awaitTermination(60000) }
      val r1 = run1.asScala.toSeq
      assert(r1.count(_.key == 1L) === 2, s"key 1 changed twice: $r1")
      assert(r1.count(_.key == 2L) === 1,
        s"stale+replay rows must not re-emit key 2: $r1")

      // restart over the same checkpoint: only a genuinely newer version
      // emits; the pre-restart state decides what "newer" means
      val b3 = Seq((2L, 30L, 5L, "b2"), (1L, 15L, 6L, "aold"))
      all ++= b3; ms.addData(b3)
      val run2 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.KvUpdate]()
      val q2 = sinkTo(run2).start()
      try q2.processAllAvailable()
      finally { q2.stop(); q2.awaitTermination(60000) }
      val r2 = run2.asScala.toSeq
      assert(r2.map(u => (u.key, u.payload)) === Seq((2L, "b2")),
        s"only key 2 advanced past the persisted state: $r2")

      // applying the change feed (last emission per key) reproduces the
      // batch latestPerKey over everything that ever arrived
      val feedView = (r1 ++ r2).groupBy(_.key).map { case (k, us) =>
        val w = us.maxBy(u => (u.ord, u.tie))
        (k, w.ord, w.tie, w.payload)
      }.toSet
      val batchView = graft.operators.Profile.latestPerKey(
          all.toSeq.toDF("k", "ord", "tie", "payload"), "k", Seq("ord", "tie"),
          Seq("payload"))
        .as[(Long, Long, Long, String)].collect().toSet
      assert(feedView === batchView)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
  test("dedupStream emits one survivor per key, absorbs replays, resumes from checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)](spark)
      val ckpt = tmp("ckpt_dedup")
      val out = StreamingOps.dedupStream(
        ms.toDF().toDF("k", "payload"), "k", "payload")
      def sinkTo(buf: java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.DedupSurvivor]) =
        out.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (d: org.apache.spark.sql.Dataset[StreamingOps.DedupSurvivor], _: Long) =>
              d.collect().foreach(buf.add)
          }
      import scala.jdk.CollectionConverters._

      val run1 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.DedupSurvivor]()
      val q1 = sinkTo(run1).start()
      try {
        // a duplicated IN-batch, b once
        ms.addData(Seq(("a", "pa"), ("b", "pb"), ("a", "pa")))
        q1.processAllAvailable()
        // a replayed ACROSS batches, c new
        ms.addData(Seq(("a", "pa"), ("c", "pc")))
        q1.processAllAvailable()
      } finally { q1.stop(); q1.awaitTermination(60000) }
      val r1 = run1.asScala.toSeq
      assert(r1.map(s => (s.key, s.payload)).sorted ===
        Seq(("a", "pa"), ("b", "pb"), ("c", "pc")),
        s"each key exactly once: $r1")

      // restart over the same checkpoint: the persisted seen-set decides
      ms.addData(Seq(("b", "pb"), ("d", "pd")))
      val run2 = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.DedupSurvivor]()
      val q2 = sinkTo(run2).start()
      try q2.processAllAvailable()
      finally { q2.stop(); q2.awaitTermination(60000) }
      val r2 = run2.asScala.toSeq
      assert(r2.map(s => (s.key, s.payload)) === Seq(("d", "pd")),
        s"replayed b must stay absorbed after restart: $r2")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("hllStream registers fold to exactly the batch registers of the union") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val m = 64
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long](spark)
      def batch(n: Int): Seq[Long] = (1 to 400).map(i => (i.toLong * 131 * n) % 50021L)
      ms.addData(batch(1))
      val out = StreamingOps.hllStream(ms.toDF().toDF("k"), "k", m)
      val q = out.writeStream.format("memory").queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", tmp("ckpt_hll")).start()
      try {
        q.processAllAvailable()
        ms.addData(batch(2)); q.processAllAvailable()
        ms.addData(batch(3)); q.processAllAvailable()
      } finally { q.stop(); q.awaitTermination(60000) }

      val live = spark.table("hll_stream")
        .as[StreamingOps.HllRegUpdate].collect()
        .groupBy(_.j).map { case (j, us) => j -> us.maxBy(_.batches).mj }
      val union = (batch(1) ++ batch(2) ++ batch(3)).toDF("k")
      val want = graft.operators.Sketches.hllRegisters(union, "k", m)
        .as[(Long, Long)].collect().toMap
      live.foreach { case (j, mj) =>
        assert(want(j) === mj, s"register $j diverged")
      }
      (0L until m.toLong).filterNot(live.contains).foreach { j =>
        assert(want(j) === 0L, s"register $j observed in batch but not stream")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming quantile sketch accumulates to exactly the batch ddBins of the union") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long](spark)
      def batch(n: Int): Seq[Long] =
        (1 to 500).map(i => (i.toLong * 37 * n) % 99991L + 1L)
      ms.addData(batch(1))
      val out = StreamingOps.quantileSketchStream(
        ms.toDF().toDF("v"), "v", subBits = 4)
      val q = out.writeStream.format("memory").queryName("qs_stream")
        .outputMode("update")
        .option("checkpointLocation", tmp("ckpt_qs")).start()
      try {
        q.processAllAvailable()
        ms.addData(batch(2)); q.processAllAvailable()
        ms.addData(batch(3)); q.processAllAvailable()
      } finally { q.stop(); q.awaitTermination(60000) }
      // The latest emission per bin is the live sketch — it must equal
      // the batch operator over the union of all three batches.
      val rows = spark.table("qs_stream")
        .as[StreamingOps.BinUpdate].collect().toSeq
      val live = rows.groupBy(r => (r.e, r.sub))
        .map { case (_, rs) => rs.maxBy(_.batches) }
        .map(r => (r.e.toLong, r.sub.toLong, r.rep, r.n)).toSet
      val union = (batch(1) ++ batch(2) ++ batch(3)).toDF("v")
      val want = graft.operators.Sketches.ddBins(union, $"v", 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(live === want,
        "state-folded bins must equal the batch sketch of the union")
      // A quantile read off the live sketch obeys the q248 rule and bound.
      val sorted = live.toSeq.sortBy(r => (r._1, r._2))
      val n = sorted.map(_._4).sum
      var cum = 0L
      val p50 = sorted.find { r => cum += r._4; cum * 100 >= n * 50 }.get._3
      val exact = (batch(1) ++ batch(2) ++ batch(3)).sorted
        .apply(((batch(1).size * 3 + 1) / 2) - 1)
      assert(p50 <= exact && (exact - p50) * 16 <= p50 + 16,
        s"p50 read $p50 must bracket exact $exact within the bin bound")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming conformal scores equal the prequential fold and resume from checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long)](spark)
      val ckpt = tmp("ckpt_conf")
      val out = StreamingOps.conformalScoreStream(
        ms.toDF().toDF("k", "ord", "y"), "k", "ord", "y", calN = 5)
      val got = new java.util.concurrent.ConcurrentLinkedQueue[StreamingOps.ConformalScore]()
      def sink() = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (d: org.apache.spark.sql.Dataset[StreamingOps.ConformalScore], _: Long) =>
            d.collect().foreach(got.add)
        }
      val rnd = new scala.util.Random(377)
      // Two keys; batch 2 arrives SHUFFLED within the batch (the
      // processor must fold in ord order) but ord ranges increase across
      // batches (the per-key in-order delivery contract).
      val b1 = (1L to 12L).map(o => (o % 2 + 1, o, 100L + rnd.nextInt(11) - 5))
      val b2 = rnd.shuffle(
        (13L to 24L).map(o => (o % 2 + 1, o, 100L + rnd.nextInt(11) - 5)))
      // Batch 3 (after a RESTART): calm rows plus one spike per key —
      // the spike must price at the buffer-floor p.
      val b3 = Seq((1L, 25L, 100L), (2L, 26L, 101L),
        (1L, 27L, 5000L), (2L, 28L, -4000L))
      val q1 = sink().start()
      try {
        ms.addData(b1); q1.processAllAvailable()
        ms.addData(b2); q1.processAllAvailable()
      } finally { q1.stop(); q1.awaitTermination(60000) }
      ms.addData(b3)
      val q2 = sink().start()
      try q2.processAllAvailable()
      finally { q2.stop(); q2.awaitTermination(60000) }

      import scala.jdk.CollectionConverters._
      val scores = got.asScala.toSeq
      // Sequential prequential mirror over each key's rows in ord order.
      val all = (b1 ++ b2 ++ b3).sortBy(_._2)
      val expect = all.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        var n = 0L; var s = 0L; var buf = Vector.empty[Long]
        rows.map { case (_, ord, y) =>
          val yhat = if (n == 0) y
            else (if (s < 0) -1L else 1L) * (math.abs(s) / n)
          val r = math.abs(y - yhat)
          val p = (1L + buf.count(_ >= r)) * 1000000L / (buf.size + 1L)
          val sc = StreamingOps.ConformalScore(k, ord, y, r, p, buf.size.toLong)
          n += 1; s += y; buf = (buf :+ r).takeRight(5)
          sc
        }
      }.toSet
      assert(scores.toSet === expect,
        "stream scores must equal the sequential prequential fold")
      // The planted spikes price at the floor: full buffer (5), no
      // calibration residual as large -> p = 1e6 / 6.
      val spikes = scores.filter(sc => sc.ord == 27L || sc.ord == 28L)
      assert(spikes.size === 2 &&
        spikes.forall(sc => sc.p_micro === 1000000L / 6 && sc.n_cal === 5L),
        s"spikes must hit the buffer-floor p: $spikes")
      // Calm rows right before them price high (nothing unusual).
      val calm = scores.filter(sc => sc.ord == 25L || sc.ord == 26L)
      assert(calm.forall(_.p_micro >= 500000L), s"calm rows overpriced: $calm")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

}
