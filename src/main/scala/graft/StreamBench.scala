package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Consumer, ConsumerConfig}

/** Streaming-source throughput benchmark (dev tooling; not part of the
  * driver's bench contract — that is [[Bench]]). Drains the events table
  * through the sharded-replay source end-to-end (offset planning,
  * admission control, partition readers, payload serialization, engine
  * checkpointing) into the noop sink and reports records/second — the
  * single-node consumer-throughput figure the reference's domain is
  * actually about. The reference publishes no numbers (BASELINE.md), so
  * this records ours per round.
  *
  * Modes timed: one unbounded drain (Trigger.AvailableNow, no admission
  * cap — peak replay rate) and one admission-controlled drain
  * (maxRecordsPerTrigger) showing per-trigger overhead at the reference's
  * flow-control granularity.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val eventsPath = s"$sfDir/events.parquet"
    val n = Tables.events(spark, sfDir).count()

    def drain(tag: String, maxPerTrigger: Option[Long]): (String, Double) = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"sb_$tag").toString
      val ds = Consumer.source(ConsumerConfig(
        streamPath = eventsPath, numShards = 16,
        maxRecordsPerTrigger = maxPerTrigger))
      val t0 = System.nanoTime()
      val q = Consumer.commitFlow(ds).writeStream
        .format("noop").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      tag -> (n / sec)
    }

    drain("warm", None) // session + shard-store warm-up, untimed
    val runs = Seq(
      drain("unbounded_rec_per_sec", None),
      drain("admitted_100k_rec_per_sec", Some(100000L)))
    val body = runs.map { case (k, v) => s""""$k":${math.round(v)}""" }
      .mkString(",")
    println(s"""{"metric":"stream_drain","records":$n,$body,"sf":"$sfDir"}""")
    spark.stop()
  }
}
