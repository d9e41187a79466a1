package graft.streaming

import graft.SparkSpec
import graft.streaming.Producer.ProducerRecord

class ProducerAggregationSpec extends SparkSpec {
  import spark.implicits._

  private def rec(i: Int): ProducerRecord =
    ProducerRecord(s"key-$i", Array.tabulate(i % 7 + 1)(j => (i * 31 + j).toByte))

  test("aggregate then deaggregate is the identity, preserving partition order") {
    val n = 25
    val in = spark.createDataset((0 until n).map(rec)).repartition(3)
    val packed = Producer.aggregate(in, k = 4)
    val back = Producer.deaggregateAll(packed)
    // Same multiset of records (order is per-partition, so compare sorted)
    def norm(ds: org.apache.spark.sql.Dataset[ProducerRecord]) =
      ds.collect().map(r => (r.key, r.data.toSeq)).sortBy(_._1)
    assert(norm(back) === norm(in))
    // Packing actually reduced the record count ~k-fold
    val nPacked = packed.count()
    assert(nPacked < n && nPacked >= (n + 3) / 4)
  }

  test("each aggregate carries its first record's key and dense sub-positions") {
    val in = spark.createDataset((0 until 10).map(rec)).coalesce(1)
    val packed = Producer.aggregate(in, k = 4).collect()
    // 10 records in one partition at k=4 -> runs of 4, 4, 2
    assert(packed.map(b => Producer.deaggregate(b.data).length).toSeq
      === Seq(4, 4, 2))
    packed.foreach { blob =>
      val subs = Producer.deaggregate(blob.data)
      assert(blob.key === subs.head.key, "aggregate key = first sub-record key")
    }
    // Concatenating runs in order restores the partition's record order
    val flat = packed.flatMap(b => Producer.deaggregate(b.data))
    assert(flat.map(_.key).toSeq === (0 until 10).map(i => s"key-$i"))
  }

  test("k=1 is a no-op and binary payloads round-trip byte-exactly") {
    val in = spark.createDataset(Seq(
      ProducerRecord("", Array[Byte](0, -1, 127, -128)),
      ProducerRecord("k", Array.empty[Byte])))
    assert(Producer.aggregate(in, 1).collect().map(r => (r.key, r.data.toSeq))
      === in.collect().map(r => (r.key, r.data.toSeq)))
    val rt = Producer.deaggregate(
      Producer.aggregate(in.coalesce(1), 2).collect().head.data)
    assert(rt.map(_.key) === Seq("", "k"))
    assert(rt.head.data.toSeq === Seq[Byte](0, -1, 127, -128))
    assert(rt(1).data.isEmpty)
  }
}
