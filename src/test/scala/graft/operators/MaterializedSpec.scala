package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The shared-relation registry must be BOUNDED (LRU) and eviction must
  * be invisible to consumers: a dropped entry rebuilds through the same
  * `of` call — residency is a cost knob, never a correctness one.
  */
class MaterializedSpec extends SparkSpec {
  import spark.implicits._

  private def rel(tag: Int): DataFrame =
    Seq((tag.toLong, s"v$tag")).toDF("id", "v")

  test("of() builds once per key and serves the cached relation") {
    Materialized.clear()
    var builds = 0
    def get() = Materialized.of(spark, "/dirA", "relA") {
      builds += 1; rel(1)
    }
    val a = get(); val b = get()
    assert(builds === 1)
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("the registry evicts LRU beyond maxEntries and rebuilds transparently") {
    Materialized.clear()
    val buildCounts = scala.collection.mutable.Map.empty[Int, Int]
    def get(i: Int) = Materialized.of(spark, "/dir", s"rel$i") {
      buildCounts(i) = buildCounts.getOrElse(i, 0) + 1; rel(i)
    }
    // Fill past the cap; entry 0 (least recently used) must fall out.
    (0 to Materialized.maxEntries).foreach(get)
    assert(Materialized.size === Materialized.maxEntries)
    assert(buildCounts(0) === 1)
    // Consumer asks again: rebuilt transparently, same rows.
    assert(get(0).as[(Long, String)].collect().toSeq === Seq((0L, "v0")))
    assert(buildCounts(0) === 2)
    // LRU order is by USE: touching entry 1 then overflowing evicts 2,
    // not 1.
    get(1)
    val before1 = buildCounts(1)
    get(Materialized.maxEntries + 1) // overflow by one
    get(1)
    assert(buildCounts(1) === before1, "recently-used entry was evicted")
    val before2 = buildCounts.getOrElse(2, 0)
    get(2)
    assert(buildCounts(2) === before2 + 1, "LRU entry 2 should have been evicted")
    Materialized.clear()
    assert(Materialized.size === 0)
  }

  test("ofContent keys by resolved plan: names don't matter, contents do") {
    Materialized.clear()
    val dir = java.nio.file.Files.createTempDirectory("mat_content").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/t.parquet")
    var builds = 0
    def derive(input: DataFrame) =
      Materialized.ofContent(input, "stage:test") { t =>
        builds += 1; t.select($"id")
      }
    // Two INDEPENDENT reads of the same file share one handle: the key
    // is the canonical scan plan, not any name.
    val a = derive(spark.read.parquet(s"$dir/t.parquet"))
    val b = derive(spark.read.parquet(s"$dir/t.parquet"))
    assert(builds === 1)
    assert(a eq b, "same content must serve the identical handle")
    // A view over the same file ALSO hits — the TVF seam: view names
    // resolve away before keying.
    spark.read.parquet(s"$dir/t.parquet")
      .createOrReplaceTempView("mat_content_view")
    val c = derive(spark.table("mat_content_view"))
    assert(builds === 1)
    assert(c eq a)
    // Redefining the view to DIFFERENT contents misses — the residency
    // objection dissolved: a stale handle can never serve a redefined
    // name.
    Seq((9L, "z")).toDF("id", "v").write.parquet(s"$dir/t2.parquet")
    spark.read.parquet(s"$dir/t2.parquet")
      .createOrReplaceTempView("mat_content_view")
    val d = derive(spark.table("mat_content_view"))
    assert(builds === 2)
    assert(d.as[Long].collect().toSeq === Seq(9L))
    // A different stage over the same input is its own relation.
    val e = Materialized.ofContent(
      spark.read.parquet(s"$dir/t.parquet"), "stage:other") { t =>
      builds += 1; t.select($"v")
    }
    assert(builds === 3 && !(e eq a))
    Materialized.clear()
    assert(Materialized.contentSize === 0)
  }

  test("ofBucketed writes once and serves catalog read-backs after") {
    val table = "materialized_spec_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    var builds = 0
    def get() = Materialized.ofBucketed(spark, table, "id", 4) {
      builds += 1; rel(9)
    }
    val first = get().as[(Long, String)].collect().toSeq
    val second = get().as[(Long, String)].collect().toSeq
    assert(builds === 1, "second call must read back, not rebuild")
    assert(first === Seq((9L, "v9")) && second === first)
    // The catalog table is genuinely bucketed (the zero-exchange seam).
    val ddl = spark.sql(s"SHOW CREATE TABLE $table").first().getString(0)
    assert(ddl.contains("CLUSTERED BY") && ddl.contains("BUCKETS"), ddl)
    // A mismatched request must fail loudly, not silently serve a
    // differently-bucketed table as the co-location seam.
    val wrongKey = intercept[IllegalArgumentException] {
      Materialized.ofBucketed(spark, table, "v", 4) { rel(9) }
    }
    assert(wrongKey.getMessage.contains("bucket spec"), wrongKey.getMessage)
    val wrongBuckets = intercept[IllegalArgumentException] {
      Materialized.ofBucketed(spark, table, "id", 8) { rel(9) }
    }
    assert(wrongBuckets.getMessage.contains("bucket spec"),
      wrongBuckets.getMessage)
    assert(builds === 1, "validation failures must never trigger a rebuild")
    spark.sql(s"DROP TABLE $table")
  }

  test("ofBucketed serializes concurrent first callers into one write") {
    val table = "materialized_spec_bucketed_race"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 4).map(_ => Future {
        Materialized.ofBucketed(spark, table, "id", 4) {
          builds.incrementAndGet(); rel(11)
        }.as[(Long, String)].collect().toSeq
      })), 120.seconds)
    assert(builds.get() === 1,
      s"exactly one concurrent caller may write; got ${builds.get()}")
    assert(results.forall(_ === Seq((11L, "v11"))))
    spark.sql(s"DROP TABLE $table")
  }
}
