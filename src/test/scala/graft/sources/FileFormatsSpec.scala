package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.5 "scans (files)": the engine reads/writes every mainstream
  * file format through the same DataFrame surface. Each format round-trips
  * a fixture slice bit-for-bit (schema via explicit StructType for the
  * text formats, which don't carry one).
  */
class FileFormatsSpec extends SparkSpec {

  private lazy val base: DataFrame =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate").cast("date").as("ship_day"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  private def roundTrip(format: String, options: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString + "/data"
    base.write.options(options).format(format).save(dir)
    val back = spark.read.options(options).schema(base.schema).format(format).load(dir)
    assert(back.count() === 500)
    // exceptAll in both directions = multiset equality
    assert(back.exceptAll(base).isEmpty && base.exceptAll(back).isEmpty,
      s"$format round-trip lost or mangled rows")
  }

  test("parquet round-trips")(roundTrip("parquet"))
  test("orc round-trips")(roundTrip("orc"))
  test("json round-trips")(roundTrip("json"))
  test("csv round-trips with header")(roundTrip("csv", Map("header" -> "true")))

  test("csv scan prunes columns and filters correctly") {
    val dir = Files.createTempDirectory("graft_csvp").toString + "/data"
    base.write.option("header", "true").csv(dir)
    val df = spark.read.option("header", "true").schema(base.schema).csv(dir)
      .filter(col("l_orderkey") === base.head().getLong(0))
      .select("l_orderkey", "l_quantity")
    assert(df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
    val readSchema = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag"),
      s"csv scan reads unreferenced columns: $readSchema")
    assert(df.count() > 0)
  }

  test("gzipped JSONL round-trips — the wire format training corpora arrive in") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars", "text")
    val out = java.nio.file.Files.createTempDirectory("jsonl_gz").toString
    docs.write.mode("overwrite").option("compression", "gzip").json(out)
    // The files on disk really are .json.gz (one JSON object per line).
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "expected gzipped jsonl part files")
    val back = spark.read.json(out)
    assert(back.count() === docs.count())
    // Full-fidelity round-trip, text included (hash every row both sides).
    def sig(d: org.apache.spark.sql.DataFrame) = d
      .select(md5(concat_ws("", col("doc_id"), col("lang"),
        col("source"), col("n_chars"), col("text"))).as("h"))
      .agg(count(lit(1)), sum(conv(substring(col("h"), 1, 8), 16, 10)
        .cast("long")))
      .collect()(0)
    assert(sig(back) === sig(docs))
  }
}
