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
}
