package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  test("polyHash matches the reference formula incl. non-ASCII") {
    def expected(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 131 + c) % P)
    val inputs = Seq("hi", "key agg row", "中文 text", "")
    val got = inputs.toDF("s").select(polyHash($"s")).as[Long].collect()
    assert(got.toSeq === inputs.map(expected))
  }

  test("cosine is 1.0 for identical vectors and symmetric") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))).toDF("a", "b")
    val c = df.select(cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(c(0) - 1.0) < 1e-12 && c(1) === 0.0)
  }

  test("native codegen cosine is bitwise identical to the HOF formulation") {
    val e = graft.Tables.embeddings(spark, sf).limit(200)
    val pairs = e.select($"vec_id".as("i"), $"embedding".as("a"))
      .crossJoin(e.select($"vec_id".as("j"), $"embedding".as("b")))
      .filter($"i" < $"j" && $"j" < 40)
    val diff = pairs
      .select(cosine($"a", $"b").as("native"), cosineHof($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof") // bitwise double comparison
    assert(diff.count() === 0)
  }

  test("native cosine also accepts double arrays and null rows") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0))),
      (None, Some(Array(1.0, 2.0)))).toDF("a", "b")
    val c = df.select(cosine($"a", $"b")).collect()
    assert(math.abs(c(0).getDouble(0) - 1.0) < 1e-12)
    assert(c(1).isNullAt(0))
  }

  test("null array ELEMENTS yield null, matching the HOF fold") {
    // Array literals through toDF carry containsNull=true, so this exercises
    // the per-element null check in both codegen and interpreted paths.
    val df = Seq(
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    val got = df.select(cosine($"a", $"b").as("native"), cosineHof($"a", $"b").as("hof"))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).getDouble(0) === got(1).getDouble(1))
  }

  test("trigrams produces distinct 1-based word windows") {
    val got = Seq("a b c d a b c").toDF("t")
      .select(trigrams(tokens($"t"))).as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("bpeTokenCount counts letter runs, digit runs, and symbols") {
    val got = Seq("key agg9 row!").toDF("t")
      .select(bpeTokenCount($"t")).as[Int].head()
    // key, agg, 9, row, !
    assert(got === 5)
  }
}
