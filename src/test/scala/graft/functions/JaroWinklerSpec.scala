package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.jaroWinkler

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("jaroWinkler pins the textbook values bit-for-bit (DuckDB parity set)") {
    // Every expected value below was read from DuckDB 1.x
    // jaro_winkler_similarity on this machine (the oracle engine); the
    // kernel was additionally fuzzed against it over 20k random pairs
    // with exact double equality before these pins were written.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("dwayne", "duane", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334), // > 0.7 but zero prefix
      ("abcdxxxxxx", "abcdyyyyyy", 0.6), // below boost threshold
      ("ab", "ba", 0.0), // window 0: adjacent swap never matches
      ("", "abc", 0.0), ("", "", 0.0), // DuckDB: empty means 0, even both
      ("abc", "abc", 1.0))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(jaroWinkler(col("a"), col("b"))).as[Double].collect()
    got.zip(cases).foreach { case (g, (a, b, want)) =>
      assert(java.lang.Double.doubleToLongBits(g) ===
        java.lang.Double.doubleToLongBits(want), s"jw($a, $b)")
    }
  }

  test("jaroWinkler null propagates; interpreted eval agrees with codegen") {
    val df = Seq((Some("martha"), None: Option[String])).toDF("a", "b")
    assert(df.select(jaroWinkler(col("a"), col("b"))).collect().head.isNullAt(0))
    // filter pushes the expression into a non-codegen'd context too
    val n = Seq(("martha", "marhta"), ("ab", "ba")).toDF("a", "b")
      .filter(jaroWinkler(col("a"), col("b")) > 0.9).count()
    assert(n === 1L)
  }
}
