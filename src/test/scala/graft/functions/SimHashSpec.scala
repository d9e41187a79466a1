package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  test("native signature equals the exploded token-vote formulation") {
    val docs = Tables.documents(spark, sf)
    val native = Dedup.simhash(docs, "doc_id", "text")
    val reference = Dedup.simhashVotes(docs, "doc_id", "text")
    assert(native.count() === reference.count())
    val mismatch = native.as("n")
      .join(reference.as("r"), "doc_id")
      .filter($"n.simhash" =!= $"r.simhash")
    assert(mismatch.count() === 0)
  }

  test("single-token signature is the token hash's low 32 bits") {
    // With one token every bit votes +1 or -1 directly from h's bits, so
    // sig == h (h < 2^31 here). polyHash("a") = 97.
    val got = Seq(Tuple1(Seq("a"))).toDF("toks")
      .select(simhashSig($"toks")).as[Long].head()
    assert(got === 97L)
  }

  test("null slots contribute no votes; nothing-voted arrays yield null (absence)") {
    // Vote-pipeline parity: a null token's 32 vote rows are dropped, so
    // ["a", null] must sign exactly like ["a"]; an array where NOTHING
    // voted (empty / all-null) corresponds to a document the vote
    // pipeline's groupBy never emits — null is the scalar analog.
    val withNull = Seq(Tuple1(Seq[String]("a", null))).toDF("toks")
      .select(simhashSig($"toks")).as[Long].head()
    assert(withNull === 97L) // == signature of ["a"]
    Seq(Seq.empty[String], Seq[String](null, null)).foreach { toks =>
      val r = Seq(Tuple1(toks)).toDF("toks")
        .select(simhashSig($"toks")).collect()
      assert(r(0).isNullAt(0), s"expected null signature for $toks")
    }
  }

  test("simhash drops documents with null text, matching the vote pipeline") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Dedup.simhash(docs, "doc_id", "text").count() === 1)
    assert(Dedup.simhashVotes(docs, "doc_id", "text").count() === 1)
  }

  test("multibyte code points hash like the built-ins polyHash column") {
    // ascii() returns the full code point; the kernel iterates code points.
    val df = Seq("héllo 世界 emoji😀end").toDF("text")
      .select(explode(tokens($"text")).as("t"))
      .select(polyHashHof($"t").as("builtins"), $"t")
      .withColumn("kernel", simhashSig(array($"t")))
    // single-token sig == hash value itself (see above), so parity on each.
    val rows = df.select($"builtins", $"kernel").collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("interpreted (non-codegen) eval matches codegen plan output") {
    val viaPlan = Seq(Tuple1(Seq("p", "q", "r"))).toDF("toks")
      .select(simhashSig($"toks")).as[Long].head()
    val expr = SimHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq("p", "q", "r").map(
            org.apache.spark.unsafe.types.UTF8String.fromString)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    assert(expr.eval(null).asInstanceOf[Long] === viaPlan)
  }
}
