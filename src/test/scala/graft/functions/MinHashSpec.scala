package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private val Num = 64
  private val Rows = 4

  /** The exploded groupBy formulation the native kernel replaced — kept
    * here as the reference semantics the kernel must reproduce exactly.
    */
  private def referenceSigs = {
    val grams = Tables.documents(spark, sf)
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(trigrams($"toks")).as("g"))
    val hashed = grams.withColumn("h", abs(xxhash64($"g")) % P)
    val sigCols = (0 until Num).map { i =>
      min(($"h" * (2 * i + 1) + (i * 12345 + 7)) % P).as(s"m$i")
    }
    hashed.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
      .select($"doc_id", array((0 until Num).map(i => col(s"m$i")): _*).as("sig"))
  }

  test("native signature equals the exploded 64-min-aggregate formulation") {
    val native = Tables.documents(spark, sf)
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", minhash($"toks", Num).as("sig"))
    val mismatch = native.as("n").join(referenceSigs.as("r"), "doc_id")
      .filter($"n.sig" =!= $"r.sig")
    assert(mismatch.count() === 0)
  }

  test("band keys are the banded signature slices with a band prefix") {
    val row = Seq("a b c d e f g h i j").toDF("text")
      .select(tokens($"text").as("toks"))
      .select(minhash($"toks", Num).as("sig"),
        minhashBands($"toks", Num, Rows).as("keys"))
      .head()
    val sig = row.getSeq[Long](0)
    val keys = row.getSeq[String](1)
    assert(keys.length === Num / Rows)
    keys.zipWithIndex.foreach { case (k, b) =>
      val expected = s"$b:" + (0 until Rows).map(r => sig(b * Rows + r)).mkString("_")
      assert(k === expected)
    }
  }

  test("fewer than 3 tokens yields null (no trigram exists)") {
    val got = Seq("one two", "a b c").toDF("text")
      .select(minhash(tokens($"text"), Num).as("sig"),
        minhashBands(tokens($"text"), Num, Rows).as("keys"))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(!got(1).isNullAt(0) && !got(1).isNullAt(1))
  }

  test("duplicate trigrams do not change the signature (multiset = set)") {
    val df = Seq("x y z x y z x y z", "x y z").toDF("text")
      .select(minhash(tokens($"text"), Num).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    // "x y z x y z x y z" has trigram set {x y z, y z x, z x y}; the single
    // "x y z" only {x y z} — same minimum per slot is NOT guaranteed, so
    // instead check the repeated text against its own distinct-gram set via
    // the reference property: repeating the text changes nothing.
    val rep = Seq("x y z x y z x y z x y z x y z").toDF("text")
      .select(minhash(tokens($"text"), Num).as("sig")).as[Seq[Long]].head()
    assert(sigs(0) === rep)
  }

  test("interpreted (non-codegen) path matches codegen") {
    // Filter on the expression forces it into a context Spark may interpret;
    // compare collected values from a projection (codegen) vs eval via rdd.
    val df = Seq("p q r s t").toDF("text")
    val viaPlan = df.select(minhash(tokens($"text"), 8)).as[Seq[Long]].head()
    val expr = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq("p", "q", "r", "s", "t").map(
            org.apache.spark.unsafe.types.UTF8String.fromString)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 8)
    val viaEval = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaPlan === viaEval.toSeq)
  }
}
