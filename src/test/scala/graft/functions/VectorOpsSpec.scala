package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  /** The interpreted HOF formulations the kernels replaced — kept as the
    * reference semantics (and the shape the DuckDB oracle uses).
    */
  private def l2sqHof(v: org.apache.spark.sql.Column) =
    aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
  private def quantize8Hof(v: org.apache.spark.sql.Column) = {
    val scale = array_max(transform(v, x => abs(x))).cast("double")
    transform(v, x => floor(x.cast("double") / scale * 127).cast("long"))
  }

  test("kernels equal the HOF formulation on the embeddings fixture") {
    val emb = Tables.embeddings(spark, sf)
    val mismatch = emb.select($"vec_id",
        l2sq($"embedding").as("k_l2"), l2sqHof($"embedding").as("h_l2"),
        quantize8($"embedding").as("k_q8"), quantize8Hof($"embedding").as("h_q8"))
      .filter($"k_l2" =!= $"h_l2" || $"k_q8" =!= $"h_q8")
    assert(mismatch.count() === 0)
  }

  test("double input works like float input") {
    val got = Seq(Tuple1(Seq(3.0d, -4.0d))).toDF("v")
      .select(l2sq($"v"), quantize8($"v")).head()
    assert(got.getDouble(0) === 25.0)
    assert(got.getSeq[Long](1) === Seq(95L, -127L))
  }

  test("degenerate inputs: empty -> (0, null); all-zero -> (0, null); null elem -> (null, null)") {
    val empty = Seq(Tuple1(Seq.empty[Double])).toDF("v")
      .select(l2sq($"v"), quantize8($"v")).head()
    assert(empty.getDouble(0) === 0.0 && empty.isNullAt(1))
    val zeros = Seq(Tuple1(Seq(0.0d, 0.0d))).toDF("v")
      .select(l2sq($"v"), quantize8($"v")).head()
    assert(zeros.getDouble(0) === 0.0 && zeros.isNullAt(1))
    val nul = Seq(Tuple1(Seq[java.lang.Double](1.0, null))).toDF("v")
      .select(l2sq($"v"), quantize8($"v")).head()
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }

  test("float widening is exact (no drift vs double arithmetic on floats)") {
    val f = Seq(Tuple1(Seq(0.1f, -0.3f, 0.7f))).toDF("v")
    val viaKernel = f.select(l2sq($"v")).as[Double].head()
    val expected = Seq(0.1f, -0.3f, 0.7f)
      .map(_.toDouble).map(x => x * x).foldLeft(0.0)(_ + _)
    assert(viaKernel === expected)
  }

  test("interpreted (non-codegen) eval matches codegen plan output") {
    val viaPlan = Seq(Tuple1(Seq(1.5d, -2.5d, 0.5d))).toDF("v")
      .select(l2sq($"v"), quantize8($"v")).head()
    val lit_ = org.apache.spark.sql.catalyst.expressions.Literal(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(1.5d, -2.5d, 0.5d)),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val evalL2 = L2SquaredNorm(lit_).eval(null).asInstanceOf[Double]
    val evalQ8 = QuantizeInt8(lit_).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(evalL2 === viaPlan.getDouble(0))
    assert(evalQ8.toSeq === viaPlan.getSeq[Long](1))
  }

  test("l2dist matches hand-worked distances and the HOF fold bitwise") {
    val got = Seq((Seq(1.0d, 2.0d, 3.0d), Seq(4.0d, 0.0d, 3.0d)))
      .toDF("a", "b").select(l2dist($"a", $"b")).as[Double].head()
    assert(got === 13.0) // 9 + 4 + 0
    // Bitwise vs the interpreted zip_with+aggregate reference on floats.
    val f = Seq((Seq(0.1f, -0.3f, 0.7f), Seq(0.2f, 0.5f, -0.4f)))
      .toDF("a", "b")
    val viaKernel = f.select(l2dist($"a", $"b")).as[Double].head()
    val viaHof = f.select(aggregate(
        zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)).as[Double].head()
    assert(viaKernel === viaHof)
  }

  test("l2dist folds the common prefix; a null element poisons to null") {
    val prefix = Seq((Seq(1.0d, 2.0d, 9.0d), Seq(0.0d, 0.0d)))
      .toDF("a", "b").select(l2dist($"a", $"b")).as[Double].head()
    assert(prefix === 5.0) // third element ignored
    val nul = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](0.0, 0.0)))
      .toDF("a", "b").select(l2dist($"a", $"b")).head()
    assert(nul.isNullAt(0))
  }
}
