package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join is row-identical to the plain equi-join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("okey"), "inner")
    val salted = SkewJoin.saltedInner(li, ord, "okey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salting spreads a hot key across buckets") {
    import spark.implicits._
    // one pathological key with many rows + distinct payloads
    val big = (1 to 10000).map(i => ("hot", i)).toDF("k", "payload")
    val small = Seq(("hot", "dim")).toDF("k", "attr")
    val salts = big.withColumn("_salt",
      pmod(xxhash64(col("k"), col("payload")), lit(16)))
      .select("_salt").distinct().count()
    assert(salts > 8, s"hot key should spread over many salts, got $salts")
    val joined = SkewJoin.saltedInner(big, small, "k", 16)
    assert(joined.count() === 10000)
  }
}
