package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts and stringifies min/max per column") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "b"))
      .toDF("id", "tag")
    val got = Profile.profile(df, Seq("id", "tag")).orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect()
    assert(got(0) === (("id", 1L, 2L, "1", "3")))
    assert(got(1) === (("tag", 0L, 2L, "a", "b")))
  }

  test("profile handles non-identifier column names (spaces, dots, keywords)") {
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("order date", "select.a")
    val got = Profile.profile(df, Seq("order date", "select.a"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect()
    assert(got(0) === (("order date", 0L, 2L, "1", "2")))
    assert(got(1) === (("select.a", 0L, 2L, "x", "y")))
  }

  test("latestPerKey keeps exactly the max-(order,tie) row per key") {
    val df = Seq(
      (7L, 100L, 1L, "old"), (7L, 200L, 2L, "new"),
      (8L, 100L, 9L, "hi"), (8L, 100L, 3L, "lo"))
      .toDF("k", "ts", "seq", "payload")
    val got = Profile.latestPerKey(df, "k", Seq("ts", "seq"), Seq("payload"))
      .orderBy("k").as[(Long, Long, Long, String)].collect()
    assert(got === Array((7L, 200L, 2L, "new"), (8L, 100L, 9L, "hi")))
  }
}
