package graft

import graft.operators.Profile

/** Table profiling: null counts, exact distincts, numeric envelopes. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, and envelopes per column") {
    val df = Seq(
      (1, Some(1.5), Some("x")),
      (2, None, Some("y")),
      (3, Some(9.5), None),
      (4, Some(1.5), Some("x"))
    ).toDF("id", "v", "s")
    val got = Profile.profile(df)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 0L, 4L, Some(1.0), Some(4.0))))
    assert(got("v") == (("v", 1L, 2L, Some(1.5), Some(9.5))))
    // strings profile nulls/distincts only, no envelope
    assert(got("s") == (("s", 1L, 2L, None, None)))
  }

  test("profile: approx mode stays within HLL tolerance on real data") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val exact = Profile.profile(orders).select("col_name", "n_distinct")
      .as[(String, Long)].collect().toMap
    val approx = Profile.profile(orders, exact = false)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, n) =>
      // default rsd 0.05 is one sigma — allow 3 sigma
      assert(math.abs(approx(c) - n) <= math.max(3L, (n * 0.15).toLong),
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }
}
