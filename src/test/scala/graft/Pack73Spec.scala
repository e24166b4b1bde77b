package graft

/** Semantic invariants for the q471-q475 forensic-digit pack: digit
  * coverage, chi-square nonnegativity, share accounting, MAD
  * conformity bands, and sum-invariance sanity. */
class Pack73Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q471: second-digit expectations sum to one; terms >= 0") {
    val rows = q("q471_benford_second_digit")
      .select("digit", "o", "expected_p", "chi2_term")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 <= 9)
      assert(r._4 >= 0)
    }
    // Benford second digit: P(0) > P(9)
    val p0 = rows.find(_._1 == 0).get._3
    val p9 = rows.find(_._1 == 9).get._3
    assert(p0 > p9)
  }

  test("q472: last-digit chi2 >= 0 and digit counts bracket the mean") {
    val r = q("q472_last_digit_uniformity")
      .select("n_orders", "chi2", "max_digit_count", "min_digit_count")
      .as[(Long, Double, Long, Long)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0)
    assert(r._3 >= r._1 / 10 && r._4 <= r._1 / 10 + 1)
  }

  test("q473: price-point shares are proper fractions") {
    val r = q("q473_price_points")
      .select("n_orders", "share_00", "share_99", "share_50")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    Seq(r._2, r._3, r._4).foreach(sh => assert(sh >= 0 && sh <= 1))
    assert(r._2 + r._3 + r._4 <= 1.0 + 1e-9)
  }

  test("q474: MAD is nonnegative with a recognized conformity band") {
    val r = q("q474_benford_mad")
      .select("n_bins", "mad", "conformity")
      .as[(Long, Double, String)].head()
    assert(r._1 == 90)
    assert(r._2 >= 0)
    assert(Set("close", "acceptable", "marginal", "nonconforming")(r._3))
  }

  test("q475: sum shares cover the nine first digits and sum to one") {
    val rows = q("q475_benford_sum_invariance")
      .select("digit", "sum_share").as[(Long, Double)].collect()
    assert(rows.length == 9)
    assert(rows.map(_._1).sorted.sameElements(1L to 9L))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
  }
}
