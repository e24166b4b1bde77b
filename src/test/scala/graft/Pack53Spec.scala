package graft

/** Semantic invariants for the q371-q375 pack: ordinal-association
  * identities, Nelson-Aalen monotonicity and its Kaplan-Meier
  * relationship, Siegel-Tukey rank-sum accounting, Quade F
  * nonnegativity, and Page-L bounds. */
class Pack53Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q371: |gamma| >= |somers d| and both lie in [-1, 1]") {
    val r = q("q371_ordinal_association")
      .select("concordant", "discordant", "ties_y", "gamma",
        "somers_d_yx", "tau_c")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._4 >= -1 && r._4 <= 1)
    assert(r._5 >= -1 && r._5 <= 1)
    assert(r._6 >= -1 && r._6 <= 1)
    // gamma's denominator is a subset of Somers' D's, so |gamma| >= |D|
    assert(math.abs(r._4) >= math.abs(r._5) - 1e-9,
      s"|gamma| ${r._4} < |somers| ${r._5}")
    // same sign (both driven by P - Q)
    assert(r._4 * r._5 >= 0)
  }

  test("q372: cumulative hazard is nondecreasing and starts positive") {
    val rows = q("q372_nelson_aalen")
      .orderBy("t_days")
      .select("t_days", "d", "n_at_risk", "cum_hazard", "hazard_var")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 > 0, "emitted a step with no deaths")
      assert(r._3 >= r._2, s"at-risk ${r._3} < deaths ${r._2}")
      assert(r._4 > 0 && r._5 >= 0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 - 1e-9, "hazard decreased")
      assert(b._5 >= a._5 - 1e-9, "variance decreased")
      assert(b._3 < a._3, "at-risk must strictly shrink between steps")
    }
  }

  test("q373: Siegel-Tukey rank sum is a valid Wilcoxon split") {
    val r = q("q373_siegel_tukey")
      .select("n_urgent", "n_low", "w_urgent", "z")
      .as[(Long, Long, Long, Double)].head()
    val n = r._1 + r._2
    // outside-in ranks are a permutation of 1..N, so the urgent sum
    // sits between the smallest and largest na-subsets of 1..N
    val minSum = r._1 * (r._1 + 1) / 2
    val maxSum = r._1 * (2 * n - r._1 + 1) / 2
    assert(r._3 >= minSum && r._3 <= maxSum,
      s"W ${r._3} outside [$minSum, $maxSum]")
    assert(!r._4.isNaN && !r._4.isInfinite)
  }

  test("q374: Quade F is nonnegative and finite") {
    val r = q("q374_quade_test")
      .select("n_blocks", "f_quade").as[(Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0, s"F ${r._2} negative")
    assert(!r._2.isNaN && !r._2.isInfinite)
  }

  test("q375: Page L lies inside its exact k=5 bounds") {
    val r = q("q375_page_trend")
      .select("n_blocks", "l_stat", "z").as[(Long, Double, Double)]
      .head()
    assert(r._1 > 0)
    // per block, L contribution ranges from anti-ordered 35 = Σ j*(6-j)
    // to perfectly ordered 55 = Σ j*j
    assert(r._2 >= 35.0 * r._1 - 1e-6 && r._2 <= 55.0 * r._1 + 1e-6,
      s"L ${r._2} outside [${35.0 * r._1}, ${55.0 * r._1}]")
    assert(!r._3.isNaN && !r._3.isInfinite)
  }
}
