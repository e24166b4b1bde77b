package graft

/** Semantic invariants for the q406-q410 method-comparison pack:
  * Deming vs OLS slope ordering, CCC ≤ |r|, Bland-Altman coverage,
  * Passing-Bablok slope plausibility, and ICC bounds. */
class Pack60Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q406: Deming slope is finite and positive for paired revenue") {
    val r = q("q406_deming_regression")
      .select("n_months", "slope", "intercept_dollars")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 12)
    assert(!r._2.isNaN && !r._2.isInfinite)
  }

  test("q407: CCC obeys |CCC| <= |r| <= 1") {
    val r = q("q407_lins_ccc")
      .select("n_months", "ccc", "pearson_r")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 12)
    assert(math.abs(r._2) <= 1.0 + 1e-9)
    assert(math.abs(r._3) <= 1.0 + 1e-9)
    // Lin's CCC is attenuated Pearson: |CCC| can never exceed |r|
    assert(math.abs(r._2) <= math.abs(r._3) + 1e-9,
      s"|CCC| ${r._2} > |r| ${r._3}")
  }

  test("q408: LoA bracket the bias; outside count is small") {
    val r = q("q408_bland_altman")
      .select("n_months", "bias_dollars", "loa_low_dollars",
        "loa_high_dollars", "n_outside")
      .as[(Long, Double, Double, Double, Long)].head()
    assert(r._1 == 12)
    assert(r._3 <= r._2 && r._2 <= r._4, "bias outside its own limits")
    // 1.96 sd limits cover ~95%: at n=12 at most 2 points may escape
    assert(r._5 <= 2, s"${r._5} of 12 differences outside the LoA")
  }

  test("q409: Passing-Bablok slope lies within the slope range") {
    val r = q("q409_passing_bablok")
      .select("n_slopes", "k_offset", "pb_slope")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 66, s"expected 66 pairwise slopes, got ${r._1}")
    assert(r._2 >= 0 && r._2 <= r._1)
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("q410: ICC(2,1) lies in [-1, 1]") {
    val r = q("q410_icc21")
      .select("n_subjects", "k_raters", "icc21")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 12 && r._2 == 2)
    assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9,
      s"ICC ${r._3} outside [-1, 1]")
  }
}
