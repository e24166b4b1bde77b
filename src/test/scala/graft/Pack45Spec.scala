package graft

/** Semantic invariants for the q331-q335 pack: Ljung-Box bounds,
  * runs-test accounting, Huber estimator containment, Bradley-Terry
  * normalization, and XmR limit symmetry. */
class Pack45Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q331: Q is nonnegative and autocorrelations are bounded") {
    val r = q("q331_ljung_box")
      .select("n_months", "df", "q_stat", "max_abs_r")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > r._2 && r._2 == 12)
    assert(r._3 >= 0)
    assert(r._4 >= 0 && r._4 <= 1.0 + 1e-9)
  }

  test("q332: runs are bounded by the sign counts") {
    val r = q("q332_runs_test")
      .select("runs", "n1", "n2", "expected_runs", "z")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._2 > 0 && r._3 > 0)
    assert(r._1 >= 2 && r._1 <= r._2 + r._3,
      s"runs ${r._1} outside [2, ${r._2 + r._3}]")
    assert(r._4 > 1.0 && r._4 <= (r._2 + r._3).toDouble)
  }

  test("q333: the Huber location lies between median and mean pulls") {
    val r = q("q333_huber_location")
      .select("n", "median", "mad", "huber_m", "shift")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._3 > 0)
    assert(math.abs(r._5 - (r._4 - r._2)) < 0.011)
    // the M-estimate stays within a few MADs of the median
    assert(math.abs(r._4 - r._2) < 3 * r._3,
      s"huber ${r._4} implausibly far from median ${r._2}")
  }

  test("q334: strengths normalize to 1 and rank with win counts loosely") {
    val rows = q("q334_bradley_terry")
      .select("segment", "wins", "p_raw", "strength")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { r => assert(r._2 > 0 && r._3 > 0 && r._4 > 0) }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 5e-6)
    // the most-winning segment gets the top strength
    val byWins = rows.maxBy(_._2)._1
    val byStrength = rows.maxBy(_._4)._1
    assert(byWins == byStrength,
      s"top wins $byWins != top strength $byStrength")
  }

  test("q335: XmR limits are symmetric about the center") {
    val r = q("q335_xmr_chart")
      .select("n_months", "center", "mr_mean", "ucl", "lcl", "n_above",
        "n_below")
      .as[(Long, Double, Double, Double, Double, Long, Long)].head()
    assert(r._1 > 24 && r._2 > 0 && r._3 > 0)
    assert(math.abs((r._4 - r._2) - (r._2 - r._5)) < 0.011)
    assert(r._6 >= 0 && r._7 >= 0 && r._6 + r._7 <= r._1)
  }
}
