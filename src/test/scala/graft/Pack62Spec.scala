package graft

/** Semantic invariants for the q416-q420 distribution-fitting pack:
  * Weibull parameter plausibility, Poissonness-plot linearity,
  * Juilland dispersion bounds, weekday-ANOVA positivity, and
  * geometric-GOF accounting. */
class Pack62Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q416: Weibull shape and scale are positive and plausible") {
    val r = q("q416_weibull_latency")
      .select("n_lines", "shape_k", "scale_days")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0, s"shape ${r._2} not positive")
    // this generator couples ship dates only loosely to order dates
    // (positive latencies run to ~2500 days), so the fitted scale is
    // large; it must still sit inside the observed support
    assert(r._3 > 1 && r._3 < 5000, s"scale ${r._3} days implausible")
  }

  test("q417: Poissonness plot is near-linear with positive lambda") {
    val r = q("q417_poissonness_plot")
      .select("n_levels", "lambda_hat", "r2")
      .as[(Long, Double, Double)].head()
    assert(r._1 >= 3, s"only ${r._1} count levels")
    assert(r._2 > 0, s"lambda ${r._2} not positive")
    assert(r._3 >= 0 && r._3 <= 1.0 + 1e-9)
  }

  test("q418: Juilland's D lies in [0, 1] for common terms") {
    val rows = q("q418_juilland_dispersion")
      .select("term", "juilland_d").as[(String, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._2 >= -1e-6 && r._2 <= 1.0 + 1e-9,
        s"D ${r._2} outside [0,1] for '${r._1}'")
      // top corpus terms are spread across shards, not concentrated
      assert(r._2 > 0.5, s"top term '${r._1}' suspiciously bursty")
    }
  }

  test("q419: weekday ANOVA F >= 0 and the mean ratio >= 1") {
    val r = q("q419_weekday_anova")
      .select("n_days", "f_stat", "max_min_ratio")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 100)
    assert(r._2 >= 0 && !r._2.isInfinite)
    assert(r._3 >= 1.0 - 1e-9)
  }

  test("q420: geometric GOF cells cover all customers") {
    val r = q("q420_geometric_fit")
      .select("n_customers", "n_cells", "chi2")
      .as[(Long, Long, Double)].head()
    val nCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(r._1 == nCust)
    assert(r._2 == 16)
    assert(r._3 >= 0 && !r._3.isInfinite)
  }
}
