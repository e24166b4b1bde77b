package graft

/** Semantic invariants for the q421-q425 change-detection pack:
  * CUSUM nonnegativity, run-length accounting, variance-ratio
  * positivity, HAC ratio plausibility, and spectral-flatness bounds. */
class Pack63Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q421: CUSUM peak is nonnegative; alarms imply a first day") {
    val r = q("q421_cusum")
      .select("n_days", "n_alarms", "first_alarm_day",
        "max_cusum_sigmas")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 100)
    assert(r._2 >= 0)
    assert(r._4 >= 0, s"peak CUSUM ${r._4} negative")
    if (r._2 > 0) {
      assert(r._3 > 0, "alarms exist but no first day")
      assert(r._4 > 4.0, "alarms without crossing 4 sigma")
    } else assert(r._3 == -1L)
  }

  test("q422: longest runs are consistent with the kept-day count") {
    val r = q("q422_longest_run")
      .select("n_days_kept", "longest_above", "longest_below", "log2_n")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 100)
    assert(r._2 >= 1 && r._2 <= r._1)
    assert(r._3 >= 1 && r._3 <= r._1)
    // random binary series: longest run is O(log2 n), allow 6x slack
    assert(r._2 <= 6 * r._4 + 5, s"run ${r._2} vs log2(n) ${r._4}")
  }

  test("q423: variance ratio is positive and finite") {
    val r = q("q423_variance_ratio")
      .select("n_returns", "vr4").as[(Long, Double)].head()
    assert(r._1 > 12)
    assert(r._2 > 0 && !r._2.isInfinite)
  }

  test("q424: HAC/naive ratio is positive; SE is a plausible dollar") {
    val r = q("q424_newey_west")
      .select("n_months", "hac_naive_ratio", "nw_se_dollars")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 12)
    assert(r._2 > 0, s"HAC ratio ${r._2} not positive")
    assert(r._3 > 0)
  }

  test("q425: spectral flatness lies in (0, 1] (AM-GM)") {
    val r = q("q425_spectral_flatness")
      .select("n_freqs", "flatness").as[(Long, Double)].head()
    assert(r._1 >= 20)
    assert(r._2 > 0 && r._2 <= 1.0 + 1e-6,
      s"flatness ${r._2} violates AM-GM")
  }
}
