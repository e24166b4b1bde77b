package graft

/** Semantic invariants for the q381-q385 sampling/estimation pack:
  * Horvitz-Thompson unbiasedness scale, jackknife SE positivity, Kish
  * deff ≥ 1 identity, stationary-distribution mass conservation, and
  * KS-distance bounds. */
class Pack55Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q381: HT estimate lands within 25% of the true total") {
    val r = q("q381_horvitz_thompson")
      .select("n_population", "n_sampled", "ht_total_dollars",
        "true_total_dollars", "rel_err")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0 && r._2 < r._1)
    assert(r._3 > 0 && r._4 > 0)
    // md5 is effectively uniform, and priorities are balanced fifths:
    // the HT estimator should land near the truth even at sf0.001
    assert(math.abs(r._5) < 0.25,
      s"HT relative error ${r._5} suspiciously large")
  }

  test("q382: jackknife SE is positive and small versus the ratio") {
    val r = q("q382_jackknife_ratio")
      .select("m_months", "r_hat", "jack_se")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 12)
    assert(r._2 > 0)
    assert(r._3 >= 0 && r._3 < r._2,
      s"SE ${r._3} not inside (0, r_hat ${r._2})")
  }

  test("q383: deff >= 1 and n_eff <= n (Cauchy-Schwarz)") {
    val r = q("q383_kish_design_effect")
      .select("n", "n_eff", "deff").as[(Long, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0 && r._2 <= r._1 + 1e-6,
      s"n_eff ${r._2} above n ${r._1}")
    assert(r._3 >= 1.0 - 1e-9, s"deff ${r._3} below 1")
    // deff * n_eff = n exactly (both from the same moments)
    assert(math.abs(r._3 * r._2 - r._1) / r._1 < 1e-2)
  }

  test("q384: stationary mass is conserved up to truncation loss") {
    val rows = q("q384_markov_stationary")
      .select("event_type", "p_units", "stationary")
      .as[(String, Long, Double)].collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r._2 >= 0))
    val mass = rows.map(_._2).sum
    // truncating division loses at most k units per state per step
    assert(mass <= 1000000000L,
      s"mass $mass exceeds one (impossible under truncation)")
    assert(mass > 990000000L, s"mass $mass lost more than 1%")
  }

  test("q385: KS distance is a proper fraction; CV is positive") {
    val r = q("q385_interarrival_expcheck")
      .select("n_gaps", "mean_gap_s", "cv", "ks_d")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0)
    assert(r._3 > 0)
    assert(r._4 >= 0 && r._4 <= 1, s"KS ${r._4} outside [0,1]")
  }
}
