package graft

/** Semantic invariants for the q366-q370 forecast-evaluation pack:
  * MASE scale accounting, pinball-loss convexity in τ, tracking-signal
  * bounds, the CRPS ≤ mean-cross inequality, and Diebold-Mariano
  * internal consistency. */
class Pack52Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q366: MASE is positive and MAE is in plausible dollar range") {
    val r = q("q366_mase")
      .select("n_forecasts", "mae_seasonal_dollars", "mase")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 0, "no seasonal forecasts (need > 12 months)")
    assert(r._2 > 0)
    assert(r._3 > 0 && !r._3.isInfinite)
  }

  test("q367: nine deciles, monotone quantiles, nonnegative loss") {
    val rows = q("q367_pinball_loss")
      .orderBy("tau")
      .select("tau", "q_forecast_dollars", "pinball_dollars")
      .as[(Double, Double, Double)].collect()
    assert(rows.length == 9, s"expected 9 deciles, got ${rows.length}")
    // quantile forecasts are nondecreasing in tau
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"q(${a._1}) ${a._2} > q(${b._1}) ${b._2}")
    }
    rows.foreach { r =>
      assert(r._3 >= 0, s"pinball loss ${r._3} negative at tau ${r._1}")
    }
  }

  test("q368: tracking signal magnitude is bounded by the month index") {
    val r = q("q368_tracking_signal")
      .select("n_months", "ts_final", "max_abs_ts")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 1)
    // |cum error| <= cum MAE, so |TS_t| = t*|cume|/cumae <= t <= n
    assert(math.abs(r._2) <= r._1 + 1e-6)
    assert(r._3 >= math.abs(r._2) - 1e-9, "max |TS| below the final TS")
    assert(r._3 <= r._1 + 1e-6)
  }

  test("q369: 0 <= CRPS <= mean cross distance") {
    val r = q("q369_crps")
      .select("n_forecast", "n_actual", "mean_cross_dollars",
        "crps_dollars")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 > 0)
    // CRPS = cross - half-within >= 0 and <= the cross mean
    assert(r._4 >= -1e-6, s"CRPS ${r._4} negative")
    assert(r._4 <= r._3 + 1e-6, s"CRPS ${r._4} above cross mean ${r._3}")
  }

  test("q370: DM statistic is finite; mean differential is small vs MAE") {
    val r = q("q370_diebold_mariano")
      .select("n_months", "mean_d_dollars", "dm_stat")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 1)
    assert(!r._3.isNaN && !r._3.isInfinite)
    // same months feed q366's MAE; the differential can't exceed the
    // larger of the two per-month absolute errors' scale
    val mae = q("q366_mase").select("mae_seasonal_dollars")
      .as[Double].head()
    assert(math.abs(r._2) <= 10 * mae + 1e-6,
      s"mean loss differential ${r._2} implausibly large vs MAE $mae")
  }
}
