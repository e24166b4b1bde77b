package graft

/** Semantic invariants for the q326-q330 pack: drawdown accounting,
  * the DW ↔ ρ₁ identity, leverage bounds, inequality-index ranges,
  * and Moran's I expectation. */
class Pack44Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q326: drawdown reconciles peak minus trough and depth is a share") {
    val r = q("q326_max_drawdown")
      .select("trough_month", "peak_rev", "trough_rev", "max_drawdown",
        "depth")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._2 >= r._3)
    assert(math.abs((r._2 - r._3) - r._4) < 0.011)
    assert(r._5 >= 0 && r._5 < 1.0)
  }

  test("q327: DW lives in [0,4] and encodes rho1") {
    val r = q("q327_durbin_watson")
      .select("n_months", "dw", "rho1_approx")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 24)
    assert(r._2 >= 0 && r._2 <= 4.0)
    assert(math.abs(r._3 - (1.0 - r._2 / 2.0)) < 1e-6)
    assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9)
  }

  test("q328: top-5 influence is sorted with valid leverages") {
    val rows = q("q328_cooks_distance")
      .select("ym", "residual", "leverage", "cooks_d")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4 - 1e-9, "not sorted by D")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r._3 > 0 && r._3 < 1.0, s"leverage ${r._3} out of (0,1)")
      assert(r._4 >= 0)
    }
  }

  test("q329: inequality indices sit in their documented ranges") {
    val r = q("q329_inequality_panel")
      .select("n", "mean_spend", "atkinson_05", "theil_t", "palma")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 0 && r._3 < 1.0)
    assert(r._4 >= 0)
    assert(r._5 > 0)
  }

  test("q330: Moran's I is bounded and the null expectation is -1/(n-1)") {
    val r = q("q330_morans_i")
      .select("n_nations", "s0", "morans_i", "expected_i")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 25)
    assert(r._2 > 0 && r._2 <= r._1 * (r._1 - 1))
    assert(r._3 >= -1.5 && r._3 <= 1.5, s"Moran's I ${r._3} out of range")
    assert(math.abs(r._4 - (-1.0 / (r._1 - 1))) < 1e-6)
  }
}
