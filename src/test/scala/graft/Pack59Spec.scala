package graft

/** Semantic invariants for the q401-q405 pricing-econometrics pack:
  * elasticity sign/R² bounds, RFM cell accounting, discount-panel
  * coverage, variance-share complementarity, and concentration-ratio
  * ordering. */
class Pack59Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q401: within R2 lies in [0,1]; elasticity is finite") {
    val r = q("q401_fe_price_elasticity")
      .select("n_lines", "n_parts", "elasticity", "r2_within")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > r._2, "need multiple lines per part on average")
    assert(!r._3.isNaN && !r._3.isInfinite)
    assert(r._4 >= 0 && r._4 <= 1.0 + 1e-9,
      s"within R2 ${r._4} outside [0,1]")
  }

  test("q402: RFM cells partition the customer base evenly-ish") {
    val rows = q("q402_rfm_segmentation")
      .select("r_score", "f_score", "n_customers",
        "avg_monetary_dollars")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r._1 >= 1 && r._1 <= 5 && r._2 >= 1 && r._2 <= 5)
      assert(r._3 > 0 && r._4 > 0)
    }
    val total = rows.map(_._3).sum
    val nCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"cells cover $total of $nCust customers")
  }

  test("q403: discount panel covers the 11 levels and all lines") {
    val rows = q("q403_discount_lift")
      .select("discount_pct", "n_lines", "mean_qty", "mean_rev_dollars")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 11, s"expected 11 levels, got ${rows.length}")
    assert(rows.map(_._1).sorted.sameElements(0L to 10L))
    rows.foreach { r =>
      assert(r._3 >= 1.0 && r._3 <= 50.0)
      assert(r._4 > 0)
    }
  }

  test("q404: within + between shares are complementary") {
    val r = q("q404_price_dispersion")
      .select("n_lines", "n_parts", "within_share", "between_share")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 0 && r._4 >= 0)
    assert(math.abs(r._3 + r._4 - 1.0) < 1e-4,
      s"shares ${r._3} + ${r._4} != 1")
    // this generator draws unit prices per line, so within-part
    // dispersion dominates; both components must still be present
    assert(r._3 > 0 && r._4 > 0, "a variance component vanished")
  }

  test("q405: CR1 <= CR2 <= 1 and HHI is inside [CR1^2/k-ish, 1]") {
    val r = q("q405_supplier_concentration")
      .select("n_parts", "mean_cr1", "mean_cr2", "mean_hhi",
        "frac_monopoly")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0 && r._2 <= 1.0 + 1e-9)
    assert(r._3 >= r._2 - 1e-9, "CR2 below CR1")
    assert(r._3 <= 1.0 + 1e-9)
    // HHI >= CR1^2 pointwise, so the means obey the same inequality
    assert(r._4 >= r._2 * r._2 - 0.1)
    assert(r._4 <= 1.0 + 1e-9)
    assert(r._5 >= 0 && r._5 <= 1)
  }
}
