package graft

/** Semantic invariants for the q441-q445 trade-flow pack: gravity
  * betas finite, balances sum to zero, diversification bounds,
  * regionalization accounting, and share-stability bounds. */
class Pack67Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q441: gravity betas are finite on the full flow lattice") {
    val r = q("q441_trade_gravity")
      .select("n_flows", "beta_customer", "beta_supplier")
      .as[(Long, Double, Double)].head()
    assert(r._1 > 100, s"only ${r._1} flows")
    assert(!r._2.isNaN && !r._2.isInfinite)
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("q442: net positions sum to zero across nations") {
    val rows = q("q442_trade_balance")
      .select("nation", "exports_dollars", "imports_dollars",
        "net_dollars")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length == 25)
    // every cent someone exports, someone imports
    assert(math.abs(rows.map(_._4).sum) < 1.0,
      s"net positions sum to ${rows.map(_._4).sum}")
    rows.foreach { r =>
      assert(math.abs(r._4 - (r._2 - r._3)) < 0.02)
    }
  }

  test("q443: effective partners lie in [1, n_partners]") {
    val rows = q("q443_partner_diversification")
      .select("nation", "n_partners", "entropy", "effective_partners")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r._3 >= 0)
      assert(r._4 >= 1.0 - 1e-6 && r._4 <= r._2 + 1e-6,
        s"${r._1}: exp(H) ${r._4} outside [1, ${r._2}]")
    }
  }

  test("q444: intra-region share is a proper fraction") {
    val r = q("q444_regionalization")
      .select("intra_region_share", "chi2_per_cent")
      .as[(Double, Double)].head()
    assert(r._1 > 0 && r._1 < 1)
    assert(r._2 >= 0)
  }

  test("q445: share changes are bounded by the share range") {
    val rows = q("q445_share_stability")
      .select("nation", "n_years", "mean_abs_share_change")
      .as[(String, Long, Double)].collect()
    // the small-SF supplier pool covers only part of the nation set
    assert(rows.length >= 5 && rows.length <= 25)
    rows.foreach { r =>
      assert(r._2 >= 1)
      assert(r._3 >= 0 && r._3 <= 1.0)
    }
  }
}
