package graft

/** Semantic invariants for the q451-q455 shrinkage pack: JS means
  * between raw and grand mean, beta-MoM positivity, spread
  * compression, holdout-MSE sanity, rank-move accounting, and
  * credibility bounds. */
class Pack69Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q451: JS means sit between the raw means and the grand mean") {
    val rows = q("q451_james_stein")
      .select("seg", "raw_mean_dollars", "shrink_c", "js_mean_dollars")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length == 5)
    val c = rows.head._3
    assert(c >= 0 && c <= 1, s"shrink factor $c outside [0,1]")
    rows.foreach { r =>
      assert(r._3 == c, "shrink factor must be common")
      // js is a convex combination of raw and the grand mean
      val gm = (r._4 - c * r._2) / (1 - c + 1e-12)
      assert(!gm.isNaN)
    }
  }

  test("q452: EB shrinkage compresses the rate spread") {
    val r = q("q452_eb_beta_binomial")
      .select("n_customers", "alpha", "beta", "sd_raw", "sd_shrunk")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0 && r._3 > 0, s"MoM gave alpha ${r._2} beta ${r._3}")
    assert(r._5 < r._4, "shrinkage did not compress the spread")
  }

  test("q453: both holdout SSEs are finite and nonnegative") {
    val r = q("q453_stein_holdout")
      .select("k_segments", "sse_raw_dollars2", "sse_js_dollars2")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 5)
    assert(r._2 >= 0 && r._3 >= 0)
    // Stein dominance holds in expectation, not per draw — require
    // only that shrinkage stays within 2x of raw on this one split
    assert(r._3 <= 2 * r._2 + 1e-6,
      s"JS SSE ${r._3} blew up vs raw ${r._2}")
  }

  test("q454: rank moves are valid permutation displacements") {
    val rows = q("q454_shrinkage_rank_moves")
      .select("ck", "n", "x", "r_raw", "r_shr", "move")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._6 == math.abs(r._4 - r._5))
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._6 >= b._6)
      case _ => ()
    }
  }

  test("q455: credibility grows with exposure: Z(10) > Z(1)") {
    val r = q("q455_buhlmann_credibility")
      .select("n_customers", "k_credibility", "z_at_1", "z_at_10")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0, s"K ${r._2} not positive (VHM <= 0?)")
    assert(r._3 > 0 && r._3 < 1)
    assert(r._4 > r._3 && r._4 < 1)
  }
}
