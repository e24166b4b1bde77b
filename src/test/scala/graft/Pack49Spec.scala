package graft

/** Semantic invariants for the q351-q355 pack: allocation exactness,
  * Bloom sizing monotonicity, A/A null behavior, AUC ranges, and
  * RMST bounds. */
class Pack49Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q351: allocations are positive and sum exactly to 1000") {
    val rows = q("q351_neyman_allocation")
      .select("seg", "nh", "stratum_sd", "allocated")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { r => assert(r._2 > 0 && r._3 > 0 && r._4 > 0) }
    assert(rows.map(_._4).sum == 1000L,
      s"allocations sum to ${rows.map(_._4).sum}")
  }

  test("q352: tighter fpp always needs more bits and a key fits in them") {
    val rows = q("q352_bloom_sizing")
      .select("tbl", "n_keys", "fpp", "bits", "hashes", "mib")
      .as[(String, Long, Double, Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byFpp = rs.sortBy(_._3)
      assert(byFpp.head._4 > byFpp.last._4,
        "0.1% fpp must need more bits than 1%")
    }
    rows.foreach { r =>
      assert(r._4 > r._2, "fewer bits than keys cannot hold the set")
      assert(r._5 >= 1 && r._5 <= 20)
    }
  }

  test("q353: the A/A harness does not systematically reject") {
    val r = q("q353_aa_audit")
      .select("n_splits", "n_significant", "max_abs_z", "mean_abs_z")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 16)
    assert(r._2 <= 4, s"${r._2}/16 A/A splits flagged — harness biased")
    assert(r._3 >= r._4 && r._4 >= 0)
  }

  test("q354: per-year AUCs are proper probabilities over real classes") {
    val rows = q("q354_auc_decay")
      .select("year", "positives", "negatives", "auc")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r._2 > 0 && r._3 > 0)
      assert(r._4 >= 0 && r._4 <= 1.0)
    }
  }

  test("q355: RMST is bounded by tau and exceeds the survival floor") {
    val r = q("q355_rmst")
      .select("tau", "rmst", "median_survival")
      .as[(Long, Double, Long)].head()
    assert(r._1 == 60)
    assert(r._2 > 0 && r._2 <= r._1.toDouble + 1e-6)
    assert(r._3 >= 0 && r._3 <= r._1)
    // the curve's area exceeds tau * S(tau) >= 0; and at least the
    // median's worth of full survival
    assert(r._2 >= r._3 * 0.5 - 1e-6)
  }
}
