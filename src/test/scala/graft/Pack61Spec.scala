package graft

/** Semantic invariants for the q411-q415 categorical-association
  * pack: MH/CMH positivity, Cochran's Q bounds, Stuart-Maxwell
  * nonnegativity, weighted-kappa range, and lambda's PRE bounds. */
class Pack61Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q411: MH odds ratio is positive; CMH chi2 is nonnegative") {
    val r = q("q411_mantel_haenszel")
      .select("n_strata", "or_mh", "cmh_chi2")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 5)
    assert(r._2 > 0 && !r._2.isInfinite)
    assert(r._3 >= 0 && !r._3.isInfinite)
  }

  test("q412: Cochran's Q is nonnegative with 5 treatments") {
    val r = q("q412_cochrans_q")
      .select("k_treatments", "n_successes", "q_cochran")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 5)
    // each segment is above its own mean in some but not all months
    assert(r._2 > 0 && r._2 < 60)
    assert(r._3 >= 0 && !r._3.isInfinite)
  }

  test("q413: Stuart-Maxwell chi2 >= 0 and vanishes iff d = 0") {
    val r = q("q413_stuart_maxwell")
      .select("n_customers", "d1", "d2", "chi2")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0)
    assert(r._4 >= -1e-9, s"chi2 ${r._4} negative")
    if (r._2 == 0 && r._3 == 0)
      assert(math.abs(r._4) < 1e-9, "chi2 != 0 with zero differences")
    else assert(r._4 > 0)
  }

  test("q414: weighted kappa lies in [-1, 1]") {
    val r = q("q414_weighted_kappa")
      .select("n_customers", "kappa_w").as[(Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= -1.0 - 1e-9 && r._2 <= 1.0 + 1e-9,
      s"kappa_w ${r._2} outside [-1, 1]")
  }

  test("q415: lambda is a proportional-reduction-in-error in [0, 1]") {
    val r = q("q415_goodman_kruskal_lambda")
      .select("n_orders", "sum_row_modes", "global_mode", "lambda")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0)
    // row modes can never predict worse than the global mode
    assert(r._2 >= r._3, "sum of row modes below the global mode")
    assert(r._2 <= r._1)
    assert(r._4 >= -1e-9 && r._4 <= 1.0 + 1e-9,
      s"lambda ${r._4} outside [0, 1]")
  }
}
