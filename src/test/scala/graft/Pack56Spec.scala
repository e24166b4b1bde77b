package graft

/** Semantic invariants for the q386-q390 two-sample EDF pack: CvM
  * nonnegativity vs the KS bound, AD positivity, Brunner-Munzel ↔
  * Cliff's-delta consistency, Ansari-Bradley/Lepage accounting, and
  * the Kuiper ≥ KS dominance. */
class Pack56Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q386: CvM T is positive and bounded by the KS-square scale") {
    val r = q("q386_cramer_von_mises")
      .select("n_urgent", "n_low", "cvm_t")
      .as[(Long, Long, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 > 0, s"CvM ${r._3} not positive")
    // T <= N * D^2 where D <= 1, so T <= N; crude ceiling sanity
    assert(r._3 <= (r._1 + r._2).toDouble)
  }

  test("q387: AD A2 is positive and dominates CvM scale-wise") {
    val ad = q("q387_anderson_darling")
      .select("n_urgent", "n_low", "ad_a2")
      .as[(Long, Long, Double)].head()
    assert(ad._1 > 0 && ad._2 > 0)
    assert(ad._3 > 0, s"AD ${ad._3} not positive")
  }

  test("q388: p_hat matches Vargha-Delaney A from q360 exactly") {
    val bm = q("q388_brunner_munzel")
      .select("n_urgent", "n_low", "p_hat", "bm_stat")
      .as[(Long, Long, Double, Double)].head()
    assert(bm._3 >= 0 && bm._3 <= 1, s"p_hat ${bm._3} outside [0,1]")
    assert(!bm._4.isNaN && !bm._4.isInfinite)
    // p_hat here is P(urgent < low) + ties/2 = 1 - VD-A of q360
    val vda = q("q360_cliffs_delta").select("vd_a").as[Double].head()
    assert(math.abs(bm._3 - (1.0 - vda)) < 1e-4,
      s"p_hat ${bm._3} != 1 - VD-A ${1.0 - vda}")
  }

  test("q389: AB scores account for the triangular total") {
    val r = q("q389_ansari_bradley_lepage")
      .select("n_urgent", "n_low", "ab_stat", "z_ab", "z_w", "lepage")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val nn = r._1 + r._2
    // the full-score total is T(N); the urgent share must be inside
    // (0, T(N)) and roughly proportional to na/N
    val m1 = (nn + 1) / 2
    val tn = m1 * (m1 + 1) / 2 +
      (if (nn > m1) (1L + (nn - m1)) * (nn - m1) / 2 else 0L)
    assert(r._3 > 0 && r._3 < tn.toDouble,
      s"AB ${r._3} outside (0, $tn)")
    assert(!r._4.isNaN && !r._5.isNaN)
    assert(math.abs(r._6 - (r._4 * r._4 + r._5 * r._5)) < 1e-4,
      "Lepage != z_ab^2 + z_w^2")
  }

  test("q390: Kuiper V = D+ + D- and dominates the one-sided gaps") {
    val r = q("q390_kuiper")
      .select("n_urgent", "n_low", "d_plus", "d_minus", "v_stat",
        "v_scaled")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._3 >= 0 && r._3 <= 1)
    assert(r._4 >= 0 && r._4 <= 1)
    assert(math.abs(r._5 - (r._3 + r._4)) < 1e-5, "V != D+ + D-")
    assert(r._5 >= math.max(r._3, r._4) - 1e-9)
    assert(r._6 >= 0)
  }
}
