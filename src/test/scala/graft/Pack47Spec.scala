package graft

/** Semantic invariants for the q341-q345 pack: kappa bounds, the
  * confusion-panel identities, KS vs AUC ordering laws, PSI
  * nonnegativity, and HL accounting. */
class Pack47Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q341: kappa is chance-corrected agreement inside its bounds") {
    val r = q("q341_cohens_kappa")
      .select("n", "observed_agreement", "expected_agreement", "kappa")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0 && r._2 <= 1.0)
    assert(r._3 > 0 && r._3 < 1.0)
    assert(r._4 <= 1.0 + 1e-9)
    val recomputed = (r._2 - r._3) / (1.0 - r._3)
    assert(math.abs(r._4 - recomputed) < 1e-4)
  }

  test("q342: confusion panel satisfies its identities") {
    val r = q("q342_confusion_panel")
      .select("tp", "fp", "fn", "tn", "precision", "recall", "specificity",
        "f1", "balanced_acc", "mcc")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double,
        Double)].head()
    assert(r._1 > 0 && r._4 > 0)
    // F1 is the harmonic mean of precision and recall
    val hm = 2 * r._5 * r._6 / (r._5 + r._6)
    assert(math.abs(r._8 - hm) < 1e-4, s"f1 ${r._8} != harmonic $hm")
    assert(math.abs(r._9 - (r._6 + r._7) / 2) < 1e-4)
    assert(r._10 >= -1.0 && r._10 <= 1.0)
  }

  test("q343: KS is a valid separation and its rank splits the sample") {
    val r = q("q343_ks_separation")
      .select("positives", "negatives", "ks_rank", "threshold", "ks_stat")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 1 && r._3 < r._1 + r._2)
    assert(r._5 >= 0 && r._5 <= 1.0)
  }

  test("q344: PSI is nonnegative over ten populated buckets") {
    val r = q("q344_psi_drift")
      .select("n_buckets", "psi")
      .as[(Long, Double)].head()
    assert(r._1 == 10, s"expected 10 buckets, got ${r._1}")
    assert(r._2 >= 0, s"PSI ${r._2} negative")
  }

  test("q345: HL groups account for the full test split") {
    val r = q("q345_hosmer_lemeshow")
      .select("n_groups", "n", "df", "hl_stat")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 >= 2 && r._1 <= 5)
    assert(r._3 == r._1 - 2)
    assert(r._4 >= 0)
    // the grouped rows cover every odd-keyed order with a known segment
    val total = q("q313_brier_decomp").select("n").as[Long].head()
    assert(r._2 == total, s"HL n ${r._2} != Brier test n $total")
  }
}
