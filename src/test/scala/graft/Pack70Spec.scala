package graft

/** Semantic invariants for the q456-q460 ML-ops pack: conformal
  * coverage near its nominal level, OOD fractions small, noise
  * accounting vs q380's recall, acquisition ordering, and
  * margin-reliability monotone trend. */
class Pack70Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q456: conformal coverage lands near the 90% nominal level") {
    val r = q("q456_conformal_coverage")
      .select("n_cal", "n_test", "q_hat_dollars", "coverage")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 100 && r._2 > 100)
    assert(r._3 > 0)
    // split conformal guarantees >= 0.9 in expectation; allow finite-
    // sample slack on one split
    assert(r._4 > 0.85 && r._4 <= 1.0,
      s"coverage ${r._4} far from the 0.9 nominal")
  }

  test("q457: OOD fractions are small under the chi2 radius") {
    val rows = q("q457_mahalanobis_ood")
      .select("label", "n", "n_outside", "frac_outside")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._3 <= r._2)
      // nominal 2.5% tail; generous ceiling for non-normal clusters
      assert(r._4 <= 0.5, s"label ${r._1}: ${r._4} outside")
    }
  }

  test("q458: strong suspects nest inside misassigned") {
    val rows = q("q458_label_noise")
      .select("label", "n", "n_misassigned", "n_strong_suspects")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sum == 500)
    rows.foreach { r =>
      assert(r._4 <= r._3 && r._3 <= r._2)
    }
  }

  test("q459: acquisition list is the 10 smallest margins in order") {
    val rows = q("q459_uncertainty_acquisition")
      .select("vec_id", "own", "best", "second", "margin")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._5 >= 0, "best-vs-second margin cannot be negative")
      assert(r._3 != r._4, "best and second must differ")
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._5 + 1e-9)
      case _ => ()
    }
  }

  test("q460: accuracy rises from the lowest to the highest quintile") {
    val rows = q("q460_margin_reliability")
      .orderBy("margin_quintile")
      .select("margin_quintile", "n", "accuracy")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._2).sum == 500)
    // confidence should track correctness at the extremes
    assert(rows.last._3 >= rows.head._3,
      s"top-margin accuracy ${rows.last._3} below bottom ${rows.head._3}")
  }
}
