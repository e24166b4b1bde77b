package graft

/** Semantic invariants for the q466-q470 reliability pack: alpha
  * bounds, Spearman-Brown consistency, correlation matrix symmetry
  * bounds, item-total positivity for parallel items, and the SEM
  * identity. */
class Pack72Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q466: alpha is at most 1 and positive for parallel items") {
    val r = q("q466_cronbach_alpha")
      .select("n_months", "k_items", "alpha")
      .as[(Long, Long, Double)].head()
    assert(r._1 > 12 && r._2 == 5)
    assert(r._3 <= 1.0 + 1e-9)
    // five co-moving monthly revenue series: internally consistent
    assert(r._3 > 0, s"alpha ${r._3} nonpositive")
  }

  test("q467: Spearman-Brown is consistent with the half correlation") {
    val r = q("q467_split_half")
      .select("n_months", "half_r", "spearman_brown")
      .as[(Long, Double, Double)].head()
    assert(math.abs(r._2) <= 1.0 + 1e-9)
    val sb = 2 * r._2 / (1 + r._2)
    assert(math.abs(r._3 - sb) < 1e-4)
  }

  test("q468: all ten inter-item correlations are valid") {
    val rows = q("q468_interitem_correlations")
      .select("item_a", "item_b", "r").as[(Long, Long, Double)]
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._1 < r._2)
      assert(math.abs(r._3) <= 1.0 + 1e-9)
    }
  }

  test("q469: every item correlates with the rest of the scale") {
    val rows = q("q469_item_total")
      .select("item", "item_total_r").as[(Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(math.abs(r._2) <= 1.0 + 1e-9))
  }

  test("q470: SEM = sd*sqrt(1-alpha) and is below the total sd") {
    val r = q("q470_sem")
      .select("n_months", "sd_total_dollars", "alpha", "sem_dollars")
      .as[(Long, Double, Double, Double)].head()
    assert(r._2 > 0)
    val sem = r._2 * math.sqrt(math.max(0.0, 1 - r._3))
    assert(math.abs(r._4 - sem) < 0.02)
    assert(r._4 <= r._2 + 1e-9)
  }
}
