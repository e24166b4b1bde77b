package graft

/** Semantic invariants for the q431-q435 clustering-validation pack:
  * ARI/FM bounds and cross-consistency, V-measure harmonic identity,
  * purity ordering, and balance-panel accounting. */
class Pack65Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q431: ARI is inside [-1, 1] and positive for real structure") {
    val r = q("q431_adjusted_rand")
      .select("n_vecs", "same_pair_mass", "ari")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 500)
    assert(r._2 > 0)
    assert(r._3 >= -1 && r._3 <= 1)
    // labels are geometrically recoverable (q380), so ARI must beat 0
    assert(r._3 > 0, s"ARI ${r._3} at or below chance")
  }

  test("q432: V-measure is the harmonic mean of h and c") {
    val r = q("q432_v_measure")
      .select("homogeneity", "completeness", "v_measure")
      .as[(Double, Double, Double)].head()
    assert(r._1 >= -1e-6 && r._1 <= 1 + 1e-9)
    assert(r._2 >= -1e-6 && r._2 <= 1 + 1e-9)
    val harm = 2 * r._1 * r._2 / (r._1 + r._2)
    assert(math.abs(r._3 - harm) < 1e-4,
      s"V ${r._3} != harmonic $harm")
  }

  test("q433: purity bounds and the F between them") {
    val r = q("q433_purity")
      .select("n_vecs", "purity", "inverse_purity", "purity_f")
      .as[(Long, Double, Double, Double)].head()
    assert(r._2 > 0.1 && r._2 <= 1 + 1e-9)
    assert(r._3 > 0.1 && r._3 <= 1 + 1e-9)
    assert(r._4 <= math.max(r._2, r._3) + 1e-9)
    assert(r._4 >= math.min(r._2, r._3) - 1e-9)
  }

  test("q434: FM is the geometric mean of pair precision and recall") {
    val r = q("q434_fowlkes_mallows")
      .select("tp_pairs", "true_pairs", "assigned_pairs",
        "fowlkes_mallows")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0 && r._1 <= math.min(r._2, r._3))
    val fm = r._1 / math.sqrt(r._2.toDouble * r._3)
    assert(math.abs(r._4 - fm) < 1e-4)
    assert(r._4 > 0 && r._4 <= 1 + 1e-9)
  }

  test("q435: balance entropy in (0, 1]; chi2 nonnegative") {
    val r = q("q435_cluster_balance")
      .select("k_clusters", "balance_entropy", "max_min_ratio",
        "uniform_chi2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 10)
    assert(r._2 > 0 && r._2 <= 1 + 1e-6)
    assert(r._3 >= 1)
    assert(r._4 >= 0)
  }
}
