package graft

/** Semantic invariants for the q361-q365 pack: Friedman rank-sum
  * accounting, Jonckheere-Terpstra pair bounds, Brown-Forsythe
  * nonnegativity, energy-distance metric properties, and Mood's
  * median cell accounting. */
class Pack51Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q361: Friedman Q is nonnegative with a plausible block count") {
    val r = q("q361_friedman_test")
      .select("n_blocks", "k", "q_friedman").as[(Long, Long, Double)]
      .head()
    assert(r._1 > 0, "no complete blocks")
    assert(r._2 == 5L)
    // rounding the rank identity can land a hair below zero
    assert(r._3 >= -1e-6, s"Friedman Q ${r._3} < 0")
    // Q is bounded by n*(k-1) = max when rankings are identical
    assert(r._3 <= r._1 * (r._2 - 1) + 1e-6,
      s"Q ${r._3} above the n(k-1) ceiling")
  }

  test("q362: JT statistic lies inside [0, n1n2+n1n3+n2n3]") {
    val r = q("q362_jonckheere_terpstra")
      .select("n1", "n2", "n3", "jt", "e_jt", "z")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0 && r._3 > 0)
    val maxPairs = (r._1 * r._2 + r._1 * r._3 + r._2 * r._3).toDouble
    assert(r._4 >= 0 && r._4 <= maxPairs,
      s"JT ${r._4} outside [0, $maxPairs]")
    // the null mean must also sit inside the pair-count range
    assert(r._5 > 0 && r._5 < maxPairs)
    assert(!r._6.isNaN && !r._6.isInfinite)
  }

  test("q363: Brown-Forsythe F is nonnegative over the 5 segments") {
    val r = q("q363_brown_forsythe")
      .select("k_groups", "n_total", "f_bf").as[(Long, Long, Double)]
      .head()
    assert(r._1 == 5L)
    assert(r._2 > 0)
    assert(r._3 >= 0, s"F ${r._3} negative")
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("q364: energy distance is nonnegative and below 2*cross mean") {
    val r = q("q364_energy_distance")
      .select("n_urgent", "n_low", "mean_cross_dollars",
        "energy_dist_dollars", "t_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 > 0, "mean cross-distance must be positive")
    // D^2 >= 0 (energy distance is a metric between distributions)
    assert(r._4 >= -1e-6, s"energy distance ${r._4} negative")
    // D^2 = 2C' - A' - B' <= 2C' = 2 * mean cross
    assert(r._4 <= 2 * r._3 + 1e-6)
    // t = na*nb/(na+nb) * D^2, same sign and scale check
    val expectedT = r._1.toDouble * r._2 / (r._1 + r._2) * r._4
    assert(math.abs(r._5 - expectedT) / math.max(1.0, expectedT) < 1e-2,
      s"t ${r._5} vs recomputed $expectedT")
  }

  test("q365: Mood cells partition the pooled sample; chi2 >= 0") {
    val r = q("q365_moods_median")
      .select("a", "b", "c", "d", "ties_dropped", "chi2")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val n = spark.read.parquet(s"$sfDir/orders.parquet")
      .where($"o_orderpriority".isin("1-URGENT", "5-LOW")).count()
    assert(r._1 + r._2 + r._3 + r._4 + r._5 == n,
      s"cells+ties ${r._1 + r._2 + r._3 + r._4 + r._5} != pooled $n")
    // above and below counts are split by the grand median: each side
    // holds at most half the kept sample plus rounding slack
    val kept = r._1 + r._2 + r._3 + r._4
    assert(math.abs((r._1 + r._3) - (r._2 + r._4)) <= r._5 + 2,
      "above/below split unbalanced beyond median-tie slack")
    assert(kept > 0)
    assert(r._6 >= 0, s"chi2 ${r._6} negative")
  }
}
