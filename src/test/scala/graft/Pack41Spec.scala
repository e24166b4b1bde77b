package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q311-q315 pack: McNemar contingency
  * laws, a driver-side exact AP recompute, the Murphy Brier identity,
  * log-rank bounds, and Chao1 estimator laws. */
class Pack41Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q311: discordant counts bound n and chi2 matches its closed form") {
    val r = q("q311_mcnemar")
      .select("n", "b", "c", "chi2", "chi2_cc")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 >= 0 && r._3 >= 0)
    assert(r._2 + r._3 <= r._1)
    val diff = (r._2 - r._3).toDouble
    val expected = math.round(diff * diff / (r._2 + r._3) * 1e6) / 1e6
    assert(math.abs(r._4 - expected) < 1e-9, s"chi2 ${r._4} != $expected")
    assert(r._5 >= 0)
  }

  test("q312: AP matches a driver-side exact recompute on the same grid") {
    val r = q("q312_avg_precision")
      .select("n", "positives", "avg_precision", "precision_at_100")
      .as[(Long, Long, Double, Double)].head()
    assert(r._3 > 0 && r._3 <= 1.0 + 1e-9)
    assert(r._4 >= 0 && r._4 <= 1.0 + 1e-9)
    // exact recompute from the ranked labels (sf0.001-sized collect)
    val ys = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_totalprice"), col("o_orderkey"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
          .as("y"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .select("y").as[Long].collect()
    var cum = 0L
    var gridSum = 0L
    ys.zipWithIndex.foreach { case (y, i) =>
      cum += y
      if (y == 1L) gridSum += cum * 1000000000L / (i + 1L)
    }
    val p = ys.sum
    val expected = math.round(gridSum.toDouble / (p * 1000000000L).toDouble
      * 1e6) / 1e6
    assert(math.abs(r._3 - expected) < 1e-9, s"AP ${r._3} != $expected")
    assert(r._2 == p)
  }

  test("q313: Murphy identity REL - RES + UNC reproduces the Brier score") {
    val r = q("q313_brier_decomp")
      .select("n", "brier", "reliability", "resolution", "uncertainty",
        "identity_check")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0 && r._2 <= 1.0)
    assert(r._3 >= 0 && r._4 >= 0)
    assert(r._5 >= 0 && r._5 <= 0.25 + 1e-9)
    assert(math.abs(r._6 - r._2) < 2e-6,
      s"identity ${r._6} vs brier ${r._2}")
  }

  test("q314: log-rank pieces are positive and chi2 matches (O-E)^2/V") {
    val r = q("q314_logrank")
      .select("o1", "e1", "variance", "chi2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 >= 0 && r._2 > 0 && r._3 > 0)
    val expected = math.round((r._1 - r._2) * (r._1 - r._2) / r._3 * 1e6) /
      1e6
    // chi2 is computed from unrounded decimal sums; compare loosely
    assert(math.abs(r._4 - expected) < 1e-4, s"chi2 ${r._4} != $expected")
  }

  test("q315: Chao1 dominates the observed vocabulary and coverages are sane") {
    val r = q("q315_chao1")
      .select("d", "f1", "f2", "n_tokens", "chao1", "coverage",
        "gt_coverage")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._4 >= r._1)
    assert(r._2 + r._3 <= r._1, "singletons + doubletons exceed distinct")
    assert(r._5 >= r._1.toDouble - 1e-9, "estimator below observed richness")
    assert(r._6 > 0 && r._6 <= 1.0 + 1e-9)
    assert(r._7 >= 0 && r._7 <= 1.0)
  }
}
