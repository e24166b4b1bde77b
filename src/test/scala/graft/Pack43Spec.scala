package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q321-q325 pack: Shapley efficiency,
  * the Little's-law identity, z²=χ² for the trend test, Gumbel fit
  * ordering, and RANSAC consensus bounds. */
class Pack43Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q321: Shapley efficiency — credits sum to v(N) - v(empty)") {
    val rows = q("q321_shapley_attribution")
      .select("channel", "phi6", "phi", "share")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("click", "error", "view"))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 3e-6)
    // independent recompute of v(N) and v(empty)
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val perUser = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase", col("ts")))
        .as("firstp"))
    val flags = ev.join(perUser, "user_id")
      .groupBy("user_id", "firstp")
      .agg(max(when(col("event_type").isin("click", "view", "error") &&
        (col("firstp").isNull || col("ts") < col("firstp")), 1L)
        .otherwise(0L)).as("any"))
      .select(col("firstp").isNotNull.cast("long").as("conv"), col("any"))
    val (convAll, convEmpty) = flags
      .agg(sum(col("conv")), sum(col("conv") * (lit(1L) - col("any"))))
      .as[(Long, Long)].head()
    assert(rows.map(_._2).sum == 6L * (convAll - convEmpty),
      s"phi6 sum ${rows.map(_._2).sum} != 6*(${convAll} - ${convEmpty})")
  }

  test("q322: the two Little's-law measurement paths agree exactly") {
    val r = q("q322_littles_law")
      .select("n_sessions", "lambda_per_hr", "w_mean_min", "l_avg", "ratio")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0 && r._3 >= 30.0 && r._4 > 0)
    assert(r._5 == 1.0, s"L != lambda*W: ratio ${r._5}")
  }

  test("q323: the trend z squares to the chi-square statistic") {
    val r = q("q323_cochran_armitage")
      .select("n", "r", "z", "chi2_trend")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > r._2 && r._2 > 0)
    assert(math.abs(r._3 * r._3 - r._4) < 1e-4,
      s"z^2 ${r._3 * r._3} != chi2 ${r._4}")
  }

  test("q324: Gumbel location sits below the mean and the return level") {
    val r = q("q324_gumbel_maxima")
      .select("n_blocks", "empirical_max", "mu", "beta", "return_level_99")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 12)
    assert(r._4 > 0)
    assert(r._5 > r._3, "99% return level must exceed the location")
    assert(r._2 > r._3, "empirical max below the fitted location")
  }

  test("q325: RANSAC consensus is a valid share from a valid trial") {
    val r = q("q325_ransac_trend")
      .select("best_trial", "inliers", "n", "slope", "intercept",
        "consensus")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 >= 1 && r._1 <= 16)
    assert(r._2 >= 2 && r._2 <= r._3, "the two sampled points are inliers")
    assert(r._6 > 0 && r._6 <= 1.0)
    assert(math.abs(r._6 - r._2.toDouble / r._3) < 1e-6)
  }
}
