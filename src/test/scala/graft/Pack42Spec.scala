package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q316-q320 pack: sign/df laws for the
  * Welch test, the ANOVA sum-of-squares partition, the CUPED
  * var-reduction = corr² law, the Theil's U ratio identity, and
  * richness-constant bounds. */
class Pack42Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q316: t and d share the mean-diff sign; df sits inside its bounds") {
    val r = q("q316_welch_ttest")
      .select("n1", "n0", "mean_diff", "t_stat", "df", "cohen_d")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(math.signum(r._3) == math.signum(r._4))
    assert(math.signum(r._3) == math.signum(r._6))
    val lo = math.min(r._1, r._2).toDouble - 1
    val hi = (r._1 + r._2).toDouble - 2
    assert(r._5 >= lo - 1e-6 && r._5 <= hi + 1e-6,
      s"df ${r._5} outside [$lo, $hi]")
  }

  test("q317: SSB + SSW equals the total sum of squares") {
    val r = q("q317_anova_f")
      .select("n", "k", "ss_between", "ss_within", "f_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._3 >= 0 && r._4 >= 0 && r._5 >= 0)
    val tot = graft.sources.Tables.load(spark, sfDir, "customer")
      .select((round(col("c_acctbal") * 100).cast("long") / 100.0)
        .as("bal"))
      .agg((var_pop(col("bal")) * count(lit(1))).as("ss"))
      .as[Double].head()
    assert(math.abs(r._3 + r._4 - tot) / tot < 1e-6,
      s"SSB+SSW ${r._3 + r._4} != total SS $tot")
  }

  test("q318: CUPED variance reduction equals corr(pre, post) squared") {
    val r = q("q318_cuped")
      .select("n", "n1", "theta", "diff_raw", "diff_adj", "var_reduction")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 > r._2 && r._2 > 0)
    assert(r._6 >= 0 && r._6 < 1.0)
    val spend = graft.sources.Tables.load(spark, sfDir, "orders")
      .where(year(col("o_orderdate")).isin(1995, 1996))
      .groupBy("o_custkey")
      .agg(sum(when(year(col("o_orderdate")) === 1995,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("pre"),
        sum(when(year(col("o_orderdate")) === 1996,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("post"))
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("pre"), lit(0L)).cast("double").as("pre"),
        coalesce(col("post"), lit(0L)).cast("double").as("post"))
      .agg(corr(col("pre"), col("post"))).as[Double].head()
    assert(math.abs(r._6 - c * c) < 1e-4,
      s"var_reduction ${r._6} != corr^2 ${c * c}")
  }

  test("q319: Theil's U is the RMSE ratio") {
    val r = q("q319_theil_u")
      .select("n_months", "rmse_naive", "rmse_seasonal", "theil_u")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0 && r._3 > 0)
    assert(math.abs(r._4 - r._3 / r._2) < 1e-3,
      s"U ${r._4} != ratio ${r._3 / r._2}")
  }

  test("q320: richness constants live in their documented ranges") {
    val r = q("q320_yule_k")
      .select("d", "n", "yule_k", "herdan_c", "guiraud_r", "simpson_repeat")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 >= r._1)
    assert(r._3 > 0)
    assert(r._4 > 0 && r._4 <= 1.0)
    assert(r._5 > 0)
    assert(r._6 >= 0 && r._6 <= 1.0)
    // Yule's K and the Simpson repeat rate measure the same repeat mass:
    // K = 1e4 * repeat / N^2 vs S = repeat / (N(N-1))
    val impliedS = r._3 / 10000.0 * r._2.toDouble / (r._2 - 1).toDouble
    assert(math.abs(impliedS - r._6) < 1e-6,
      s"K-implied repeat rate $impliedS != ${r._6}")
  }
}
