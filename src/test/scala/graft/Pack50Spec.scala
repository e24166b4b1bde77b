package graft

/** Semantic invariants for the q356-q360 pack: Wilcoxon rank-sum
  * accounting, MI/entropy information inequalities, JS divergence
  * bounds, Wasserstein nonnegativity vs the mean gap, and the
  * Cliff's-delta ↔ Vargha-Delaney A identity. */
class Pack50Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q356: signed-rank sum is inside [0, n(n+1)/2] and z is finite") {
    val r = q("q356_wilcoxon_signed_rank")
      .select("n_pairs", "w_plus", "z").as[(Long, Double, Double)].head()
    assert(r._1 > 0 && r._1 <= 12)
    val maxSum = r._1 * (r._1 + 1) / 2.0
    assert(r._2 >= 0 && r._2 <= maxSum, s"W+ ${r._2} outside [0, $maxSum]")
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("q357: MI obeys 0 <= MI <= min(Hx, Hy) and NMI is in [0, 1]") {
    val r = q("q357_mutual_information")
      .select("n", "mi_nats", "h_priority", "h_segment", "nmi")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0)
    // grid rounding can push MI a hair below zero on independent columns
    assert(r._2 >= -1e-6, s"MI ${r._2} < 0")
    assert(r._2 <= math.min(r._3, r._4) + 1e-6)
    assert(r._3 > 0 && r._4 > 0)
    assert(r._5 >= -1e-6 && r._5 <= 1.0 + 1e-9)
  }

  test("q358: JS divergence is inside [0, ln 2] and bits = nats/ln2") {
    val r = q("q358_jensen_shannon")
      .select("vocab_en", "vocab_de", "vocab_union", "js_nats", "js_bits")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= math.max(r._1, r._2), "union smaller than a side")
    assert(r._4 >= 0 && r._4 <= math.log(2.0) + 1e-6,
      s"JS ${r._4} outside [0, ln2]")
    assert(math.abs(r._5 - r._4 / math.log(2.0)) < 1e-4)
    // the synthetic corpus shares one generator vocabulary across
    // langs, so separation is small — but the sf0.001 fixture measures
    // JS ≈ 2e-3 nats, so a calibrated floor of 1e-4 catches a
    // regression that collapses the divergence to numerical noise
    // while leaving 20× headroom for fixture drift
    assert(r._4 > 1e-4, s"JS ${r._4} below calibrated floor 1e-4")
  }

  test("q359: W1 >= |mean difference| (Jensen) and is positive") {
    val r = q("q359_wasserstein_distance")
      .select("n_urgent", "n_low", "w1_dollars")
      .as[(Long, Long, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 0)
    // W1 between two distributions dominates the absolute mean gap
    val means = spark.read.parquet(s"$sfDir/orders.parquet")
      .where($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.avg($"o_totalprice").as("m"))
      .select("m").as[Double].collect()
    val meanGap = math.abs(means(0) - means(1))
    assert(r._3 >= meanGap - 1e-3,
      s"W1 ${r._3} below the mean gap $meanGap")
  }

  test("q360: pair masses account for n_a*n_b and A = (delta+1)/2") {
    val r = q("q360_cliffs_delta")
      .select("n_urgent", "n_low", "greater", "less", "ties",
        "cliffs_delta", "vd_a")
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    assert(r._3 + r._4 + r._5 == r._1 * r._2,
      s"gt+lt+ties ${r._3 + r._4 + r._5} != n_a*n_b ${r._1 * r._2}")
    assert(r._6 >= -1.0 && r._6 <= 1.0)
    // Vargha-Delaney A relates to delta by A = (delta + 1) / 2
    assert(math.abs(r._7 - (r._6 + 1.0) / 2.0) < 1e-5,
      s"A ${r._7} != (delta+1)/2 ${(r._6 + 1.0) / 2.0}")
  }
}
