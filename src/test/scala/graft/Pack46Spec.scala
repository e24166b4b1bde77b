package graft

/** Semantic invariants for the q336-q340 pack: Chow SSE ordering,
  * Grubbs bounds, Jarque-Bera reconstruction, Granger nesting, and
  * RAKE score laws. */
class Pack46Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q336: split fits never lose to the pooled fit") {
    val r = q("q336_chow_test")
      .select("n_months", "break_x", "f_stat", "sse_ratio")
      .as[(Long, Long, Double, Double)].head()
    assert(r._2 > 0 && r._2 < r._1)
    assert(r._4 > 0 && r._4 <= 1.0 + 1e-9,
      s"split SSE ${r._4} exceeds pooled")
    assert(r._3 >= -1e-9)
  }

  test("q337: Grubbs G is positive and below the theoretical maximum") {
    val r = q("q337_grubbs")
      .select("n_months", "outlier_month", "value", "g_stat")
      .as[(Long, Long, Double, Double)].head()
    assert(r._4 > 0)
    // |x - xbar|/s <= (n-1)/sqrt(n) for any sample
    val bound = (r._1 - 1).toDouble / math.sqrt(r._1.toDouble)
    assert(r._4 <= bound + 1e-6, s"G ${r._4} above bound $bound")
  }

  test("q338: JB reconstructs from its skewness and kurtosis parts") {
    val r = q("q338_jarque_bera")
      .select("n_orders", "skewness", "excess_kurtosis", "jb_stat")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._4 >= 0)
    val jb = r._1 / 6.0 * (r._2 * r._2 + r._3 * r._3 / 4.0)
    assert(math.abs(r._4 - jb) / (math.abs(jb) + 1.0) < 1e-4,
      s"JB ${r._4} != recomputed $jb")
  }

  test("q339: the unrestricted model never fits worse") {
    val r = q("q339_granger")
      .select("n_days", "ar_coef", "click_coef", "f_stat", "sse_ratio")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 10)
    assert(r._5 > 0 && r._5 <= 1.0 + 1e-9, "SSE_u must not exceed SSE_r")
    assert(r._4 >= -1e-9)
  }

  test("q340: RAKE phrases carry positive scores and multi-word top hits") {
    val rows = q("q340_rake_keywords")
      .select("phrase", "n_occurrences", "score")
      .as[(String, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._1.nonEmpty && !r._1.contains(" the ") &&
        !r._1.startsWith("the ") && !r._1.endsWith(" the"),
        s"stopword leaked into phrase '${r._1}'")
      assert(r._2 > 0 && r._3 > 0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 - 1e-9, "not sorted")
      case _ => ()
    }
    // RAKE favors long phrases: the top hit has at least 2 words
    assert(rows.head._1.split(" ").length >= 2)
  }
}
