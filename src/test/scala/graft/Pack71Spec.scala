package graft

/** Semantic invariants for the q461-q465 operations pack: Erlang-B
  * monotone decrease, newsvendor optimality, EOQ ordering, safety-
  * stock coverage, and ABC-XYZ accounting. */
class Pack71Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q461: blocking probability decreases in the server count") {
    val rows = q("q461_erlang_b")
      .orderBy("m_servers")
      .select("m_servers", "blocking_prob").as[(Long, Double)].collect()
    assert(rows.length == 20)
    // large m drives B below the round-6 grid -> exactly 0 is fine
    rows.foreach(r => assert(r._2 >= 0 && r._2 < 1))
    assert(rows.head._2 > 0, "B(1) must be positive")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2 + 1e-9, "blocking rose with more servers")
      case _ => ()
    }
  }

  test("q462: the critical-fractile stock beats the mean stock") {
    val r = q("q462_newsvendor")
      .select("q_star", "q_mean", "cost_at_qstar", "cost_at_qmean")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    // q* >= mean for critical ratio 2/3 on a roughly symmetric demand
    assert(r._1 >= r._2, s"q* ${r._1} below the mean stock ${r._2}")
    // the newsvendor quantile is cost-optimal
    assert(r._3 <= r._4 + 1e-9,
      s"cost at q* ${r._3} worse than mean stock ${r._4}")
  }

  test("q463: EOQ top list is sorted and scales with demand") {
    val rows = q("q463_eoq")
      .select("pk", "units", "eoq").as[(Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r._3 > 0))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 - 1e-9)
      case _ => ()
    }
  }

  test("q464: the reorder point covers most rolling weeks") {
    val r = q("q464_safety_stock")
      .select("n_days", "mu_daily", "sigma_daily", "reorder_point",
        "empirical_stockout_rate")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 100)
    assert(r._2 > 0 && r._3 > 0)
    assert(r._4 > 7 * r._2, "ROP must exceed the mean lead-time demand")
    // 95% service on normal-ish demand: stockouts rare but nonzero-ok
    assert(r._5 >= 0 && r._5 < 0.25,
      s"stockout rate ${r._5} implausibly high for z=1.645")
  }

  test("q465: ABC-XYZ cells cover every part exactly once") {
    val rows = q("q465_abc_xyz")
      .select("abc", "xyz", "n_parts").as[(String, String, Long)]
      .collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val nParts = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._3).sum == nParts)
    rows.foreach { r =>
      assert(Set("A", "B", "C")(r._1) && Set("X", "Y", "Z")(r._2))
    }
  }
}
