package graft

/** Semantic invariants for the q346-q350 pack: isotropy bounds,
  * contamination monotonicity, budget-allocation laws, kNN diversity
  * ranges, and lognormal-fit plausibility. */
class Pack48Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q346: isotropy proxy and norm stats are valid") {
    val r = q("q346_embedding_isotropy")
      .select("n_vecs", "dim", "mean_norm", "norm_cv", "centroid_norm",
        "isotropy")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 == 64)
    assert(r._3 > 0 && r._4 >= 0)
    // Jensen: ||centroid|| <= mean vector norm; isotropy in [0, 1]
    assert(r._5 <= r._3 + 1e-6)
    assert(r._6 >= 0 && r._6 <= 1.0 + 1e-9)
  }

  test("q347: shorter grams never leak fewer documents") {
    val rows = q("q347_contamination_sweep")
      .select("gram_len", "test_docs", "leaked_docs", "leak_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 13L, 20L))
    rows.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 >= 0 && r._4 <= 1.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3,
        s"leaked docs increased with gram length: $a -> $b")
      case _ => ()
    }
  }

  test("q348: allocations respect the cap and exhaust the budget") {
    val rows = q("q348_token_budget")
      .select("source", "quality", "tokens", "allocated", "budget_share")
      .as[(String, Double, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._4 > 0 && r._4 <= r._3, "allocated beyond source supply")
      assert(r._5 <= 0.3 + 1e-6, s"source ${r._1} exceeds the 30% cap")
    }
    val totalShare = rows.map(_._5).sum
    assert(totalShare > 0.99 && totalShare < 1.01,
      s"budget not exhausted: $totalShare")
    // sorted by quality desc
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2 - 1e-9)
      case _ => ()
    }
  }

  test("q349: diversity metrics live in their ranges") {
    val r = q("q349_knn_diversity")
      .select("n_queries", "mean_distinct_labels", "label_match_rate",
        "mean_top5_cosine")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 1.0 && r._2 <= 5.0)
    assert(r._3 >= 0 && r._3 <= 1.0)
    assert(r._4 >= -1.0 && r._4 <= 1.0)
  }

  test("q350: lognormal fit brackets the empirical order statistics") {
    val r = q("q350_lognormal_lengths")
      .select("n_docs", "mu", "sigma", "implied_median", "emp_median",
        "implied_p95", "emp_p95")
      .as[(Long, Double, Double, Double, Double, Double, Long)].head()
    assert(r._1 > 0 && r._3 >= 0)
    assert(r._4 > 0 && r._6 >= r._4, "p95 below median")
    assert(r._7 >= r._5.toLong, "empirical p95 below empirical median")
    // the geometric-mean median estimate is within 2x of the empirical
    assert(r._4 / r._5 > 0.5 && r._4 / r._5 < 2.0,
      s"implied median ${r._4} far from empirical ${r._5}")
  }
}
