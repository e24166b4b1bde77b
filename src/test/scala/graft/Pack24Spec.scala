package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q219-q224 pack: smoother identities,
  * estimator ranges, sketch-vs-exact consistency, and the equi-join
  * plan shapes. */
class Pack24Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q219: forecast1 decomposes into level + trend + season_next") {
    val rows = q("q219_holt_winters")
      .select("status", "n_months", "level", "trend", "season_next",
        "forecast1")
      .as[(String, Int, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (st, n, l, b, sn, f1) =>
      assert(n >= 2, s"$st has $n months")
      // rounding each component at 1e-4 bounds the recomposition error
      assert(math.abs(f1 - (l + b + sn)) < 3e-4, s"$st forecast $f1")
    }
  }

  test("q220: accuracy consistent with counts, predictions from train argmax") {
    val rows = q("q220_markov_eval")
      .select("cur", "n_test", "n_correct", "accuracy")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cur, nt, nc, acc) =>
      assert(nc >= 0 && nc <= nt, s"$cur counts")
      assert(math.abs(acc - nc.toDouble / nt) < 1e-6, s"$cur acc")
    }
  }

  test("q221: jaccard <= min containment; all ratios in [0,1]") {
    val rows = q("q221_source_overlap")
      .select("n_common", "na", "nb", "containment_a", "jaccard")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, na, nb, ca, j) =>
      assert(c <= math.min(na, nb))
      assert(ca >= 0 && ca <= 1 && j >= 0 && j <= 1)
      assert(j <= ca + 1e-6, s"jaccard $j > containment $ca")
    }
  }

  test("q222: estimate is n_match/32; error matches |est - exact|") {
    val rows = q("q222_minhash_source_acc")
      .select("n_match", "est_jaccard", "exact_jaccard", "abs_err")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, est, ex, err) =>
      assert(m >= 0 && m <= 32)
      assert(math.abs(est - m / 32.0) < 1e-6)
      assert(math.abs(err - math.abs(est - ex)) < 2e-6)
    }
  }

  test("q223: p-value in (0,1], extreme count bounded by replicates") {
    val (n, _, ne, p) = q("q223_perm_test")
      .select("n_docs", "t_obs", "n_extreme", "p_value")
      .as[(Long, Long, Long, Double)].head()
    assert(n > 0 && ne >= 0 && ne <= 199)
    assert(p > 0.0 && p <= 1.0)
    assert(math.abs(p - (1.0 + ne) / 200.0) < 1e-6)
  }

  test("q224: H nonnegative, tie correction in (0,1]") {
    val (n, k, h, c, hAdj) = q("q224_kruskal_wallis")
      .select("n", "k_groups", "h", "tie_c", "h_adj")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(n > 0 && k >= 2)
    assert(h >= -1e-6, s"H $h")
    assert(c > 0.0 && c <= 1.0, s"tie_c $c")
    assert(math.abs(hAdj - h / c) < 1e-4)
  }

  test("q220/q221/q222: equi-joins only, no cartesian product") {
    Seq("q220_markov_eval", "q221_source_overlap",
      "q222_minhash_source_acc").foreach { n =>
      val p = q(n).queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
  }
}
