package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q225-q230 pack: similarity symmetry and
  * ranges, divergence bounds, debiasing effectiveness, growth-series
  * identities, sampling-weight monotonicity, and the recall audit's
  * subset law. */
class Pack25Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q225: cosines in [0,1], ranks dense from 1, symmetric pairs agree") {
    val rows = q("q225_tfidf_doc_sim")
      .select("doc_id", "neighbor_id", "rnk", "cosine")
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, r, c) =>
      assert(a != b && r >= 1 && r <= 3)
      assert(c >= -1e-9 && c <= 1.0 + 1e-9, s"cos $c")
    }
    // a pair listed in both directions must carry the same cosine
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    m.foreach { case ((a, b), c) =>
      m.get((b, a)).foreach(c2 => assert(math.abs(c - c2) < 1e-9))
    }
    // ranks per doc are 1..k with no gaps
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length).toSeq)
    }
  }

  test("q226: JSD within [0, ln 2], symmetric formulation bounded") {
    val rows = q("q226_jsd_sources")
      .select("src_a", "src_b", "n_common", "jsd")
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, j) =>
      assert(a < b && n > 0)
      assert(j >= -1e-6 && j <= math.log(2.0) + 1e-6, s"($a,$b) jsd $j")
    }
  }

  test("q227: IPW estimate beats the naive estimate on the biased sample") {
    val (np, ns, tm, nm, im, ne, ie) = q("q227_ipw_debias")
      .select("n_pop", "n_sample", "true_mean", "naive_mean", "ipw_mean",
        "naive_err", "ipw_err")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(ns > 0 && ns < np)
    assert(math.abs(ne - math.abs(nm - tm)) < 2e-6)
    assert(math.abs(ie - math.abs(im - tm)) < 2e-6)
    // IPW is unbiased (not variance-free): on one draw it must land
    // within a loose relative band of the true mean
    assert(ie / tm < 0.1, s"ipw_err $ie vs true mean $tm")
  }

  test("q228: growth ratios reproduce from the revenue series") {
    val rows = q("q228_revenue_growth")
      .select("status", "mon", "rev", "mom_pct")
      .as[(String, String, Double, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      s.toSeq.sliding(2).foreach {
        case Seq((_, _, r1, _), (_, _, r2, Some(p))) =>
          assert(math.abs(p - (r2 - r1) / r1) < 1e-4, s"mom $p")
        case _ => ()
      }
      assert(s.head._4.isEmpty, "first month must have no MoM")
    }
  }

  test("q229: exactly 20 rows, keys descending, all weights positive") {
    val rows = q("q229_weighted_sample")
      .select("rnk", "p_size", "es_key").as[(Int, Int, Double)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._1).sorted.toSeq == (1 to 20).toSeq)
    val keys = rows.sortBy(_._1).map(_._3)
    keys.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b - 1e-9, s"keys not descending: $a $b")
      case _ => ()
    }
    rows.foreach { case (_, w, k) => assert(w >= 1 && k <= 0.0) }
  }

  test("q230: found is a subset of exact; recall consistent") {
    val (ne, nf, nm, rec) = q("q230_lsh_recall")
      .select("n_exact", "n_found", "n_missed", "recall")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(nf <= ne, s"found $nf > exact $ne")
    assert(nm == ne - nf)
    rec.foreach(r => assert(math.abs(r - nf.toDouble / ne) < 1e-6))
  }

  test("q225/q226: inverted-index joins only, no cartesian product") {
    Seq("q225_tfidf_doc_sim", "q226_jsd_sources").foreach { n =>
      val p = q(n).queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
  }
}
