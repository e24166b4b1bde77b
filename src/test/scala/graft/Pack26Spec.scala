package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q231-q236 pack: leakage-count bounds,
  * purity/entropy duality, fertility sanity, Good-Turing mass bounds,
  * SPRT decision consistency, and attribution mass conservation. */
class Pack26Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q231: leak counts bounded by gram counts; flags consistent") {
    val rows = q("q231_leakage_report")
      .select("doc_id", "n_grams", "n_leaked", "leak_frac", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, ng, nl, f, c) =>
      assert(nl >= 0 && nl <= ng)
      assert(f >= 0.0 && f <= 1.0)
      assert(c == (nl > 0))
    }
  }

  test("q232: purity 1 iff entropy 0; sizes partition the clustered docs") {
    val rows = q("q232_cluster_purity")
      .select("cluster_id", "n", "n_langs", "purity", "lang_entropy")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, k, pu, ent) =>
      assert(n >= 2, "a cluster needs at least one pair")
      assert(pu > 0.0 && pu <= 1.0)
      assert(ent >= -1e-9)
      if (k == 1) assert(pu == 1.0 && math.abs(ent) < 1e-9)
      else assert(pu < 1.0 && ent > 0.0)
    }
    val total = rows.map(_._2).sum
    val clustered = TextQueries_clusteredCount
    assert(total == clustered, s"cluster sizes sum $total != $clustered")
  }

  private def TextQueries_clusteredCount: Long =
    graft.queries.TextQueries.neardupClustersCached(spark, sfDir).count()

  test("q233: fertility >= 1 (markers only merge, never split words)") {
    val rows = q("q233_tokenizer_fertility")
      .select("lang", "fertility", "chars_per_token")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (l, f, cpt) =>
      assert(f >= 1.0, s"$l fertility $f < 1")
      assert(cpt >= 1.0, s"$l chars/token $cpt < 1")
    }
  }

  test("q234: unseen mass in (0,1); smoothed counts positive when defined") {
    val rows = q("q234_good_turing")
      .select("lang", "n_tokens", "vocab", "n1", "unseen_mass", "r_star_1")
      .as[(String, Long, Long, Long, Double, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (l, nt, v, n1, um, r1) =>
      assert(v <= nt && n1 <= v, s"$l counts")
      assert(um >= 0.0 && um <= 1.0, s"$l unseen $um")
      r1.foreach(r => assert(r >= 0.0, s"$l r*1 $r"))
    }
  }

  test("q235: decision matches the sign of the crossing LLR") {
    val rows = q("q235_sprt")
      .select("variant", "n_events", "n_dec", "llr_dec", "decision")
      .as[(Long, Long, Option[Long], Option[Double], String)].collect()
    assert(rows.length == 2)
    rows.foreach { case (_, ne, nd, llr, dec) =>
      (nd, llr) match {
        case (Some(n), Some(l)) =>
          assert(n >= 1 && n <= ne)
          assert(math.abs(l) >= math.log(19.0) - 1e-6)
          assert(dec == (if (l > 0) "accept_h1" else "accept_h0"))
        case _ => assert(dec == "continue")
      }
    }
  }

  test("q236: per-journey credit mass is 1 (so credit sum = journeys)") {
    val rows = q("q236_ushape_attribution")
      .select("channel", "n_touches", "total_credit", "attributed_rev")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ch, n, c, _) =>
      assert(ch != "purchase" && n > 0 && c > 0)
    }
    // total credit across channels ~= number of credited journeys
    val totalCredit = rows.map(_._3).sum
    assert(math.abs(totalCredit - math.rint(totalCredit)) < 1e-3,
      s"credit mass $totalCredit not ~integral")
  }

  test("q231/q236: semi/equi joins only, no cartesian product") {
    Seq("q231_leakage_report", "q236_ushape_attribution").foreach { n =>
      val p = q(n).queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
  }
}
