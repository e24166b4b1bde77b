package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q237-q242 pack: OHLC ordering laws,
  * sketch-window bounds, census symmetry, control-chart band sanity,
  * correlation ranges, and latency nonnegativity. */
class Pack27Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q237: every merged-sketch window estimate lands in the bound") {
    val rows = q("q237_sliding_p50_sketch")
      .select("day", "n_days", "p50_exact", "p50_ok")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, nd, p50, ok) =>
      assert(nd >= 1 && nd <= 7, s"day $d window $nd")
      assert(p50 > 0.0)
      assert(ok, s"day $d sketch p50 outside the 3% band")
    }
  }

  test("q238: low <= open/close <= high within every bar") {
    val rows = q("q238_ohlc_bars")
      .select("event_type", "mon", "n", "open", "close", "high", "low")
      .as[(String, String, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, mon, n, o, c, h, l) =>
      assert(l <= o && o <= h, s"$et $mon open $o outside [$l,$h]")
      assert(l <= c && c <= h, s"$et $mon close $c outside [$l,$h]")
      assert(n >= 1)
      if (n == 1) assert(o == c)
    }
  }

  test("q239: census pair mass equals the q35 pair count") {
    val rows = q("q239_dup_source_census")
      .select("src_lo", "src_hi", "n_pairs", "intra")
      .as[(String, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lo, hi, n, intra) =>
      assert(lo <= hi && n >= 1)
      assert(intra == (lo == hi))
    }
    val total = rows.map(_._3).sum
    val q35 = q("q35_minhash_pairs").count()
    assert(total == q35, s"census mass $total != q35 pairs $q35")
  }

  test("q240: EWMA stays inside the data envelope; bands are symmetric") {
    val rows = q("q240_ewma_chart")
      .select("ti", "x", "ewma", "ucl", "lcl", "out_of_control")
      .as[(Long, Double, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach { case (t, _, z, ucl, lcl, out) =>
      assert(z >= mn - 1e-6 && z <= mx + 1e-6,
        s"t=$t ewma $z outside data envelope [$mn,$mx]")
      assert(ucl > lcl, s"t=$t bands inverted")
      assert(out == (z > ucl || z < lcl), s"t=$t flag inconsistent")
    }
    // first point is the series start: z_1 = x_1
    val first = rows.minBy(_._1)
    assert(math.abs(first._3 - first._2) < 0.02, "z_1 != x_1")
  }

  test("q241: correlations in [-1,1]; slope sign matches correlation") {
    val rows = q("q241_discount_elasticity")
      .select("p_type", "n", "corr", "slope")
      .as[(String, Long, Option[Double], Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (pt, n, corr, slope) =>
      assert(n > 0)
      corr.foreach(c => assert(c >= -1.0 && c <= 1.0, s"$pt corr $c"))
      (corr, slope) match {
        case (Some(c), Some(sl)) if math.abs(c) > 1e-9 =>
          assert(c.sign == sl.sign, s"$pt corr $c vs slope $sl")
        case _ => ()
      }
    }
  }

  test("q242: latency nonnegative (events are time-ordered); mean in range") {
    val rows = q("q242_transition_latency")
      .select("cur", "nxt", "n", "mean_gap_s", "min_gap_s", "max_gap_s")
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, x, n, mean, mn, mx) =>
      assert(n >= 1, s"$c->$x")
      assert(mn >= 0.0, s"$c->$x negative min gap")
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6, s"$c->$x mean $mean")
    }
  }

  test("q239/q241/q242: equi-joins only, no cartesian product") {
    Seq("q239_dup_source_census", "q241_discount_elasticity",
      "q242_transition_latency").foreach { n =>
      val p = q(n).queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
  }
}
