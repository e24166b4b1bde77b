package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q281-q285 pack: R/S scaling laws, EVT
  * threshold ordering, BH step-up correctness against a driver-side
  * replay, decomposition identities, and index-number bounds. */
class Pack35Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q281: R/S grows with window size and H lands in (0, 1]") {
    val rows = q("q281_hurst_rs")
      .select("w", "n_blocks", "mean_rs", "hurst")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(16, 32, 64, 128))
    rows.foreach { case (_, nb, rs, _) =>
      assert(nb >= 1); assert(rs > 0)
    }
    // rescaled range is nondecreasing in w for any stationary-ish series
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a < b, "mean R/S not increasing in w")
      case _ => ()
    }
    val h = rows.head._4
    assert(rows.forall(_._4 == h))
    assert(h > 0 && h <= 1.0 + 1e-9, s"implausible Hurst $h")
  }

  test("q282: thresholds and exceedance counts are ordered across percentiles") {
    val rows = q("q282_evt_tail")
      .select("pct", "threshold", "n_exceed", "mean_excess", "hill_h",
        "tail_index")
      .as[(Int, Double, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(90, 95, 99))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 < b._2, "thresholds not increasing")
        assert(a._3 > b._3, "exceedances not decreasing")
      case _ => ()
    }
    rows.foreach { case (_, thr, n, me, h, ti) =>
      assert(thr > 0 && n > 0 && me > 0 && h > 0)
      // relative: both are 6dp-rounded, so ti·h ≈ 1 up to rounding
      assert(math.abs(ti * h - 1.0) < 1e-3, s"tail_index $ti != 1/H $h")
    }
  }

  test("q283: BH rejections replay exactly from the emitted p-values") {
    val rows = q("q283_bh_fdr")
      .select("nation", "n_extreme", "p_value", "p_rank", "rejected")
      .as[(Int, Long, Double, Long, Boolean)].collect()
    val m = rows.length
    assert(m == 25)
    assert(rows.map(_._4).sorted.toSeq == (1L to m))
    // replay the step-up rule on exact rationals
    val sorted = rows.sortBy(_._4)
    val kstar = sorted.filter { r =>
      (r._2 + 1) * 10 * m <= 200L * r._4
    }.map(_._4).maxOption.getOrElse(0L)
    sorted.foreach { r =>
      assert(r._5 == (r._4 <= kstar),
        s"nation ${r._1}: rejected=${r._5}, rank=${r._4}, k*=$kstar")
      assert(math.abs(r._3 - (r._2 + 1) / 200.0) < 1e-9)
    }
    // rejection set is a prefix of the p-value order
    val rejected = sorted.takeWhile(_._5)
    assert(sorted.drop(rejected.length).forall(!_._5))
  }

  test("q284: rev = trend + seasonal + residual and seasonal is centered") {
    val rows = q("q284_seasonal_decompose")
      .select("mon", "rev", "trend", "seasonal", "residual")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mon, rev, tr, se, re) =>
      assert(math.abs(rev - (tr + se + re)) < 1e-4,
        s"$mon: decomposition does not reconstruct")
    }
    // per-calendar-month seasonal is a single value
    val byMoy = rows.groupBy(_._1.substring(5))
    byMoy.foreach { case (moy, rs) =>
      assert(rs.map(_._4).distinct.length == 1, s"month $moy seasonal varies")
    }
    // centered: the 12 seasonal values sum to ~0
    val seas = byMoy.values.map(_.head._4).toSeq
    assert(math.abs(seas.sum) < 1e-3, s"seasonal sums to ${seas.sum}")
  }

  test("q285: Fisher lies between Laspeyres and Paasche") {
    val r = q("q285_price_index")
      .select("n_parts", "laspeyres", "paasche", "fisher")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 > 0 && r._3 > 0)
    val (lo, hi) = (math.min(r._2, r._3), math.max(r._2, r._3))
    assert(r._4 >= lo - 1e-6 && r._4 <= hi + 1e-6,
      s"Fisher ${r._4} outside [$lo, $hi]")
  }
}
