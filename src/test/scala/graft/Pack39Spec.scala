package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q301-q305 pack: quantile ordering,
  * turnover bounds, HHI laws, burstiness arithmetic, and ANOVA R²
  * bounds. */
class Pack39Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q301: octile-derived stats respect quantile ordering and bounds") {
    val rows = q("q301_quantile_shape")
      .select("segment", "q1", "median", "q3", "bowley_skew",
        "moors_kurtosis")
      .as[(String, Double, Double, Double, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (seg, q1, med, q3, bs, mk) =>
      assert(q1 <= med && med <= q3, s"$seg quantiles out of order")
      assert(bs >= -1.0 - 1e-9 && bs <= 1.0 + 1e-9,
        s"$seg Bowley skew $bs outside [-1, 1]")
      assert(mk > 0, s"$seg Moors kurtosis $mk not positive")
    }
  }

  test("q302: turnover counts are bounded by the board size") {
    val rows = q("q302_rank_turnover")
      .select("mon", "n_common", "jaccard", "n_new")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mon, nc, j, nn) =>
      assert(nc >= 0 && nc <= 10, s"$mon common $nc")
      assert(nn == 10 - nc)
      val expectJ = nc.toDouble / (20.0 - nc)
      assert(math.abs(j - expectJ) < 1e-5, s"$mon jaccard $j vs $expectJ")
    }
  }

  test("q303: HHI lies in (10000/n, 10000] and dominates the top share bound") {
    val rows = q("q303_hhi")
      .select("nation", "n_suppliers", "hhi", "top_share")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.length == 25)
    rows.foreach { case (n, k, hhi, ts) =>
      assert(hhi > 10000.0 / k - 1e-6 && hhi <= 10000.0 + 1e-6,
        s"nation $n: HHI $hhi outside (10000/$k, 10000]")
      // Σs² >= (max s)²
      assert(hhi >= 10000.0 * ts * ts - 1e-6)
      assert(ts > 0 && ts <= 1)
    }
  }

  test("q304: burstiness fields satisfy their count identities") {
    val rows = q("q304_term_burstiness")
      .select("word", "df", "total_occ", "mean_tf", "p_repeat")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (w, df, tot, mtf, pr) =>
      assert(w.length >= 4)
      assert(tot >= df, s"$w: occurrences below df")
      assert(math.abs(mtf - tot.toDouble / df) < 1e-6)
      assert(pr >= 0 && pr <= 1)
      // mean_tf > 1 forces some repetition and vice versa
      if (mtf > 1.0 + 1e-9) assert(pr > 0, s"$w: mean_tf $mtf but no repeats")
    }
  }

  test("q305: seasonal R² is a valid variance share") {
    val r = q("q305_seasonal_strength")
      .select("n", "seasonal_r2").as[(Long, Double)].head()
    assert(r._1 >= 80 && r._1 <= 90, s"unexpected month count ${r._1}")
    assert(r._2 >= -1e-6 && r._2 <= 1.0 + 1e-6,
      s"R² ${r._2} outside [0, 1]")
  }
}
