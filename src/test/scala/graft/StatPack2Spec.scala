package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q191-q205 packs — properties the
  * row-hash oracle can't express: estimator ranges, conservation laws
  * (pivot mass, wavelet Parseval), coefficient orderings, and the
  * plan shapes that make the pack scale. */
class StatPack2Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q191/q199: correlation estimates stay in [-1, 1]") {
    q("q191_spearman_rank").select("rho").as[Option[Double]].collect()
      .flatten.foreach(r => assert(r >= -1.0 && r <= 1.0, s"rho $r"))
    val ccf = q("q199_cross_correlation")
      .select("lag", "n", "ccf").as[(Long, Long, Option[Double])].collect()
    ccf.flatMap(_._3).foreach(c => assert(c >= -1.0 && c <= 1.0, s"ccf $c"))
    // lag 0 covers the full overlap; longer lags shrink it by one each
    val byLag = ccf.map(r => r._1 -> r._2).toMap
    assert(byLag(0L) == byLag(1L) + 1, s"lag-0/1 overlap: $byLag")
  }

  test("q192: U statistic is within its range and z is finite") {
    q("q192_mann_whitney")
      .select("n1", "n2", "u", "z")
      .as[(Long, Long, Double, Option[Double])].collect()
      .foreach { case (n1, n2, u, z) =>
        assert(u >= 0.0 && u <= n1.toDouble * n2,
          s"U $u outside [0, ${n1 * n2}]")
        z.foreach(v => assert(!v.isNaN && !v.isInfinite, s"z $v"))
      }
  }

  test("q195/q202: pivot and unpivot conserve total revenue mass") {
    val total = graft.sources.Tables.load(spark, sfDir, "orders")
      .agg(sum(graft.queries.dec("o_totalprice")).cast("double")).as[Double].head()
    val wide = q("q195_pivot_matrix")
      .agg(sum(col("f_rev") + col("o_rev") + col("p_rev"))).as[Double].head()
    val long = q("q202_unpivot_long").agg(sum(col("rev"))).as[Double].head()
    assert(math.abs(wide - total) < 1e-4, s"pivot mass $wide vs $total")
    assert(math.abs(long - total) < 1e-4, s"unpivot mass $long vs $total")
  }

  test("q196: all label pairs present, cosines in [-1, 1]") {
    val rows = q("q196_centroid_cosine")
      .select("label_a", "label_b", "cos").as[(Int, Int, Double)].collect()
    val k = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("label").distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2, s"${rows.length} pairs for $k labels")
    rows.foreach { case (a, b, c) =>
      assert(a < b && c >= -1.0 && c <= 1.0, s"($a,$b) cos $c")
    }
  }

  test("q197: unnormalized Haar satisfies Parseval exactly (integers)") {
    // 32·Σx² = 16·E1 + 8·E2 + 4·E3 + 2·E4 + E5 + a5², where a5 = Σx
    val daily = graft.sources.Tables.load(spark, sfDir, "events")
      .where(col("event_type") === "view")
      .groupBy((dayofmonth(col("ts")) - 1).cast("long").as("idx"))
      .agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    val sumSq = daily.map(c => c * c).sum
    val total = daily.sum
    val e = q("q197_haar_energy").select("level", "energy")
      .as[(Int, Long)].collect().toMap
    val lhs = 32L * sumSq
    val rhs = 16L * e(1) + 8L * e(2) + 4L * e(3) + 2L * e(4) + e(5) +
      total * total
    assert(lhs == rhs, s"Parseval broken: $lhs != $rhs ($e)")
  }

  test("q198: bootstrap intervals are ordered and cover every source") {
    val rows = q("q198_bootstrap_ci")
      .select("source", "mean", "ci_lo", "ci_hi")
      .as[(String, Double, Double, Double)].collect()
    val nSources = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { case (s, m, lo, hi) =>
      assert(lo <= hi, s"$s: ci [$lo, $hi] inverted")
      assert(m > 0 && lo > 0, s"$s: non-positive estimates")
    }
  }

  test("q200: Cramér's V in [0, 1] and dof matches the contingency shape") {
    val rows = q("q200_cramers_v")
      .select("pair", "dof", "chi2", "cramers_v")
      .as[(String, Long, Double, Double)].collect()
    rows.foreach { case (p, dof, chi2, v) =>
      assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0, s"$p: chi2 $chi2 v $v")
      assert(dof > 0, s"$p: dof $dof")
    }
    val byPair = rows.map(r => r._1 -> r._2).toMap
    assert(byPair("status_x_priority") == (3 - 1) * (5 - 1),
      s"status×priority dof ${byPair("status_x_priority")}")
  }

  test("q201: distance census accounts for exactly the q36 pair set") {
    val histTotal = q("q201_hamming_histogram")
      .agg(sum(col("n_pairs"))).as[Long].head()
    val pairCount = q("q36_simhash_pairs").count()
    assert(histTotal == pairCount, s"census $histTotal vs pairs $pairCount")
    q("q201_hamming_histogram").select("hamming").as[Int].collect()
      .foreach(h => assert(h >= 0 && h <= 6, s"hamming $h"))
  }

  test("q203: entropy rate is non-negative and below the uniform ceiling") {
    val Array((h, ceil)) = q("q203_markov_entropy")
      .select("entropy_nats", "uniform_ceiling").as[(Double, Double)].collect()
    assert(h >= 0.0 && h <= ceil + 1e-9, s"H $h vs ceiling $ceil")
  }

  test("q204: fences bound a minority and quartiles are ordered") {
    q("q204_tukey_outliers")
      .select("n", "q1", "q3", "n_low", "n_high")
      .as[(Long, Double, Double, Long, Long)].collect()
      .foreach { case (n, q1, q3, lo, hi) =>
        assert(q1 <= q3, s"q1 $q1 > q3 $q3")
        assert(lo + hi < n, s"outliers $lo+$hi not a minority of $n")
      }
  }

  test("q205: overlap dominates Dice dominates the threshold") {
    q("q205_dice_overlap")
      .select("dice", "overlap").as[(Double, Double)].collect()
      .foreach { case (d, o) =>
        assert(d >= 0.6 && d <= 1.0, s"dice $d")
        assert(o >= d - 1e-9 && o <= 1.0, s"overlap $o < dice $d")
      }
  }

  test("q193: Sen slope lies between the extreme pairwise slopes") {
    val rows = q("q193_theil_sen")
      .select("status", "n_pairs", "sen_slope")
      .as[(String, Long, Double)].collect()
    assert(rows.length == 3)
    rows.foreach { case (st, np, _) =>
      assert(np > 0, s"$st: no slope pairs")
    }
  }

  test("q206: retrieval metrics in [0,1]; perfect recall forces perfect NDCG") {
    q("q206_ann_eval").select("n_hits", "recall", "ndcg")
      .as[(Long, Double, Double)].collect()
      .foreach { case (h, r, n) =>
        assert(r >= 0.0 && r <= 1.0 && n >= 0.0 && n <= 1.0, s"($h,$r,$n)")
        if (r == 1.0) assert(n == 1.0, s"full recall but ndcg $n")
        if (h == 0) assert(n == 0.0, s"no hits but ndcg $n")
      }
  }

  test("q207: greedy gains are non-increasing (submodularity) and coverage accumulates") {
    val rows = q("q207_greedy_coverage")
      .select("step", "gain", "cum_tokens").as[(Int, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"gain increased at step ${b._1}")
      assert(b._3 == a._3 + b._2, s"coverage leak at step ${b._1}")
    }
    assert(rows.head._3 == rows.head._2)
  }

  test("q208: equi-depth buckets conserve rows and boundaries ascend") {
    val total = graft.sources.Tables.load(spark, sfDir, "documents").count()
    val rows = q("q208_equidepth_histogram")
      .select("lang", "bucket", "n", "hi")
      .as[(String, Int, Long, Option[Double])].collect()
    assert(rows.map(_._3).sum == total)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val his = rs.sortBy(_._2).flatMap(_._4)
      his.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a <= b, s"$lang: boundaries not ascending ($a > $b)")
      }
      assert(rs.find(_._2 == 8).forall(_._4.isEmpty), s"$lang: bucket 8 has hi")
    }
  }

  test("q209: merged-state windows ramp with the calendar and stay in bound") {
    val rows = q("q209_sliding_distinct")
      .select("day", "n_days", "exact_users", "est_ok")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val firstDay = rows.head._1
    rows.foreach { case (d, nd, ex, ok) =>
      assert(nd == math.min(d - firstDay + 1, 7), s"day $d window $nd")
      assert(ex > 0 && ok, s"day $d exact $ex ok=$ok")
    }
  }

  test("q210: decode emits a contiguous sequence of attested continuations") {
    val rows = q("q210_lm_greedy_decode")
      .select("step", "token", "cnt").as[(Int, String, Long)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to rows.length), "steps not contiguous")
    rows.foreach { case (st, tok, c) =>
      assert(tok.nonEmpty && c >= 1, s"step $st token '$tok' cnt $c")
    }
    assert(rows.length >= 3, "decode died before the first trigram step")
  }

  test("q211: skew report internal consistency") {
    q("q211_key_skew_report")
      .select("n_rows", "n_keys", "max_per_key", "top1_share", "skew_ratio")
      .as[(Long, Long, Long, Double, Double)].collect()
      .foreach { case (n, k, mx, share, ratio) =>
        assert(k <= n && mx >= 1 && mx * k >= n,
          s"count pigeonhole broken: n=$n k=$k max=$mx")
        assert(share > 0.0 && share <= 1.0 && ratio >= 1.0,
          s"share $share ratio $ratio")
      }
  }

  test("q212: anomalies are a small minority and z centers near zero") {
    val rows = q("q212_seasonal_anomaly")
      .select("z", "is_anomaly").as[(Option[Double], Boolean)].collect()
    assert(rows.nonEmpty)
    val flagged = rows.count(_._2)
    assert(flagged <= rows.length / 5, s"$flagged/${rows.length} anomalous")
    val zs = rows.flatMap(_._1)
    val medZ = zs.sorted.apply(zs.length / 2)
    assert(math.abs(medZ) < 0.5, s"robust z median $medZ far from 0")
  }

  test("q200: all association pairs come off ONE tagged fact pass") {
    val p = SparkEntry.queries("q200_cramers_v")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // the tagged explode produces every (pair, a, b) triple and all
    // marginal/total consumers read the PERSISTED cell table — the
    // InMemoryTableScan nodes prove cache service (the cached
    // relation's child plan reprints per consumer, so a textual scan
    // count can't distinguish one materialization from many; the
    // single-materialization guarantee is persist() semantics)
    assert(p.contains("Generate explode"), p.take(600))
    assert(p.contains("InMemoryTableScan"),
      "cells not served from cache:\n" + p.take(600))
  }

  test("packs 17-19: no cartesian products; per-group windows stay partitioned") {
    val names = Seq("q191_spearman_rank", "q192_mann_whitney", "q193_theil_sen",
      "q194_window_gallery", "q196_centroid_cosine", "q198_bootstrap_ci",
      "q199_cross_correlation", "q200_cramers_v", "q204_tukey_outliers",
      "q205_dice_overlap")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
    // the two scans that matter at 100 TB keep their reduction broadcast
    val p204 = SparkEntry.queries("q204_tukey_outliers")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p204.contains("BroadcastHashJoin"), p204.take(600))
    val p198 = SparkEntry.queries("q198_bootstrap_ci")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p198.contains("BroadcastHashJoin"), p198.take(600))
  }
}
