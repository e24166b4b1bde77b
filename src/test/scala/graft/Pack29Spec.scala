package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q249-q254 pack: cross-label law and
  * symmetry bound for hard negatives, the greedy k-center maximin
  * monotonicity, clipping never increases mass, Mann-Kendall S/variance
  * bounds, Simpson flip arithmetic, and freshness mass conservation. */
class Pack29Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q249: every hard negative crosses labels and covers every query") {
    val rows = q("q249_hard_negatives")
      .select("query_id", "label", "hard_neg_id", "neg_label", "cosine")
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, l, nid, nl, cos) =>
      assert(l != nl, s"query $qid: negative $nid shares label $l")
      assert(qid != nid && cos <= 1.000001 && cos >= -1.000001)
    }
    val nQueries = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 1000).count()
    assert(rows.length.toLong == nQueries,
      s"${rows.length} rows for $nQueries queries")
  }

  test("q250: greedy k-center maximin is non-increasing and picks are distinct") {
    val rows = q("q250_kcenter_coreset")
      .select("step", "vec_id", "maximin")
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.length == 6)
    assert(rows.map(_._2).distinct.length == 6, "duplicate pick")
    assert(rows.head._3.isEmpty, "seed must have null maximin")
    val ds = rows.tail.map(_._3.get)
    ds.foreach(d => assert(d >= 0.0))
    ds.sliding(2).foreach { case Array(prev, next) =>
      assert(next <= prev + 1e-9, s"maximin increased: $prev -> $next")
    case _ => ()
    }
    // seed is the minimum id of the slice (the documented tie-break)
    val minId = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 400).agg(min("vec_id")).as[Long].head()
    assert(rows.head._2 == minId)
  }

  test("q251: clipping never increases mass and the mean respects the cap") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val raw = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("raw"),
        countDistinct(col("user_id")).as("nu"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rows = q("q251_clipped_contribution")
      .select("event_type", "n_users", "clipped_sum", "n_clipped",
        "clipped_mean")
      .as[(String, Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, nu, cs, nc, cm) =>
      val (rawSum, rawUsers) = raw(et)
      assert(nu == rawUsers, s"$et user count")
      assert(cs <= rawSum + 1e-6, s"$et clipped_sum $cs > raw $rawSum")
      assert(cm <= 250.0 + 1e-9, s"$et mean $cm above cap")
      assert(nc >= 0 && nc <= nu)
      if (nc == 0) assert(math.abs(cs - rawSum) < 1e-6)
    }
  }

  test("q252: |S| is bounded by the pair count and variance is positive") {
    val rows = q("q252_mann_kendall")
      .select("status", "n_months", "s_stat", "var_s18", "sen_slope")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (st, n, s, v18, _) =>
      val nPairs = n * (n - 1) / 2
      assert(math.abs(s) <= nPairs, s"$st: |S|=$s > $nPairs")
      assert(v18 > 0, s"$st: var18=$v18")
      assert(v18 <= n * (n - 1) * (2 * n + 5), s"$st: tie term negative")
    }
  }

  test("q253: the flip flag is exactly the sign product and pooled is constant") {
    val rows = q("q253_simpsons_audit")
      .select("grp", "group_sign", "pooled_sign", "sign_flip")
      .as[(String, Int, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).distinct.length == 1, "pooled sign varies by row")
    rows.foreach { case (g, gs, ps, flip) =>
      assert(Set(-1, 0, 1)(gs) && Set(-1, 0, 1)(ps))
      assert(flip == (gs * ps == -1), s"$g flip flag inconsistent")
    }
  }

  test("q254: freshness card conserves event mass and buckets match lag") {
    val rows = q("q254_freshness_audit")
      .select("event_type", "n_events", "lag_minutes", "n_last_7d",
        "freshness")
      .as[(String, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val events = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(total == events, s"card mass $total != $events")
    rows.foreach { case (et, n, lag, n7, f) =>
      assert(lag >= 0 && n7 >= 0 && n7 <= n)
      val expected =
        if (lag < 60) "fresh" else if (lag < 1440) "stale" else "dead"
      assert(f == expected, s"$et bucket $f != $expected for lag $lag")
    }
  }
}
