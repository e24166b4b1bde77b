package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q243-q248 pack: census thresholds,
  * heatmap mass conservation, decorrelated-subquery plan shape, a
  * clean-FK law on the synthetic star, tolerance-join consistency with
  * q26, and bounce-rate arithmetic. */
class Pack28Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q243: every census row has >= 2 docs and sources <= docs") {
    val rows = q("q243_boilerplate_prefix")
      .select("prefix", "n_docs", "n_sources")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, nd, ns) =>
      assert(p.nonEmpty && nd >= 2 && ns >= 1 && ns <= nd)
    }
  }

  test("q244: 168-cell heatmap conserves total event mass") {
    val rows = q("q244_dow_hour_heatmap")
      .select("iso_dow", "hour", "n").as[(Long, Long, Long)].collect()
    rows.foreach { case (d, h, n) =>
      assert(d >= 1 && d <= 7 && h >= 0 && h <= 23 && n > 0)
    }
    val total = rows.map(_._3).sum
    val events = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(total == events, s"heatmap mass $total != $events")
  }

  test("q245: correlated subqueries decorrelate (no per-row re-execution)") {
    val df = q("q245_correlated_gallery")
    val p = df.queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"))
    // every surviving customer has >= 1 order (the EXISTS branch)
    df.select("n_orders").as[Long].collect().foreach(n => assert(n >= 1))
  }

  test("q246: the synthetic star is referentially clean (all zeros)") {
    val rows = q("q246_fk_orphans")
      .select("fk_edge", "n_orphans").as[(String, Long)].collect()
    assert(rows.length == 6)
    rows.foreach { case (e, n) => assert(n == 0, s"$e has $n orphans") }
  }

  test("q247: tolerance join only ever drops q26 matches, never adds") {
    val q26 = q("q26_asof_prior_purchase")
      .select("event_id", "purchase_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val rows = q("q247_asof_tolerance")
      .select("event_id", "purchase_event_id", "stale_dropped")
      .as[(Long, Option[Long], Boolean)].collect()
    assert(rows.nonEmpty)
    var dropped = 0
    rows.foreach { case (eid, m, stale) =>
      val base = q26(eid)
      m match {
        case Some(pid) =>
          assert(base.contains(pid), s"event $eid gained a match")
          assert(!stale)
        case None =>
          if (stale) { assert(base.nonEmpty); dropped += 1 }
          else assert(base.isEmpty, s"event $eid lost a fresh match")
      }
    }
    assert(rows.count(_._3) == dropped)
  }

  test("q248: bounce rate and mean depth are consistent per entry") {
    val rows = q("q248_session_entry_exit")
      .select("entry", "n_sessions", "bounce_rate", "mean_depth")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, n, br, md) =>
      assert(n > 0, e)
      assert(br >= 0.0 && br <= 1.0)
      assert(md >= 1.0, s"$e mean depth $md < 1")
    }
  }
}
