package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q255-q260 pack: adoption-curve
  * monotonicity and mass, leakage split disjointness, skip-gram count
  * dominance over Markov transitions, TWAP bounds, duplicate-census
  * arithmetic, and the ABC partition laws. */
class Pack30Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q255: cumulative users are monotone and end at the distinct-user count") {
    val rows = q("q255_adoption_curve")
      .select("day", "n_new", "cum_users").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { case (_, nNew, c) =>
      assert(nNew > 0); cum += nNew
      assert(c == cum, s"running sum mismatch: $c != $cum")
    }
    val users = graft.sources.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(cum == users)
  }

  test("q256: one row per test vector, neighbors always come from train") {
    val rows = q("q256_semantic_leakage")
      .select("test_id", "nn_train_id", "cosine", "leaked")
      .as[(Long, Long, Double, Boolean)].collect()
    val nTest = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 5 === 0).count()
    assert(rows.length.toLong == nTest)
    rows.foreach { case (tid, nid, cos, leaked) =>
      assert(tid % 5 == 0 && nid % 5 != 0, s"split violated: $tid -> $nid")
      assert(leaked == (cos >= 0.98))
    }
  }

  test("q257: distance-1 slice dominates each Markov transition count") {
    // every consecutive pair is also a skip-gram pair, so the census
    // must dominate the per-(a,b) consecutive-transition count
    val sg = q("q257_event_skipgrams")
      .select("etype_a", "etype_b", "n_pairs")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val consec = ev
      .select(col("event_type").as("etype_a"),
        lead(col("event_type"), 1).over(w).as("etype_b"))
      .where(col("etype_b").isNotNull)
      .groupBy("etype_a", "etype_b").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    assert(consec.nonEmpty)
    consec.foreach { case (a, b, n) =>
      assert(sg.getOrElse((a, b), 0L) >= n,
        s"($a,$b): skipgram ${sg.get((a, b))} < consecutive $n")
    }
  }

  test("q258: TWAP lies within the observed value range and weights are capped") {
    val rows = q("q258_twap")
      .select("event_type", "n_holds", "held_seconds", "twap")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, hs, twap) =>
      assert(n > 0 && hs > 0)
      assert(hs <= n * 3600L, s"$et: held $hs exceeds cap * holds")
      assert(twap >= 0.0 && twap <= 561.0, s"$et: twap $twap out of range")
    }
  }

  test("q259: duplicate census arithmetic is internally consistent") {
    val rows = q("q259_telemetry_dupes")
      .select("event_type", "n_events", "n_dups", "dup_rate",
        "n_affected_users")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val events = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(total == events)
    rows.foreach { case (et, n, d, r, u) =>
      assert(d >= 0 && d <= n && u <= d.max(1))
      assert(math.abs(r - d.toDouble / n) < 1e-6, s"$et rate")
    }
  }

  test("q260: ABC partitions the part set and class A leads the revenue") {
    val rows = q("q260_abc_classification")
      .select("abc_class", "n_parts", "class_rev")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == rows.map(_._1).distinct.toSeq)
    val nParts = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts)
    val byClass = rows.map(r => r._1 -> r).toMap
    // with 80/95 cuts, A-revenue >= any single other class's revenue
    byClass.get("A").foreach { a =>
      byClass.get("C").foreach(c => assert(a._3 >= c._3))
    }
    rows.foreach { case (_, n, rev) => assert(n > 0 && rev >= 0.0) }
  }
}
