package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q286-q290 pack: changepoint nesting,
  * k-NN vote arithmetic, principal-score envelopes, Weiszfeld descent,
  * and LATERAL top-N laws. */
class Pack36Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q286: level-2 splits nest strictly inside level 1 and gains are positive") {
    val rows = q("q286_binseg_changepoints")
      .select("level", "seg_start_day", "seg_end_day", "split_day",
        "gain_units")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val l1 = rows.filter(_._1 == 1)
    assert(l1.length == 1)
    val (s1, e1, k1) = (l1.head._2, l1.head._3, l1.head._4)
    assert(s1 < k1 && k1 < e1)
    rows.filter(_._1 == 2).foreach { case (_, a, b, k, _) =>
      assert(a >= s1 && b <= e1)
      assert(a <= k && k <= b, s"split $k outside [$a, $b]")
    }
    // a split only exists when it reduces within-segment SS
    rows.foreach(r => assert(r._5 >= 0, s"negative gain ${r._5}"))
  }

  test("q287: every held-out vector gets one verdict with a valid vote count") {
    val rows = q("q287_knn_eval")
      .select("vec_id", "label_true", "label_knn", "votes", "correct")
      .as[(Long, Int, Int, Long, Boolean)].collect()
    // the audit samples a FIXED 64-query set (smallest qualifying ids)
    // so its exact-kNN cost stays O(corpus) at any sf
    val held = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .where(col("vec_id") % 5 === 0).count() min 64L
    assert(rows.length == held)
    rows.foreach { case (id, t, p, v, c) =>
      assert(id % 5 == 0)
      assert(v >= 1 && v <= 5, s"vec $id: $v votes")
      // majority of 5 with a vote >= 2 unless all five labels differ
      assert(c == (t == p))
    }
    // labels exist in the table's domain
    val labels = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("label").distinct().as[Int].collect().toSet
    rows.foreach(r => assert(labels.contains(r._3)))
  }

  test("q288: score envelopes bound the means and all labels appear") {
    val rows = q("q288_principal_scores")
      .select("label", "n", "mean_score", "min_score", "max_score")
      .as[(Int, Long, Double, Double, Double)].collect()
    val total = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (l, n, mean, mn, mx) =>
      assert(n > 0)
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9,
        s"label $l: mean $mean outside [$mn, $mx]")
    }
  }

  test("q289: Weiszfeld strictly decreases the transport objective") {
    val iters = q("q289_geometric_median")
      .select("iteration", "cx", "cy").as[(Int, Long, Long)].collect()
      .sortBy(_._1)
    assert(iters.map(_._1).toSeq == (0 to 5))
    val pts = graft.sources.Tables.load(spark, sfDir, "customer")
      .join(graft.sources.Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("sp")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(round(col("c_acctbal")).cast("long"),
        coalesce(round(col("sp").cast("double")), lit(0.0)).cast("long"))
      .as[(Long, Long)].collect()
    def obj(cx: Long, cy: Long): Double = pts.map { case (x, y) =>
      math.sqrt((x - cx).toDouble * (x - cx) + (y - cy).toDouble * (y - cy))
    }.sum
    val objs = iters.map(i => obj(i._2, i._3))
    objs.sliding(2).foreach {
      case Array(a, b) =>
        // nonincreasing up to the integer-dollar flooring slack
        assert(b <= a + pts.length,
          s"objective rose: $a -> $b")
      case _ => ()
    }
    // the final center beats the coordinate-mean start
    assert(objs.last <= objs.head)
  }

  test("q290: each nation contributes its exact top-2 orders") {
    val rows = q("q290_lateral_topn")
      .select("n_name", "o_orderkey", "o_totalprice")
      .as[(String, Long, Double)].collect()
    val perNation = rows.groupBy(_._1)
    perNation.foreach { case (n, rs) =>
      assert(rs.length <= 2, s"$n has ${rs.length} rows")
    }
    // differential: recompute via window rank
    val expect = graft.sources.Tables.load(spark, sfDir, "orders")
      .join(graft.sources.Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("n_name")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .where(col("rk") <= 2)
      .select("n_name", "o_orderkey", "o_totalprice")
      .as[(String, Long, Double)].collect().toSet
    assert(rows.toSet == expect)
  }
}
