package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q141-q175 packs — properties the
  * row-hash oracle can't express: estimator ranges, monotonicity,
  * probability simplexes, conservation, and (the load-bearing one)
  * PPJoin candidate COMPLETENESS against the exact all-pairs join. */
class StatPackSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q149 PPJoin prefix filtering loses NO pair above threshold") {
    // exact all-pairs token Jaccard on the same slice (tractable at
    // sf0.001) — the prefix-filtered output must equal it exactly
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = toks.select(col("doc_id").as("id_a"), col("tok"))
      .join(toks.select(col("doc_id").as("id_b"), col("tok")), Seq("tok"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") /
      (col("na") + col("nb") - col("i")).cast("double")
    val exact = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .where(jac >= 0.85)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
    assertSameRows(q("q149_ppjoin_prefix"), exact)
  }

  test("q150 survival curve is non-increasing from 1 and risk sets conserve") {
    val rows = q("q150_km_survival")
      .select("t", "d", "c", "n", "survival")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.head._5 <= 1.0 + 1e-9)
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-9, s"survival increased at t=${b._1}")
      // risk set shrinks by exactly the events + censored at each step
      assert(b._4 == a._4 - a._2 - a._3,
        s"risk-set conservation broken at t=${b._1}")
    }
  }

  test("q154 Markov rows form a probability simplex per from_type") {
    val sums = q("q154_markov_transitions")
      .groupBy("from_type").agg(sum(col("prob")).as("s"))
      .as[(String, Double)].collect()
    sums.foreach { case (ft, s) =>
      assert(math.abs(s - 1.0) < 1e-4, s"$ft probs sum to $s")
    }
  }

  test("q153 Gini and q152 KS stay in their ranges") {
    q("q153_gini_concentration").select("gini").as[Double].collect()
      .foreach(g => assert(g >= 0.0 && g < 1.0, s"gini $g out of range"))
    val Array((d, n1, n2)) = q("q152_ks_test")
      .select("d_stat", "n1", "n2").as[(Double, Long, Long)].collect()
    assert(d >= 0.0 && d <= 1.0 && n1 > 0 && n2 > 0)
  }

  test("q146 histogram conserves rows; q160 RFM conserves customers") {
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    val histTotal = q("q146_histogram").agg(sum(col("n"))).as[Long].head()
    assert(histTotal == o.count())
    val rfmTotal = q("q160_rfm_segments").agg(sum(col("customers")))
      .as[Long].head()
    assert(rfmTotal == o.select("o_custkey").distinct().count())
  }

  test("q161 quantile normalization is monotone within each lang") {
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val rows = q("q161_quantile_norm").join(d, Seq("doc_id"))
      .select("lang", "n_chars", "qnorm", "doc_id")
      .as[(String, Long, Double, Long)].collect()
      .groupBy(_._1)
    rows.values.foreach { xs =>
      xs.sortBy(x => (x._2, x._4)).sliding(2).filter(_.length == 2)
        .foreach { w =>
          val (a, b) = (w(0), w(1))
          assert(b._3 >= a._3 - 1e-9,
            s"qnorm not monotone in lang ${a._1}: $a then $b")
        }
    }
  }

  test("q166 capped balance respects its bounds at every group") {
    q("q166_capped_running_sum")
      .select("status", "final_balance")
      .as[(String, Double)].collect()
      .foreach { case (st, bal) =>
        assert(bal >= -1e-6, s"$st balance $bal below floor") }
  }

  test("graph metrics stay in range; k-core peel is monotone") {
    q("q181_clustering_coeff").select("cc").as[Double].collect()
      .foreach(c => assert(c >= 0.0 && c <= 1.0, s"cc $c out of range"))
    val Array((_, r)) = q("q182_assortativity")
      .select("n_edges", "assortativity").as[(Long, Double)].collect()
    assert(r >= -1.0 && r <= 1.0, s"assortativity $r out of range")
    q("q183_modularity").select("q_c").as[Double].collect()
      .foreach(x => assert(x <= 1.0 && x >= -1.0, s"q_c $x out of range"))
    val peel = q("q185_kcore_peel")
      .select("round", "n_nodes", "n_edges")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    peel.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(1)._2 <= w(0)._2 && w(1)._3 <= w(0)._3,
        "peel must shrink monotonically")
    }
  }

  test("q151 Benford digits cover 1..9 and observations conserve") {
    val rows = q("q151_benford_audit")
      .select("digit", "o").as[(Int, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1 to 9))
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .where(col("l_extendedprice") > 0).count()
    assert(rows.map(_._2).sum == li)
  }
}
