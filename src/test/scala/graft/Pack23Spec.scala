package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Semantic invariants for the q213-q218 pack — conservation laws and
  * range/mutuality properties beyond the row-hash oracle, plus the
  * plan shapes (equi-join only, bounded window input) that make the
  * pack scale. */
class Pack23Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def plan(name: String): String =
    q(name).queryExecution.explainString(SimpleMode)

  test("q213: sweep-line conserves interval mass (deltas sum to zero)") {
    val peaks = q("q213_open_interval_peak")
      .select("mon", "peak_open").as[(String, Long)].collect()
    assert(peaks.nonEmpty && peaks.forall(_._2 >= 1))
    assert(peaks.map(_._1).toSeq == peaks.map(_._1).sorted.toSeq)
    // every +1 has a matching -1, so the running count must return to 0:
    // peak is bounded by the number of open intervals
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ordd"))
    val n = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("ship") >= col("ordd")).count()
    assert(peaks.map(_._2).max <= n)
  }

  test("q214: AA scores positive, bounded by common_cnt/ln 2, ordered pairs") {
    val rows = q("q214_adamic_adar")
      .select("c1", "c2", "common_cnt", "score")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c1, c2, cnt, sc) =>
      assert(c1 < c2 && cnt >= 1)
      // each common-neighbor term is at most 1/ln(2) (deg >= 2)
      assert(sc > 0.0 && sc <= cnt / math.log(2.0) + 1e-6,
        s"($c1,$c2) score $sc for $cnt commons")
    }
  }

  test("q215: AUC in [0,1], gini = 2*auc-1, counts partition the source") {
    val perSource = graft.sources.Tables.load(spark, sfDir, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val rows = q("q215_roc_auc")
      .select("source", "n_pos", "n_neg", "auc", "gini")
      .as[(String, Long, Long, Option[Double], Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, np, nn, auc, gini) =>
      assert(np + nn == perSource(src), s"$src counts")
      auc.foreach(a => assert(a >= 0.0 && a <= 1.0, s"$src auc $a"))
      (auc, gini) match {
        case (Some(a), Some(g)) =>
          assert(math.abs(g - (2 * a - 1)) < 2e-6, s"$src gini $g auc $a")
        case _ => ()
      }
    }
  }

  test("q216: calibration bins partition the corpus, rates in [0,1]") {
    val rows = q("q216_calibration_bins")
      .select("bin", "n", "pos_rate").as[(Long, Long, Double)].collect()
    val total = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (b, _, r) =>
      assert(b >= 0 && b <= 9 && r >= 0.0 && r <= 1.0)
    }
  }

  test("q217: census distances in band; pair mass bounded by block sizes") {
    val rows = q("q217_editdist_census")
      .select("w", "dist", "n_pairs").as[(String, Int, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 4))
    // total census pairs can't exceed sum over blocks of C(size, 2)
    val bound = graft.sources.Tables.load(spark, sfDir, "part")
      .groupBy(substring_index(col("p_name"), " ", 1), col("p_size"))
      .count()
      .select(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .as[Long].head()
    assert(rows.map(_._3).sum <= bound)
  }

  test("q218: mutual pairs are disjoint (each vector in at most one pair)") {
    val rows = q("q218_mutual_nn")
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val ids = rows.flatMap(r => Seq(r._1, r._2))
    assert(ids.distinct.length == ids.length, "a vector appears twice")
    rows.foreach { case (a, b, c) =>
      assert(a < b && c >= -1.0 && c <= 1.0 + 1e-9)
    }
  }

  test("q213/q214/q217: equi-joins only, no cartesian product") {
    Seq("q213_open_interval_peak", "q214_adamic_adar",
      "q217_editdist_census").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian product")
    }
  }
}
