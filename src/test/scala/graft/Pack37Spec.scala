package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q291-q295 pack: Markov probability
  * laws, chunk reassembly, matching balance, pruning soundness, and
  * variogram structure. */
class Pack37Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q291: probabilities are monotone in the horizon and purchase is absorbed") {
    val rows = q("q291_absorbing_markov")
      .select("event_type", "p_units", "p_convert")
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).contains("purchase"))
    rows.foreach { case (st, pu, p) =>
      assert(pu >= 0L && pu <= 1000000L, s"$st: $pu outside [0, 1e6]")
      assert(math.abs(p - pu / 1e6) < 1e-9)
    }
    assert(rows.find(_._1 == "purchase").get._2 == 1000000L)
    // with a 5-type uniform-ish chain, every state can reach purchase
    rows.foreach(r => assert(r._2 > 0L, s"${r._1} never converts"))
  }

  test("q292: chunks tile each document exactly and the ratio is shared") {
    val rows = q("q292_cdc_chunking")
      .select("doc_id", "n_chunks", "max_len", "avg_len",
        "corpus_distinct_ratio")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 200)
    val lens = graft.sources.Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") < 200)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, nc, mx, avg, r) =>
      assert(nc >= 1)
      assert(mx <= lens(id))
      // avg·n == total == document length (chunks tile the text)
      assert(math.abs(avg * nc - lens(id)) < 1e-3,
        s"doc $id: $avg * $nc != ${lens(id)}")
      assert(r > 0 && r <= 1.0)
    }
    assert(rows.map(_._5).distinct.length == 1)
  }

  test("q293: matched pairs are bounded by the smaller arm per cell") {
    val r = q("q293_matching_att")
      .select("n_pairs", "mean_treated", "mean_control", "att")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(math.abs(r._4 - (r._2 - r._3)) < 1e-4)
    // pair count = Σ min(|treated|, |control|) over cells
    val cells = graft.sources.Tables.load(spark, sfDir, "customer")
      .select((col("c_custkey") % 2 === 0).as("tr"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 2000.0).cast("long").as("band"))
      .groupBy("seg", "band")
      .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("tr"), 1L).otherwise(0L)).as("nc"))
      .as[(String, Long, Long, Long)].collect()
    val expect = cells.map(c => math.min(c._3, c._4)).sum
    assert(r._1 == expect, s"pairs ${r._1} != Σ min ${expect}")
  }

  test("q294: pruning never loses matching rows") {
    val rows = q("q294_pruning_stats")
      .select("predicate", "n_partitions", "n_pruned", "rows_scanned",
        "rows_matched")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 3)
    val total = graft.sources.Tables.load(spark, sfDir, "orders").count()
    rows.foreach { case (p, np, pr, sc, ma) =>
      assert(pr >= 0 && pr <= np)
      // soundness: every matching row lives in a scanned partition
      assert(ma <= sc, s"$p: matched $ma > scanned $sc")
      assert(sc <= total)
    }
  }

  test("q295: variogram pair counts shrink by one per lag") {
    val rows = q("q295_variogram")
      .select("lag", "n_pairs", "gamma").as[(Long, Long, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 == b._2 + 1)
      case _ => ()
    }
    rows.foreach(r => assert(r._3 >= 0))
  }
}
