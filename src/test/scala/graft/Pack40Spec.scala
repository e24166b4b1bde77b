package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q306-q310 pack: concordance identities,
  * gains-table laws, concurrency percentile ordering, Chapman bounds,
  * and dedup-sweep monotonicity. */
class Pack40Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q306: concordant + discordant never exceed the pair count and tau is bounded") {
    val r = q("q306_kendall_tau")
      .select("n0", "concordant", "discordant", "tau_b")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 + r._3 <= r._1)
    assert(r._4 >= -1.0 - 1e-9 && r._4 <= 1.0 + 1e-9)
  }

  test("q307: capture is monotone to 1 and decile-10 lift is exactly 1") {
    val rows = q("q307_gains_table")
      .select("decile", "n", "pos", "cum_capture", "lift")
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4 + 1e-9)
      case _ => ()
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-9)
    assert(math.abs(rows.last._5 - 1.0) < 1e-9)
    rows.foreach(r => assert(r._5 >= 0))
  }

  test("q308: concurrency percentiles are ordered and below the peak") {
    val r = q("q308_concurrency_pcts")
      .select("p50", "p90", "p99", "peak")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 <= r._2 && r._2 <= r._3 && r._3 <= r._4,
      s"percentiles out of order: $r")
    assert(r._1 >= 0)
  }

  test("q309: Chapman estimate is at least the larger capture and at most plausible") {
    val r = q("q309_capture_recapture")
      .select("na", "nb", "m", "true_n", "n_hat", "coverage")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r._3 <= math.min(r._1, r._2), "marks exceed a capture")
    assert(r._4 >= math.max(r._1, r._2), "true vocab below a capture")
    assert(r._5 >= math.max(r._1, r._2) - 1, s"estimate ${r._5} too small")
    // Chapman never exceeds the product bound
    assert(r._5 <= (r._1 + 1) * (r._2 + 1))
    assert(r._6 > 0)
  }

  test("q310: smaller chunks never reduce the savings and counts grow") {
    val rows = q("q310_dedup_savings")
      .select("modulus", "n_chunks", "total_bytes", "savings")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(32, 64, 128))
    // total bytes = corpus size regardless of chunking
    assert(rows.map(_._3).distinct.length == 1)
    rows.sliding(2).foreach {
      case Array(small, large) =>
        assert(small._2 >= large._2, "finer modulus produced fewer chunks")
        assert(small._4 >= large._4 - 1e-9,
          "finer chunks found less duplication")
      case _ => ()
    }
  }
}
