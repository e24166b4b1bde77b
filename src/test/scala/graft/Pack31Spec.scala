package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q261-q265 pack: 3-gram/skip-gram
  * consistency, WoE mass and IV sign laws, confusion-matrix row
  * normalization, TextRank structural properties, and churn-series
  * arithmetic. */
class Pack31Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q261: 3-gram mass never exceeds the skip-gram pair mass squared path") {
    val tri = q("q261_event_3grams")
      .select("etype_a", "etype_b", "etype_c", "n_seqs")
      .as[(String, String, String, Long)].collect()
    assert(tri.nonEmpty)
    // every (a,b) prefix of a 3-gram must exist as a skip-gram pair,
    // and its pair count dominates the summed 3-gram continuations
    val pairs = q("q257_event_skipgrams")
      .select("etype_a", "etype_b", "n_pairs")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    tri.groupBy(x => (x._1, x._2)).foreach { case ((a, b), rows) =>
      val pairN = pairs.getOrElse((a, b), 0L)
      assert(pairN > 0, s"prefix ($a,$b) missing from skip-grams")
      // each pair row extends to at most 3 continuations per c-type
      assert(rows.map(_._4).sum <= pairN * 3,
        s"($a,$b): 3-gram mass ${rows.map(_._4).sum} > ${pairN * 3}")
    }
  }

  test("q262: bins partition the orders and IV contributions share WoE's sign") {
    val rows = q("q262_woe_binning")
      .select("bin", "n", "n_urgent", "woe", "iv_contrib")
      .as[(Int, Long, Long, Option[Double], Option[Double])].collect()
    assert(rows.map(_._1).sorted.toSeq == (1 to 10))
    val orders = graft.sources.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum == orders)
    rows.foreach { case (bin, n, nu, woe, iv) =>
      assert(nu >= 0 && nu <= n)
      (woe, iv) match {
        case (Some(w), Some(c)) =>
          // iv = (pu - pn) * woe and sign(pu - pn) == sign(woe)
          assert(c >= -1e-9, s"bin $bin: IV contribution $c negative")
          assert(w.isFinite && c.isFinite)
        case (None, None) => ()
        case other => fail(s"bin $bin: woe/iv nullity diverged: $other")
      }
    }
  }

  test("q263: confusion rows normalize to 1 within each declared lang") {
    val rows = q("q263_langid_confusion")
      .select("lang_declared", "lang_pred", "n", "share_of_declared",
        "correct")
      .as[(String, String, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (decl, rs) =>
      val share = rs.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$decl shares sum to $share")
    }
    rows.foreach { case (d, p, n, _, c) =>
      assert(n > 0); assert(c == (d == p))
    }
    // total mass = document count
    val docs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum == docs)
  }

  test("q264: TextRank returns ranked keywords of >= 4 chars with positive rank") {
    val rows = q("q264_textrank_keywords")
      .select("word", "rank_units").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (w, r) =>
      assert(w.length >= 4, s"word '$w' below token floor")
      // damping floor: rank never drops below 0.15 in micro-units
      assert(r >= 150000L, s"$w rank $r below damping floor")
    }
    val sorted = rows.map(_._2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "output not rank-ordered")
      case _ => ()
    }
  }

  test("q265: churn never exceeds actives and the max day is excluded") {
    val rows = q("q265_daily_churn")
      .select("day", "actives", "churned", "churn_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val maxDay = graft.sources.Tables.load(spark, sfDir, "events")
      .select(floor(unix_micros(col("ts")) / 86400000000L).cast("long")
        .as("d")).agg(max("d")).as[Long].head()
    rows.foreach { case (d, a, c, r) =>
      assert(d < maxDay)
      assert(c >= 0 && c <= a)
      assert(math.abs(r - c.toDouble / a) < 1e-6)
    }
  }
}
