package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q276-q280 pack plus the SortedCeil
  * expression: SAX alphabet laws, rolling-OLS frame arithmetic,
  * Burrows' Delta metric properties, Louvain gain sanity, and
  * leakage-free fold structure. */
class Pack34Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("SortedCeil matches the lambda form and handles wraparound") {
    val codes = Array(5L, 10L, 10L, 42L, 99L)
    val df = spark.range(-3, 110).select(col("id"))
    val got = df.select(col("id"),
        graft.functions.SortedCeil.sortedCeil(col("id"), codes, codes.min)
          .as("c"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, c) =>
      val expect = codes.find(_ >= v).getOrElse(codes.min)
      assert(c == expect, s"ceil($v) = $c, want $expect")
    }
    // interpreted path agrees with codegen
    val e = graft.functions.SortedCeil(
      org.apache.spark.sql.catalyst.expressions.Literal(100L), codes, 5L)
    assert(e.eval(null) == 5L)
  }

  test("q276: segments partition the day series and symbols are quartile-consistent") {
    val rows = q("q276_sax_encoding")
      .select("segment", "n_days", "paa", "symbol")
      .as[(Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sorted.toSeq ==
      rows.map(_._1).min.to(rows.map(_._1).max))
    // every symbol class is non-empty-ish and ordered by paa
    val bySym = rows.groupBy(_._4)
    assert(bySym.keySet.subsetOf(Set("a", "b", "c", "d")))
    for (lo <- Seq(("a", "b"), ("b", "c"), ("c", "d"))) {
      (bySym.get(lo._1), bySym.get(lo._2)) match {
        case (Some(l), Some(h)) =>
          assert(l.map(_._3).max <= h.map(_._3).min + 1e-9,
            s"${lo._1} overlaps ${lo._2}")
        case _ => ()
      }
    }
    // days covered = sum of segment sizes
    val nDays = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date")).distinct().count()
    assert(rows.map(_._2).sum == nDays)
  }

  test("q277: slope matches a driver-side OLS over each 7-day frame") {
    val daily = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        .cast("double").as("rev"))
      .orderBy("day").as[(Long, Double)].collect()
    val rows = q("q277_rolling_ols")
      .select("day", "rev", "slope").as[(Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.length == daily.length - 6)
    val expect = daily.sliding(7).map { w =>
      val n = 7.0
      val sx = w.map(_._1).sum.toDouble
      val sxx = w.map(p => p._1 * p._1).sum.toDouble
      val sy = w.map(_._2).sum
      val sxy = w.map(p => p._1 * p._2).sum
      (w.last._1, (n * sxy - sx * sy) / (n * sxx - sx * sx))
    }.toMap
    rows.foreach { case (d, _, s) =>
      assert(math.abs(s - expect(d)) < 1e-3, s"day $d slope $s vs ${expect(d)}")
    }
  }

  test("q278: delta is a pseudometric over sources (symmetric pairs, nonneg)") {
    val rows = q("q278_burrows_delta")
      .select("source_a", "source_b", "delta")
      .as[(String, String, Double)].collect()
    val k = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { case (a, b, d) =>
      assert(a < b)
      assert(d >= 0.0 && d.isFinite, s"delta($a,$b) = $d")
    }
  }

  test("q279: gains reference real neighbor communities and never the own one") {
    val rows = q("q279_louvain_gains")
      .select("node", "from_community", "to_community", "kid", "gain")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length <= 20)
    rows.foreach { case (n, c, d, kid, g) =>
      assert(c != d, s"node $n: move to own community")
      assert(kid >= 1, s"node $n: no links to claimed target")
      assert(g.isFinite)
    }
    // output is ordered by gain desc
    rows.map(_._5).sliding(2).foreach {
      case Array(x, y) => assert(x >= y + -1e-12)
      case _ => ()
    }
  }

  test("q280: folds cover all docs and no cluster straddles folds") {
    val rows = q("q280_group_folds")
      .select("fold", "n_docs", "n_clusters", "n_langs", "split_clusters")
      .as[(Long, Long, Long, Long, Long)].collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == docs)
    rows.foreach { case (f, nd, nc, nl, sc) =>
      assert(f >= 0 && f < 5)
      assert(nc <= nd)
      assert(sc == 0L, "a near-dup cluster straddles folds")
      assert(nl >= 1)
    }
  }
}
