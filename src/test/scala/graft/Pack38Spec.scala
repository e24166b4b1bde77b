package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q296-q300 pack: PACF/ACF relationships,
  * Parseval-style periodogram bounds, dispersion laws, the isotonic
  * fit's PAVA properties, and health-card arithmetic. */
class Pack38Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q296: pacf(1) = acf(1) and all values are valid correlations") {
    val rows = q("q296_pacf").select("lag", "acf", "pacf")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 5))
    val first = rows.head
    assert(math.abs(first._2 - first._3) < 1e-9, "pacf(1) != acf(1)")
    rows.foreach { case (h, a, p) =>
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf($h)=$a")
      assert(p >= -1.0 - 1e-9 && p <= 1.0 + 1e-9, s"pacf($h)=$p")
    }
  }

  test("q297: spectral power is nonnegative and bounded by total energy") {
    val rows = q("q297_periodogram").select("period", "power")
      .as[(Int, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(7, 14, 30, 91, 365))
    // total energy of the series bounds any single projection
    val xs = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(expr("cast(round(cast(sum(cast(o_totalprice as decimal(12,2)))" +
        " as double)) as bigint) div 1000").as("xk"))
      .select("xk").as[Long].collect()
    val energy = xs.map(x => x.toDouble * x).sum
    rows.foreach { case (p, pw) =>
      assert(pw >= 0, s"period $p power $pw")
      assert(pw <= energy * 1.000001, s"period $p power $pw > energy $energy")
    }
  }

  test("q298: dispersion matches a driver-side replay with zeros included") {
    val rows = q("q298_dispersion_index")
      .select("event_type", "n_users", "mean_count", "dispersion")
      .as[(String, Long, Double, Double)].collect()
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").as[(Long, String)].collect()
    val users = ev.map(_._1).distinct
    rows.foreach { case (et, nu, mean, disp) =>
      assert(nu == users.length)
      val counts = {
        val m = ev.filter(_._2 == et).groupBy(_._1)
          .map { case (u, xs) => u -> xs.length.toLong }
        users.map(u => m.getOrElse(u, 0L))
      }
      val mu = counts.sum.toDouble / counts.length
      assert(math.abs(mean - mu) < 1e-6)
      val varN = counts.map(k => (k - mu) * (k - mu)).sum / counts.length
      assert(math.abs(disp - varN / mu) < 1e-4, s"$et: $disp vs ${varN / mu}")
    }
  }

  test("q299: the isotonic fit is monotone, mass-preserving, and dominated") {
    val rows = q("q299_isotonic_regression")
      .select("bin", "n", "u", "rate", "isotonic_fit")
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))
    // monotone nondecreasing
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._5 + 1e-9, "fit not monotone")
      case _ => ()
    }
    // weighted mass preservation (PAVA property): Σ n·fit == Σ u
    val mass = rows.map(r => r._2 * r._5).sum
    val target = rows.map(_._3).sum.toDouble
    assert(math.abs(mass - target) < target * 1e-3 + 1.0,
      s"fit mass $mass vs urgent mass $target")
    rows.foreach(r => assert(r._5 >= 0 && r._5 <= 1))
  }

  test("q300: health-card fields agree with direct counts") {
    val r = q("q300_corpus_health")
      .select("n_docs", "dup_rate", "total_tokens", "mean_tokens",
        "lang_entropy", "short_share")
      .as[(Long, Double, Long, Double, Double, Double)].head()
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    assert(r._1 == d.count())
    val distinct = d.select(md5(col("text"))).distinct().count()
    assert(math.abs(r._2 - (1.0 - distinct.toDouble / r._1)) < 1e-6)
    assert(math.abs(r._4 - r._3.toDouble / r._1) < 1e-6)
    // entropy of a 5-language corpus is within [0, ln 5]
    assert(r._5 >= 0 && r._5 <= math.log(5.0) + 1e-6)
    assert(r._6 >= 0 && r._6 <= 1)
  }
}
