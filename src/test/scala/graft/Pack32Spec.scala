package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q266-q270 pack: stump count/gain laws,
  * privacy-flag consistency, DiD cell arithmetic, readability bounds,
  * and PCA eigenvector structure (normalization, PSD Rayleigh
  * quotient, residual contraction). */
class Pack32Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q266: split counts partition the orders and gains are non-negative") {
    val rows = q("q266_decision_stump")
      .select("k", "threshold", "n_l", "u_l", "n_r", "u_r", "gini_gain",
        "is_best")
      .as[(Int, Double, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1 to 9))
    val n = graft.sources.Tables.load(spark, sfDir, "orders").count()
    rows.foreach { case (k, thr, nl, ul, nr, ur, gain, _) =>
      assert(nl + nr == n, s"k=$k: $nl + $nr != $n")
      assert(ul <= nl && ur <= nr)
      // splitting can never increase impurity (concavity of Gini)
      assert(gain >= -1e-9, s"k=$k gain $gain negative")
    }
    // thresholds are nondecreasing in k; left sizes track the deciles
    rows.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ => ()
    }
    assert(rows.count(_._8) >= 1, "no best split flagged")
    val best = rows.filter(_._8).map(_._7).head
    assert(rows.forall(_._7 <= best + 1e-9))
  }

  test("q267: privacy flags agree with the counts and sizes sum to customers") {
    val rows = q("q267_k_anonymity")
      .select("group_size", "l_distinct", "k_anonymous", "l_diverse")
      .as[(Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, l, ka, ld) =>
      assert(g >= 1)
      assert(ka == (g >= 5) && ld == (l >= 3))
      // at most 5 distinct priorities exist
      assert(l <= 5)
    }
    val customers = graft.sources.Tables.load(spark, sfDir, "customer").count()
    assert(rows.map(_._1).sum == customers)
  }

  test("q268: DiD cells cover all events and the estimate matches the cells") {
    val rows = q("q268_diff_in_diff")
      .select("treated", "post", "n", "mean_value", "did_estimate")
      .as[(Boolean, Boolean, Long, Double, Double)].collect()
    assert(rows.length == 4)
    assert(rows.map(r => (r._1, r._2)).distinct.length == 4)
    val events = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_._3).sum == events)
    val cell = rows.map(r => (r._1, r._2) -> r._4).toMap
    val did = cell((true, true)) - cell((true, false)) -
      cell((false, true)) + cell((false, false))
    rows.foreach(r => assert(math.abs(r._5 - did) < 1e-5))
  }

  test("q269: readability counts are consistent and bands match the score") {
    val rows = q("q269_readability")
      .select("doc_id", "n_words", "n_sentences", "n_syllables",
        "reading_ease", "band")
      .as[(Long, Long, Long, Long, Double, String)].collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == docs)
    rows.foreach { case (id, w, s, y, ease, band) =>
      assert(w >= 1 && s >= 1 && y >= 0)
      // a syllable run needs a word to live in (runs never cross the
      // spaces that delimit words)
      assert(y <= w * 30, s"doc $id: $y syllables for $w words")
      val expect = if (ease >= 70.0) "easy"
        else if (ease >= 50.0) "medium" else "hard"
      assert(band == expect, s"doc $id: band $band for ease $ease")
    }
  }

  test("q270: loadings are micro-normalized and the vector is a dominant direction") {
    val rows = q("q270_pca_power")
      .select("dim", "loading_units").as[(Int, Long)].collect()
    assert(rows.length == 64)
    assert(rows.map(_._1).sorted.toSeq == (0 until 64))
    val mx = rows.map(r => math.abs(r._2)).max
    // normalization lands the max-|loading| at ~1e6 (truncation slack)
    assert(mx >= 999000L && mx <= 1001000L, s"max |loading| $mx")
    // canonical sign: the largest-|loading| dim is positive
    val top = rows.minBy(r => (-math.abs(r._2), r._1))
    assert(top._2 > 0, s"canonical sign violated at $top")

    // the returned direction is dominant: its Rayleigh quotient over
    // the exact integer covariance beats 20 deterministic probe
    // directions (power iteration converged toward the top eigenpair)
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        round(col("v").cast("double") * 1e5).cast("long").as("e"))
      .as[(Long, Int, Long)].collect()
    val n = emb.map(_._1).distinct.length
    val byDim = emb.groupBy(_._2)
    val sums = byDim.map { case (d, rs) => d -> rs.map(_._3).sum }
    val byVec = emb.groupBy(_._1).map { case (vid, rs) =>
      vid -> rs.map(r => r._2 -> r._3).toMap
    }
    def cov(i: Int, j: Int): Double =
      (n.toDouble * byVec.valuesIterator.map(m => m(i).toDouble * m(j)).sum
        - sums(i).toDouble * sums(j))
    def rayleigh(v: Array[Double]): Double = {
      val num = (0 until 64).map(i => (0 until 64)
        .map(j => v(i) * cov(i, j) * v(j)).sum).sum
      val den = v.map(x => x * x).sum
      num / den
    }
    val got = Array.tabulate(64)(d => rows.find(_._1 == d).get._2.toDouble)
    val gotR = rayleigh(got)
    val rng = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val probe = Array.fill(64)(rng.nextDouble() - 0.5)
      assert(rayleigh(probe) <= gotR * (1 + 1e-6),
        "a random probe beat the returned direction")
    }
  }
}
