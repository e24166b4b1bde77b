package graft

/** Semantic invariants for the q376-q380 clustering-quality pack:
  * variance decomposition positivity, silhouette bounds, DB/CH
  * consistency, Hopkins range, and confusion-audit accounting. */
class Pack54Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q376: CH pieces are positive and k matches the label count") {
    val r = q("q376_calinski_harabasz")
      .select("n_vecs", "k", "ssb", "ssw", "ch_index")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 500 && r._2 == 10)
    assert(r._3 > 0 && r._4 > 0)
    assert(r._5 > 0 && !r._5.isInfinite)
  }

  test("q377: per-cluster mean silhouettes lie in [-1, 1]") {
    val rows = q("q377_silhouette")
      .select("label", "n", "mean_silhouette")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sum == 500)
    rows.foreach { r =>
      assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9,
        s"silhouette ${r._3} outside [-1,1] for label ${r._1}")
    }
  }

  test("q378: DB index is positive and finite over 10 clusters") {
    val r = q("q378_davies_bouldin")
      .select("k", "db_index").as[(Long, Double)].head()
    assert(r._1 == 10)
    assert(r._2 > 0 && !r._2.isInfinite)
  }

  test("q379: Hopkins is a proper fraction of the two distance sums") {
    val r = q("q379_hopkins")
      .select("m_probes", "sum_u", "sum_w", "hopkins")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 50)
    assert(r._2 > 0 && r._3 > 0)
    assert(r._4 > 0 && r._4 < 1, s"Hopkins ${r._4} outside (0,1)")
    // H must equal W/(U+W) recomputed from the emitted sums
    assert(math.abs(r._4 - r._3 / (r._2 + r._3)) < 1e-4)
  }

  test("q380: confusion audit accounts for every vector") {
    val rows = q("q380_nearest_centroid")
      .select("label", "n", "correct", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sum == 500)
    rows.foreach { r =>
      assert(r._3 >= 0 && r._3 <= r._2)
      assert(math.abs(r._4 - r._3.toDouble / r._2) < 1e-5)
    }
    // labeled synthetic clusters should be mostly recoverable from
    // geometry; require better-than-chance overall accuracy
    val acc = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(acc > 0.1, s"nearest-centroid accuracy $acc at chance level")
  }
}
