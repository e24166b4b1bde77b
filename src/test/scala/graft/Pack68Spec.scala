package graft

/** Semantic invariants for the q446-q450 co-purchase-graph pack:
  * rich-club monotone node shrinkage, support-share accounting,
  * Adamic-Adar ordering, attachment-correlation bounds, and degree
  * histogram coverage. */
class Pack68Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q446: richer clubs are smaller; phi stays in [0, 1]") {
    val rows = q("q446_rich_club")
      .orderBy("k")
      .select("k", "n_nodes", "n_edges", "phi")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).sameElements(Seq(2L, 4L, 8L, 16L)))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "club grew as the threshold rose")
      case _ => ()
    }
    rows.foreach { r =>
      if (r._2 > 1) assert(r._4 >= 0 && r._4 <= 1.0 + 1e-9)
      assert(r._3 <= r._2 * (r._2 - 1) / 2)
    }
  }

  test("q447: edge support shares sum to one") {
    val rows = q("q447_edge_support")
      .select("support_bucket", "n_edges", "edge_share")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    rows.foreach(r => assert(r._1 >= 1 && r._1 <= 10 && r._2 > 0))
  }

  test("q448: Adamic-Adar top list is sorted and positive") {
    val rows = q("q448_adamic_adar")
      .select("pa", "pb", "aa_score")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._1 < r._2)
      assert(r._3 > 0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 - 1e-9)
      case _ => ()
    }
  }

  test("q449: attachment correlation is a valid coefficient") {
    val r = q("q449_preferential_attachment")
      .select("n_parts", "pearson_r").as[(Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= -1.0 - 1e-9 && r._2 <= 1.0 + 1e-9)
  }

  test("q450: histogram + isolated parts cover the catalog") {
    val rows = q("q450_degree_histogram")
      .select("log2_bucket", "n_parts", "isolated")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nParts = spark.read.parquet(s"$sfDir/part.parquet").count()
    val covered = rows.map(_._2).sum + rows.head._3
    assert(covered == nParts,
      s"histogram $covered vs catalog $nParts")
  }
}
