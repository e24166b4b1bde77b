package graft

/** Semantic invariants for the q426-q430 corpus-engineering pack:
  * truncation-loss monotonicity, shingle saturation decay, duplicate
  * histogram accounting, vocabulary coverage reaching 1, and
  * token-mass monotonicity in k. */
class Pack64Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q426: loss decreases as the context budget grows") {
    val rows = q("q426_truncation_loss")
      .orderBy("limit_chars")
      .select("limit_chars", "n_docs", "docs_truncated",
        "frac_chars_lost")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).sameElements(Seq(128L, 256L, 512L, 1024L)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, "more docs truncated at a larger budget")
      assert(b._4 <= a._4 + 1e-9, "more chars lost at a larger budget")
    }
    rows.foreach(r => assert(r._4 >= 0 && r._4 <= 1))
  }

  test("q427: quartile yields sum to the distinct shingle count") {
    val rows = q("q427_shingle_saturation")
      .orderBy("quartile")
      .select("quartile", "new_shingles", "cum_shingles")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sameElements(1L to rows.length))
    assert(rows.last._3 == rows.map(_._2).sum)
    rows.foreach(r => assert(r._2 > 0))
  }

  test("q428: cluster histogram covers every document") {
    val rows = q("q428_dup_cluster_histogram")
      .select("cluster_size", "n_clusters", "doc_share")
      .as[(Long, Long, Double)].collect()
    val nd = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(r => r._1 * r._2).sum == nd,
      "size*count must cover the corpus")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
  }

  test("q429: cumulative coverage is monotone and ends at 1") {
    val rows = q("q429_vocab_contribution")
      .orderBy("source_num")
      .select("source_num", "new_terms", "cum_terms", "cum_coverage")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // early sources can claim the whole vocabulary (few contributing
    // rows at small SF) — only compare consecutive contributors
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 > a._3, "cumulative terms must strictly grow")
      case _ => ()
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-9,
      s"final coverage ${rows.last._4} != 1")
  }

  test("q430: head mass share grows with k and caps at 1") {
    val rows = q("q430_token_mass_concentration")
      .orderBy("top_k")
      .select("top_k", "vocab", "mass_share")
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).sameElements(Seq(10L, 100L, 1000L)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 - 1e-9, "mass share shrank as k grew")
    }
    rows.foreach(r => assert(r._3 > 0 && r._3 <= 1.0 + 1e-9))
  }
}
