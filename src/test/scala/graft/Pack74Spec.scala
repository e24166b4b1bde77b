package graft

/** Semantic invariants for the q476-q480 cross-language profiling
  * pack: entropy bounds, chi-square nonnegativity, richness
  * accounting, Jaccard symmetry bounds, and the abbreviation-law
  * sign. */
class Pack74Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q476: conditional entropy is nonnegative per language") {
    val rows = q("q476_bigram_cond_entropy")
      .select("lang", "n_bigram_types", "cond_entropy_nats")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 > 0)
      assert(r._3 >= -1e-6, s"${r._1}: H(next|cur) ${r._3} negative")
      // conditional entropy can't exceed ln(bigram types)
      assert(r._3 <= math.log(r._2.toDouble) + 1e-6)
    }
  }

  test("q477: homogeneity chi-square is nonnegative over the cells") {
    val r = q("q477_wordlength_homogeneity")
      .select("n_cells", "chi2").as[(Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0)
  }

  test("q478: richness panel accounts for types <= tokens") {
    val rows = q("q478_richness_panel")
      .select("lang", "tokens", "types", "ttr", "hapax_share")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 > 0 && r._4 <= 1)
      assert(r._5 >= 0 && r._5 <= 1)
    }
  }

  test("q479: Jaccard overlaps are proper fractions on ordered pairs") {
    val rows = q("q479_vocab_jaccard")
      .select("lang_a", "lang_b", "inter", "jaccard")
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._1 < r._2)
      assert(r._4 > 0 && r._4 <= 1,
        s"${r._1}-${r._2} jaccard ${r._4} out of range")
    }
  }

  test("q480: the abbreviation-law correlation is a valid coefficient") {
    val r = q("q480_law_of_abbreviation")
      .select("n_types", "pearson_r").as[(Long, Double)].head()
    assert(r._1 > 10)
    assert(r._2 >= -1.0 - 1e-9 && r._2 <= 1.0 + 1e-9)
  }
}
