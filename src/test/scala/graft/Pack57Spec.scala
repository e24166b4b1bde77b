package graft

/** Semantic invariants for the q391-q395 embedding-compression pack:
  * quantization fidelity bounds, truncation correlation sanity, JL
  * distortion brackets, the Hamming↔cosine monotone agreement, and
  * hubness in-degree accounting. */
class Pack57Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q391: int8 reconstruction is faithful (cos ~ 1, small MSE)") {
    val r = q("q391_int8_quantization")
      .select("n_vecs", "mean_mse", "mean_self_cos")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 500)
    assert(r._2 >= 0)
    // 8-bit absmax quantization keeps vectors essentially collinear
    assert(r._3 > 0.999 && r._3 <= 1.0 + 1e-9,
      s"self-cosine ${r._3} implausible for int8")
  }

  test("q392: truncation correlation is in (0, 1] with a real gap") {
    val r = q("q392_dim_truncation")
      .select("n_pairs", "pearson_r", "mean_abs_gap")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 100L * 99 / 2)
    assert(r._2 > 0 && r._2 <= 1.0 + 1e-9,
      s"full-vs-16-dim cosine correlation ${r._2} not positive")
    assert(r._3 >= 0)
  }

  test("q393: JL distortion ratios bracket 1 and stay finite") {
    val r = q("q393_jl_projection")
      .select("n_pairs", "mean_ratio", "min_ratio", "max_ratio")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._3 <= r._2 && r._2 <= r._4, "min <= mean <= max violated")
    assert(r._3 > 0, s"min ratio ${r._3} not positive")
    // +/-1 projections concentrate around 1; mean inside [0.5, 2]
    assert(r._2 > 0.5 && r._2 < 2.0, s"mean distortion ${r._2} off")
  }

  test("q394: Hamming fraction tracks cosine dissimilarity") {
    val r = q("q394_sign_binarization")
      .select("n_pairs", "mean_hamming", "mean_dissim", "pearson_r")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 100L * 99 / 2)
    assert(r._2 >= 0 && r._2 <= 1)
    assert(r._3 >= 0 && r._3 <= 1)
    // sign sketches preserve angular order: strong positive coupling
    assert(r._4 > 0.3, s"Hamming-cosine correlation ${r._4} too weak")
  }

  test("q395: hubness votes account for 200 probes x 5 neighbors") {
    val r = q("q395_knn_hubness")
      .select("n_vecs", "max_indegree", "n_zero", "indegree_skewness")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == 500)
    assert(r._2 >= 1 && r._2 <= 1000)
    // total votes = 1000 spread over 500 vectors; zeros must leave
    // enough mass on the rest: nonzero count >= 1000 / max_indegree
    assert(r._1 - r._3 >= 1000 / math.max(1, r._2))
    assert(!r._4.isNaN && !r._4.isInfinite)
  }
}
