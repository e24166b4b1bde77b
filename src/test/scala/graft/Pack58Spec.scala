package graft

/** Semantic invariants for the q396-q400 series-complexity pack:
  * entropy bounds, turning-point/record accounting against exact null
  * moments, SampEn match-set nesting, and ordinal-pattern coverage. */
class Pack58Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q396: spectral entropy lies in [0, ln(n_freqs)]") {
    val r = q("q396_spectral_entropy")
      .select("n_freqs", "spectral_entropy", "h_normalized")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 29)
    assert(r._2 >= 0 && r._2 <= math.log(29.0) + 1e-6)
    assert(r._3 >= 0 && r._3 <= 1.0 + 1e-6)
    assert(math.abs(r._3 - r._2 / math.log(29.0)) < 1e-4)
  }

  test("q397: turning points are at most n-2 and z is finite") {
    val r = q("q397_turning_points")
      .select("n_days", "turning_points", "z")
      .as[(Long, Long, Double)].head()
    assert(r._1 > 100)
    assert(r._2 >= 0 && r._2 <= r._1 - 2)
    assert(!r._3.isNaN && !r._3.isInfinite)
    // daily revenue is noisy: expect a substantial extrema fraction
    assert(r._2 > r._1 / 4, s"only ${r._2} turning points in ${r._1}")
  }

  test("q398: records are in [1, n] and H_n matches the direct sum") {
    val r = q("q398_record_counts")
      .select("n_months", "records", "expected_records", "z")
      .as[(Long, Long, Double, Double)].head()
    assert(r._2 >= 1 && r._2 <= r._1, "record count outside [1, n]")
    val hn = (1L to r._1).map(k => 1.0 / k).sum
    assert(math.abs(r._3 - hn) < 1e-3,
      s"E[records] ${r._3} != harmonic $hn")
    assert(!r._4.isNaN && !r._4.isInfinite)
  }

  test("q399: m3 matches nest inside m2 matches; SampEn >= 0") {
    val r = q("q399_sample_entropy")
      .select("matches_m2", "matches_m3", "sampen")
      .as[(Long, Long, Double)].head()
    assert(r._1 > 0, "no m=2 template matches at r = sd/5")
    assert(r._2 <= r._1, "m3 match set must nest inside m2")
    assert(r._2 > 0, "SampEn undefined with zero m3 matches")
    assert(r._3 >= -1e-9, s"SampEn ${r._3} negative")
  }

  test("q400: ordinal patterns cover the windows; H inside [0, ln 6]") {
    val r = q("q400_permutation_entropy")
      .select("n_windows", "n_patterns", "h_nats", "h_normalized")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 1 && r._2 <= 6)
    assert(r._3 >= 0 && r._3 <= math.log(6.0) + 1e-6)
    assert(r._4 >= 0 && r._4 <= 1.0 + 1e-6)
  }
}
