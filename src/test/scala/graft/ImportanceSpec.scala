package graft

import org.apache.spark.sql.functions._

import graft.text.Importance

/** DSIR importance-weighting semantics: sign separation between target
  * and off-target vocabulary, and the acceptance-test contract of the
  * resampling step. Exact-value parity vs DuckDB is the q98/q99 oracle;
  * these pin the behavior the numbers are supposed to encode. */
class ImportanceSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    // disjoint sublanguage vocabularies so every bigram is unambiguous
    val target = (0L until 20L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta", "en"))
    val off = (100L until 120L).map(i =>
      (i, "uno dos tres cuatro cinco seis siete ocho", "es"))
    (target ++ off).toDF("doc_id", "text", "lang")
  }

  test("target vocabulary scores positive, off-target negative") {
    val w = Importance.importanceWeights(corpus(), col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 40)
    (0L until 20L).foreach(i => assert(w(i) > 0, s"doc $i: ${w(i)}"))
    (100L until 120L).foreach(i => assert(w(i) < 0, s"doc $i: ${w(i)}"))
  }

  test("resampling keeps every target-like doc and gates off-target by p") {
    val r = Importance.resampleByWeight(corpus(), col("lang") === "en")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    r.foreach { case (id, p, kept) =>
      if (id < 20) { // logratio > 0 → p capped at exactly 10^6 → always kept
        assert(p == 1000000L && kept, s"doc $id p=$p kept=$kept")
      } else {
        assert(p < 1000000L, s"off-target doc $id should have p < 1e6")
        // kept must equal the deterministic acceptance test — rerun it
        val u = graft.text.Corpus.hashBucket(lit(id), 1000000)
        val got = spark.range(1).select(u.as("u")).head().getLong(0)
        assert(kept == (got < p), s"doc $id: u=$got p=$p kept=$kept")
      }
    }
  }
}
