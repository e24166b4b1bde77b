package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** Dedup differential tests: the exact inverted-index Jaccard pass is
  * the oracle for the MinHash/SimHash approximations. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("minhash pairs are exact: every reported pair really has jaccard >= threshold") {
    // minhashPairs verifies candidates with exact Jaccard, so its output
    // must be a subset of the exhaustive exact pass at the same threshold
    val mh = Dedup.minhashPairs(docs, threshold = 0.6)
      .select("id_a", "id_b")
    val exact = Dedup.jaccardPairs(docs, threshold = 0.6)
      .select("id_a", "id_b")
    assert(mh.exceptAll(exact).count() == 0, "minhash reported a false pair")
  }

  test("minhash recall: all very-high-jaccard pairs are found") {
    val mh = Dedup.minhashPairs(docs, threshold = 0.6).select("id_a", "id_b")
    val high = Dedup.jaccardPairs(docs, threshold = 0.9).select("id_a", "id_b")
    val missed = high.exceptAll(mh).count()
    val total = high.count()
    assert(total > 0, "fixture should contain near-identical pairs")
    assert(missed == 0, s"missed $missed/$total pairs with jaccard>=0.9")
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text")
    val sigs = df.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 12)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 12)
  }

  test("expression shingles == HOF shingles") {
    val diff = docs.limit(200).select(
      Dedup.shingles($"text", 3).as("a"), Dedup.shinglesHof($"text", 3).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("expression minhash == HOF minhash (identical coefficients)") {
    val sh = docs.limit(100).select(Dedup.shingles($"text", 3).as("sh"))
      .where(size($"sh") > 0)
    val diff = sh.select(
      Dedup.minhashSignature($"sh", 64).as("a"),
      Dedup.minhashSignatureHof($"sh", 64).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("expression simhash == HOF simhash") {
    val diff = docs.limit(100).select(
      Dedup.simhash64($"text").as("a"), Dedup.simhash64Hof($"text").as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("exactDedup keeps one representative per text") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(df)
    assert(out.count() == 3)
    assert(out.select("doc_id").as[Long].collect().sorted.sameElements(Array(1L, 2L, 4L)))
  }

  test("shingles handle short documents (no descending-sequence bug)") {
    val df = Seq((1L, "one two"), (2L, "a"), (3L, "x y z w")).toDF("doc_id", "text")
    val out = df.select($"doc_id", size(Dedup.shingles($"text", 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 2))
  }
}
