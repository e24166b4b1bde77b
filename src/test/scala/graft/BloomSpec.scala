package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{Bloom, BloomBuffer}
import graft.sources.Tables

/** Bloom filter build/probe: no false negatives ever, bounded false
  * positives, OR-merge associativity across real partition merges, the
  * foldable-filter analysis guard, and row-identity of the
  * bloom-prefiltered decontamination path against the exact one. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; observed fpp near the configured bound") {
    val n = 20000
    val present = (0 until n).map(i => s"item_$i")
    val filter = Bloom.buildFilter(
      present.toDF("s").repartition(8), col("s"), n.toLong, fpp = 0.01)

    val presentHits = present.toDF("s")
      .where(Bloom.mightContain(filter, col("s"))).count()
    assert(presentHits == n, "bloom false negative — structurally impossible")

    val absent = (0 until n).map(i => s"other_$i")
    val fpObserved = absent.toDF("s")
      .where(Bloom.mightContain(filter, col("s"))).count()
    // 1% nominal; allow generous slack for hash variance at this n
    assert(fpObserved < n * 0.03,
      s"false-positive rate too high: $fpObserved/$n")
  }

  test("oversized filter request fails loudly, not by silent truncation") {
    val e = intercept[IllegalArgumentException] {
      BloomBuffer.sized(1000000000000L, 0.001)
    }
    assert(e.getMessage.contains("too large"))
  }

  test("merge == build-over-union (bitwise-OR mergeability)") {
    val a = BloomBuffer.sized(1000, 0.01)
    val b = BloomBuffer.sized(1000, 0.01)
    val whole = BloomBuffer.sized(1000, 0.01)
    val h = (s: String) =>
      graft.functions.HashMix.hashString(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (0 until 500).foreach(i => { a.add(h(s"a$i")); whole.add(h(s"a$i")) })
    (0 until 500).foreach(i => { b.add(h(s"b$i")); whole.add(h(s"b$i")) })
    a.mergeFrom(b)
    assert(a.words.toSeq == whole.words.toSeq,
      "merged filter must equal filter built over the union")
  }

  test("SQL surface: build is a real partial agg; probe rejects a non-constant filter") {
    GraftExtensions.register(spark)
    (0 until 100).map(i => s"k$i").toDF("s").repartition(5)
      .createOrReplaceTempView("bloom_in")
    val bytes = spark.sql(
      "SELECT bloom_filter_build(s, 100, 0.01) AS f FROM bloom_in")
      .head().getAs[Array[Byte]]("f")
    val hits = (0 until 100).map(i => s"k$i").toDF("s")
      .where(Bloom.mightContain(bytes, col("s"))).count()
    assert(hits == 100)

    // non-foldable filter operand must fail at analysis, not at runtime
    val twoCol = Seq(("x", Array[Byte](0, 0))).toDF("s", "f")
    twoCol.createOrReplaceTempView("bloom_bad")
    val err = intercept[AnalysisException] {
      spark.sql("SELECT bloom_might_contain(f, s) FROM bloom_bad").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable") ||
      err.getMessage.toLowerCase.contains("constant"))
  }

  test("contaminationBloom rows == contamination rows (any fpp)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val train = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val exact = Dedup.contamination(train, evalSet, shingleK = 3, minOverlap = 2)
    // tiny filter → high fpp: result must STILL be identical, only the
    // candidate fraction changes
    val bloomed = Dedup.contaminationBloom(train, evalSet,
      shingleK = 3, minOverlap = 2, expectedShingles = 256, fpp = 0.5)
    assertSameRows(exact, bloomed)
  }
}
