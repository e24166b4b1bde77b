package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bitmap, BitmapBuf}
import graft.sources.Tables

/** Dense-bitmap exact distinct: equality with COUNT(DISTINCT) across
  * partitionings, serde word-trim round-trip, and the fail-loud
  * out-of-domain contract. */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap_distinct == count distinct, invariant under partitioning") {
    val o = Tables.load(spark, sfDir, "orders")
    val expected = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("d"))
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 7)) {
      val got = o.repartition(parts)
        .groupBy("o_orderstatus")
        .agg(Bitmap.distinctCount(col("o_custkey"), 1 << 15).as("d"))
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"diverged at $parts partitions")
    }
  }

  test("serde trims trailing zero words and round-trips") {
    val b = new BitmapBuf(1 << 12)
    Seq(0L, 1L, 63L, 64L, 100L).foreach(b.add)
    val bytes = BitmapBuf.serialize(b)
    // 4096 bits = 64 words, but only the first 2 words are non-zero:
    // header (8) + 2 * 8 bytes
    assert(bytes.length == 8 + 2 * 8, s"expected trimmed serde, got ${bytes.length}B")
    val back = BitmapBuf.deserialize(bytes)
    assert(back.maxBits == b.maxBits)
    assert(back.cardinality == 5L)
    assert(back.words.toSeq == b.words.toSeq)
  }

  test("merge ORs words; duplicate adds are idempotent") {
    val a = new BitmapBuf(256); val b = new BitmapBuf(256)
    Seq(1L, 2L, 200L).foreach(a.add)
    Seq(2L, 3L).foreach(b.add)
    b.add(3L) // idempotent re-add
    assert(a.mergeFrom(b).cardinality == 4L)
    intercept[IllegalArgumentException](a.mergeFrom(new BitmapBuf(512)))
  }

  test("out-of-domain value fails loudly, nulls are skipped") {
    val ex = intercept[Exception] {
      Seq(1L, 99L).toDF("v")
        .agg(Bitmap.distinctCount(col("v"), 16)).collect()
    }
    assert(ex.getMessage.contains("bitmap_distinct") ||
      ex.getCause != null && ex.getCause.getMessage.contains("bitmap_distinct"))
    val withNulls = Seq[java.lang.Long](1L, null, 3L).toDF("v")
      .agg(Bitmap.distinctCount(col("v"), 16).as("d"))
      .as[Long].head()
    assert(withNulls == 2L)
  }
}
