package graft

import org.apache.spark.sql.functions._

import graft.functions.{ThetaBuf, ThetaSketch}

/** Theta sketch: exactness below capacity, the sampling estimator's
  * error bound above it, set-operation estimates (intersect / a-not-b
  * / union — the ops HLL cannot do), union-merge associativity across
  * real partition merges, and the SQL surface. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hash(s: String): Long =
    graft.functions.HashMix.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("exact below capacity; within rse bound above it") {
    val small = new ThetaBuf(1024)
    (1 to 1000).foreach(i => small.add(hash(s"v$i")))
    assert(small.estimate == 1000.0, "below k the sketch is exact")

    val big = new ThetaBuf(1024)
    (1 to 200000).foreach(i => big.add(hash(s"v$i")))
    // rse ~ 1/sqrt(k-2) ≈ 3.1%; allow 4 sigma
    assert(math.abs(big.estimate - 200000) < 200000 * 0.125,
      s"estimate ${big.estimate} too far from 200000")
  }

  test("set operations: intersect / a-not-b / union against known overlap") {
    val k = 4096
    val a = new ThetaBuf(k); val b = new ThetaBuf(k)
    // |A|=60k, |B|=50k, |A∩B|=20k
    (1 to 60000).foreach(i => a.add(hash(s"x$i")))
    (40001 to 90000).foreach(i => b.add(hash(s"x$i")))
    val inter = ThetaBuf.setOpEstimate(a, b, 0)
    val aNotB = ThetaBuf.setOpEstimate(a, b, 1)
    val union = ThetaBuf.setOpEstimate(a, b, 2)
    assert(math.abs(inter - 20000) < 20000 * 0.20, s"∩ est $inter")
    assert(math.abs(aNotB - 40000) < 40000 * 0.15, s"∖ est $aNotB")
    assert(math.abs(union - 90000) < 90000 * 0.10, s"∪ est $union")
    // consistency: |A∩B| + |A∖B| ≈ |A| (same θ, same samples — exact)
    assert(math.abs((inter + aNotB) - ThetaBuf.setOpEstimate(a, a, 0)) <
      ThetaBuf.setOpEstimate(a, a, 0) * 0.02)
  }

  test("merge across partitions == single-pass build; sampled and not") {
    for ((n, k) <- Seq((500, 1024), (50000, 512))) {
      val whole = new ThetaBuf(k)
      (1 to n).foreach(i => whole.add(hash(s"m$i")))
      val parts = (0 until 7).map { p =>
        val buf = new ThetaBuf(k)
        (1 to n).filter(_ % 7 == p).foreach(i => buf.add(hash(s"m$i")))
        buf
      }
      val merged = parts.reduce((x, y) => x.mergeFrom(y))
      assert(merged.samples == whole.samples && merged.theta == whole.theta,
        s"n=$n k=$k: union-merge must equal single-pass build")
    }
  }

  test("SQL + DataFrame surface: per-group sketches, cross-group set ops") {
    GraftExtensions.register(spark)
    val df = (1 to 3000).map(i => (if (i <= 2000) "g1" else "g2", s"u${i % 2500}"))
      .toDF("g", "u").repartition(6)
    df.createOrReplaceTempView("theta_in")
    val sk = spark.sql(
      """SELECT g, theta_sketch_agg(u) AS sk,
        |       CAST(COUNT(DISTINCT u) AS DOUBLE) AS nd
        |FROM theta_in GROUP BY g""".stripMargin)
    sk.createOrReplaceTempView("theta_sk")
    val row = spark.sql(
      """SELECT theta_intersect(a.sk, b.sk) AS both,
        |       theta_estimate(a.sk) AS na, theta_a_not_b(a.sk, b.sk) AS only_a
        |FROM theta_sk a JOIN theta_sk b ON a.g = 'g1' AND b.g = 'g2'"""
        .stripMargin).head()
    // below capacity: everything exact. g1 = u1..u2000 (2000 distinct);
    // g2 = u2001..u2499, u0..u500 → overlap = u1..u500 (500)
    assert(row.getDouble(0) == 500.0, s"intersect ${row.getDouble(0)}")
    assert(row.getDouble(1) == 2000.0)
    assert(row.getDouble(2) == 1500.0)

    // re-aggregation over sketch bytes only
    val total = sk.agg(
      ThetaSketch.estimate(ThetaSketch.union(col("sk"))).as("n")).head()
    assert(total.getDouble(0) == 2500.0, s"union-estimate ${total.getDouble(0)}")
  }
}
