package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Select

/** Bounded-histogram selection must return EXACT order statistics —
  * verified against brute-force sorts, across domains that exercise
  * one-round (narrow), multi-round (wide) and negative ranges, plus
  * the weighted-crossing contract q135/q308 read medians through. */
class SelectSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("kthLong matches brute force on a narrow domain (single round)") {
    val xs = Seq.fill(501)(rnd.nextInt(1000).toLong - 500L)
    val df = xs.toDF("x")
    val sorted = xs.sorted
    val ks = Seq(1L, 251L, 252L, 501L)
    val got = Select.kthLong(df, col("x"), ks)
    ks.foreach(k => assert(got(k) == sorted((k - 1).toInt), s"k=$k"))
  }

  test("kthLong matches brute force on a 2^40 domain (multi-round)") {
    val xs = Seq.fill(400)((rnd.nextLong() % (1L << 40)).abs - (1L << 39))
    val df = xs.toDF("x")
    val sorted = xs.sorted
    // distant ks keep separate intervals alive simultaneously
    val ks = Seq(1L, 4L, 200L, 201L, 397L, 400L)
    val got = Select.kthLong(df, col("x"), ks, buckets = 1 << 8)
    ks.foreach(k => assert(got(k) == sorted((k - 1).toInt), s"k=$k"))
  }

  test("kthLong handles ties and ks outside [1,n] fails fast") {
    val xs = Seq(5L, 5L, 5L, 1L, 9L)
    val got = Select.kthLong(xs.toDF("x"), col("x"), Seq(2L, 3L, 4L))
    assert(got == Map(2L -> 5L, 3L -> 5L, 4L -> 5L))
    intercept[IllegalArgumentException] {
      Select.kthLong(xs.toDF("x"), col("x"), Seq(6L))
    }
  }

  test("weightedCrossings equals the cw >= tw - cw crossing per group") {
    // decimal weights, grouped; oracle = sort + scan per group
    val rows = for {
      g <- Seq("A", "B", "C")
      _ <- 1 to 200
    } yield (g, rnd.nextInt(100000).toLong,
      BigDecimal(rnd.nextInt(5000) + 1, 2))
    val df = rows.toDF("g", "x", "w")
      .withColumn("w", col("w").cast(DecimalType(12, 2)))
    val got = Select.weightedCrossings(df, Seq(col("g")), col("x"),
      col("x"), col("w"), buckets = 1 << 8)
      .map { case (key, xv, _, _) => key.head.asInstanceOf[String] -> xv }
      .toMap
    val oracle = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val tw = rs.map(_._3).sum
      var cum = BigDecimal(0)
      g -> sorted.find { r => cum += r._3; cum * 2 >= tw }.get._2
    }
    assert(got == oracle)
  }

  test("weightedCrossings carry is the exact-round payload") {
    val df = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("x", "name")
    val Seq((_, xv, carry, tot)) = Select.weightedCrossings(
      df, Seq.empty, col("x"), col("name"), lit(1L))
    assert(xv == 2L && carry == "two" && tot == 3L)
  }
}
