package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Select

/** Randomized (fixed-seed, deterministic) property hammering of the
  * selection operator: whatever the domain shape — clustered, extreme
  * 64-bit spreads, heavy ties, tiny n — kthLong must equal the sorted
  * sequence and weightedCrossings must equal the cumulative-weight
  * crossing scan, at several bucket widths including pathologically
  * small ones (which force the maximum refinement depth). */
class SelectPropertySpec extends SparkSpec {
  import spark.implicits._

  private def domains(rng: Random): Seq[Seq[Long]] = Seq(
    // clustered small-range with heavy ties
    Seq.fill(300)(rng.nextInt(20).toLong),
    // money-cents-like grid
    Seq.fill(400)((rng.nextInt(10000000) + 100).toLong),
    // extreme 64-bit spread incl. Long.Min/Max neighborhoods
    Seq.fill(200)(rng.nextLong()) ++
      Seq(Long.MinValue + 2, Long.MaxValue - 2, 0L),
    // single value, and n = 1
    Seq.fill(50)(42L),
    Seq(-7L)
  )

  test("kthLong equals the sorted sequence across domains and bucket sizes") {
    val rng = new Random(20260815L)
    for {
      xs <- domains(rng)
      buckets <- Seq(1 << 3, 1 << 13)
    } {
      val sorted = xs.sorted
      val n = xs.size.toLong
      val ks = Seq(1L, n, (n + 1) / 2, (n + 2) / 2,
        1L + rng.nextInt(n.toInt).toLong).distinct
      val got = Select.kthLong(xs.toDF("x"), col("x"), ks,
        buckets = buckets)
      ks.foreach { k =>
        assert(got(k) == sorted((k - 1).toInt),
          s"k=$k buckets=$buckets n=$n: got ${got(k)}, " +
            s"want ${sorted((k - 1).toInt)}")
      }
    }
  }

  test("weightedCrossings equals the cumulative scan across domains") {
    val rng = new Random(77L)
    for (buckets <- Seq(1 << 4, 1 << 13)) {
      val rows = for {
        g <- Seq("a", "b")
        _ <- 1 to 250
      } yield (g, rng.nextLong() % 1000000L,
        BigDecimal(rng.nextInt(999) + 1, 2))
      val df = rows.toDF("g", "x", "w")
        .withColumn("w", col("w").cast(DecimalType(10, 2)))
      val got = Select.weightedCrossings(df, Seq(col("g")), col("x"),
          col("x"), col("w"), buckets = buckets)
        .map { case (key, xv, _, _) => key.head.asInstanceOf[String] -> xv }
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tw = rs.map(_._3).sum
        var cum = BigDecimal(0)
        g -> rs.sortBy(_._2).find { r => cum += r._3; cum * 2 >= tw }.get._2
      }
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("domain hint is efficiency-only: out-of-hint values still count") {
    val xs = Seq(-500000L, -100L, 0L, 3L, 3L, 9L, 700000L, 900000000L)
    // hint covers only [0, 15] — most values live outside it
    val got = Select.weightedCrossings(xs.toDF("x"), Seq.empty, col("x"),
      col("x"), lit(1L), buckets = 1 << 3, domainHint = Some((0L, 15L)))
    assert(got.map(_._2) == Seq(3L)) // 4th of 8 values in sorted order
    // and the quantile form with an equally wrong hint
    val q = Select.weightedQuantilesLong(xs.toDF("x"), col("x"), lit(1L),
      Seq((1L, 2L), (1L, 1L)), domainHint = (0L, 15L), buckets = 1 << 3)
    assert(q((1L, 2L)) == 3L && q((1L, 1L)) == 900000000L)
  }

  test("exact-width hint exceeded refines instead of breaking its bound") {
    // the q308 shape: hint exactly exactW wide (4·buckets), so round 0
    // takes the exact in-hint path — a peak ABOVE the hint must land on
    // the side-tagged global grid and refine, not blow the collect bound
    val b = 1 << 3 // exactW = 32
    val xs = (0L until 32L) ++ Seq(1000000L, 5000000L, Long.MaxValue - 5)
    val q = Select.weightedQuantilesLong(xs.toDF("x"), col("x"), lit(1L),
      Seq((1L, 2L), (1L, 1L)), domainHint = (0L, 31L), buckets = b)
    val sorted = xs.sorted
    val n = sorted.size // 35; 1/2-crossing = 18th value = sorted(17)
    assert(q((1L, 2L)) == sorted((n + 1) / 2 - 1))
    assert(q((1L, 1L)) == Long.MaxValue - 5)
    // below-hint side too (negative values on the global coarse grid)
    val ys = Seq(Long.MinValue + 3, -900000L, -5L) ++ (0L until 32L)
    val q2 = Select.weightedQuantilesLong(ys.toDF("x"), col("x"), lit(1L),
      Seq((1L, 35L), (1L, 1L)), domainHint = (0L, 31L), buckets = b)
    assert(q2((1L, 35L)) == Long.MinValue + 3 && q2((1L, 1L)) == 31L)
  }

  test("weightedQuantilesLong on empty input returns the empty map") {
    val q = Select.weightedQuantilesLong(
      Seq.empty[Long].toDF("x"), col("x"), lit(1L),
      Seq((1L, 2L), (0L, 1L), (1L, 1L)), domainHint = (0L, 100L),
      buckets = 1 << 3)
    assert(q.isEmpty)
  }

  test("weightedCrossings rejects float weights loudly") {
    val df = Seq((1L, 0.5), (2L, 0.5)).toDF("x", "w")
    val e = intercept[Exception] {
      Select.weightedCrossings(df, Seq.empty, col("x"), col("x"), col("w"))
    }
    assert(e.getMessage.contains("non-exact weight type"))
  }
}
