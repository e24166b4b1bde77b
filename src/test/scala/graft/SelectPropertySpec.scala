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
}
