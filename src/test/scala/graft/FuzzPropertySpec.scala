package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup
import graft.functions.DeletionHashes

/** Randomized property tests (fixed seeds — deterministic) for the
  * FastSS completeness claim: strings within edit distance d ALWAYS
  * share a ≤d-deletion variant, so the blocked fuzzy join can never
  * lose a true pair. The kernel-level pass hammers thousands of random
  * edit pairs without Spark overhead; one Spark-level pass plants pairs
  * through the full fuzzyPairs pipeline. */
class FuzzPropertySpec extends SparkSpec {
  import spark.implicits._

  private val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "

  private def randomString(rng: Random, lo: Int = 5, hi: Int = 25): String =
    Seq.fill(lo + rng.nextInt(hi - lo + 1))(
      alphabet(rng.nextInt(alphabet.length))).mkString

  /** Apply exactly `k` random single-character edits. */
  private def edit(rng: Random, s: String, k: Int): String = {
    var cur = s
    (1 to k).foreach { _ =>
      val op = rng.nextInt(3)
      if (op == 0 && cur.nonEmpty) {            // delete
        val i = rng.nextInt(cur.length)
        cur = cur.substring(0, i) + cur.substring(i + 1)
      } else if (op == 1) {                     // insert
        val i = rng.nextInt(cur.length + 1)
        cur = cur.substring(0, i) + alphabet(rng.nextInt(alphabet.length)) +
          cur.substring(i)
      } else if (cur.nonEmpty) {                // substitute
        val i = rng.nextInt(cur.length)
        cur = cur.substring(0, i) + alphabet(rng.nextInt(alphabet.length)) +
          cur.substring(i + 1)
      }
    }
    cur
  }

  private def hashes(expr: DeletionHashes, s: String): Set[Long] = {
    val arr = expr.compute(UTF8String.fromString(s)).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  test("kernel property: d edits always leave a shared deletion variant") {
    (1 to 2).foreach { d =>
      val expr = DeletionHashes(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), d)
      val rng = new Random(4242 + d)
      (1 to 2000).foreach { i =>
        val s = randomString(rng)
        val t = edit(rng, s, rng.nextInt(d) + 1)  // 1..d edits
        val shared = hashes(expr, s).intersect(hashes(expr, t))
        assert(shared.nonEmpty,
          s"case $i (d=$d): no shared variant for '$s' vs '$t'")
      }
    }
  }

  test("pipeline property: planted edit pairs all survive the blocked join") {
    val rng = new Random(99)
    val n = 200
    val rows = (0 until n).flatMap { i =>
      val s = randomString(rng)
      val t = edit(rng, s, rng.nextInt(2) + 1)   // 1..2 edits
      Seq((2L * i, s), (2L * i + 1, t))
    }
    val df = rows.toDF("id", "name")
    val found = Dedup.fuzzyPairs(df, maxDist = 2)
      .where($"id_b" === $"id_a" + 1 && $"id_a" % 2 === 0)
      .count()
    assert(found == n, s"only $found/$n planted pairs survived blocking")
  }
}
