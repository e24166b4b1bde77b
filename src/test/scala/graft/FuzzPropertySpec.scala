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

  test("scd2 property: disjoint ordered intervals, one current per live key") {
    val rng = new Random(97)
    // random change streams: keys see 1-6 events at distinct timestamps,
    // each non-initial event is update-or-delete; events after a delete
    // legitimately re-open the key
    val events = (0 until 60).flatMap { key =>
      val n = 1 + rng.nextInt(6)
      val times = Seq.fill(n)(rng.nextInt(1000).toLong).distinct.sorted
      times.zipWithIndex.map { case (ts, i) =>
        val op = if (i == 0) "r" else if (rng.nextInt(4) == 0) "d" else "u"
        (key, ts, op, s"p$key-$i")
      }
    }
    val df = events.toDF("id", "ts", "op", "payload")
    val hist = graft.operators.Versioned
      .scd2History(df, Seq("id"), Seq("ts"), "op")
      .select($"id", $"valid_from", $"valid_to", $"is_current")
      .as[(Int, Long, Option[Long], Boolean)].collect()

    // row count: one interval per non-delete event
    assert(hist.length == events.count(_._3 != "d"))
    hist.groupBy(_._1).foreach { case (key, rows) =>
      val sorted = rows.sortBy(_._2)
      // intervals are disjoint and ordered: each valid_to <= next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.isDefined, s"key $key: non-final interval left open")
          assert(a._3.get <= b._2, s"key $key: overlapping intervals $a $b")
        case _ => ()
      }
      // at most one current row, and only the last interval may be it
      assert(rows.count(_._4) <= 1, s"key $key: multiple current rows")
      rows.filter(_._4).foreach(r => assert(r == sorted.last))
      // current <=> open
      rows.foreach(r => assert(r._4 == r._3.isEmpty, s"key $key: $r"))
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
