package graft

import org.apache.spark.sql.functions._

import graft.operators.{Constraints, SkewJoin}

/** F4 (CHECK constraints), F5 (ON CONFLICT DO NOTHING), and manual
  * skew-salting semantics. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("check splits valid/rejected with violation labels (F4 + U6 channel)") {
    val df = Seq((1, 5, 10.0), (2, 0, 5.0), (3, 2, -1.0), (4, -1, -2.0))
      .toDF("id", "quantity", "unit_price")
    val (valid, rejected) = Constraints.check(df, Map(
      "quantity_positive" -> ($"quantity" > 0),
      "price_nonnegative" -> ($"unit_price" >= 0)))
    assert(valid.select("id").as[Int].collect().sorted.sameElements(Array(1)))
    val rej = rejected.select($"id", $"__violations")
      .as[(Int, Seq[String])].collect().toMap
    assert(rej(2) == Seq("quantity_positive"))
    assert(rej(3) == Seq("price_nonnegative"))
    assert(rej(4).toSet == Set("quantity_positive", "price_nonnegative"))
  }

  test("insertIfAbsent keeps existing rows on key conflict (F5)") {
    val existing = Seq((1, "old"), (2, "old")).toDF("id", "v")
    val batch = Seq((2, "new"), (3, "new"), (3, "new2")).toDF("id", "v")
    val inserted = Constraints.insertIfAbsent(existing, batch, Seq("id"))
    // id=2 conflicts → dropped; id=3 deduped within batch → one row
    assert(inserted.count() == 1)
    assert(inserted.select("id").as[Int].head() == 3)
  }

  test("binned range join == naive nested-loop range join") {
    import graft.operators.RangeJoin
    val facts = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val ranges = Seq(("a", 0.0, 123456.0), ("b", 123456.0, 250000.0),
      ("c", 250000.0, 600000.0), ("overlap", 100000.0, 300000.0))
      .toDF("tier", "lo", "hi")
    val binned = RangeJoin.binnedRangeJoin(facts, ranges,
      "o_totalprice", "lo", "hi", binWidth = 40000.0)
      .select("o_orderkey", "tier")
    val naive = RangeJoin.naiveRangeJoin(facts, ranges,
      "o_totalprice", "lo", "hi")
      .select("o_orderkey", "tier")
    assertSameRows(binned, naive)
    assert(binned.count() > facts.count())  // overlap band duplicates
  }

  test("binned range join: left outer null-extends unmatched facts") {
    import graft.operators.RangeJoin
    val facts = Seq((1, 50.0), (2, 150.0), (3, 9999.0)).toDF("fid", "v")
    val ranges = Seq(("a", 0.0, 100.0), ("b", 100.0, 200.0))
      .toDF("tier", "lo", "hi")
    val out = RangeJoin.binnedRangeJoin(facts, ranges, "v", "lo", "hi",
      binWidth = 30.0, joinType = "left")
    // every fact appears exactly once; 9999.0 matches nothing → null tier
    assert(out.count() == 3)
    assert(out.where($"fid" === 3).select("tier").collect().head.isNullAt(0))
    // a candidate sharing the bin but failing BETWEEN must ALSO
    // null-extend, not drop the fact row (the post-join .where() bug):
    // bin 3 = [90,120) holds both v=95 and range [100,110) — no match.
    val f2 = Seq((10, 95.0)).toDF("fid", "v")
    val r2 = Seq(("x", 100.0, 110.0)).toDF("tier", "lo", "hi")
    val o2 = RangeJoin.binnedRangeJoin(f2, r2, "v", "lo", "hi", 30.0, "left")
    assert(o2.count() == 1 && o2.select("tier").collect().head.isNullAt(0))
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(facts, ranges, "v", "lo", "hi", 30.0, "full_outer")
    }
  }

  test("interval overlap join == naive overlap, exactly once per pair") {
    import graft.operators.RangeJoin
    val rng = new scala.util.Random(11)
    // random intervals spanning 0-6 grid cells at binWidth=10, so many
    // pairs share several cells — the emit-once rule is what's on trial
    val a = (0 until 300).map { i =>
      val lo = rng.nextInt(200).toLong; (i.toLong, lo, lo + rng.nextInt(60))
    }.toDF("aid", "a_lo", "a_hi")
    val b = (0 until 80).map { i =>
      val lo = rng.nextInt(200).toLong; (i.toLong, lo, lo + rng.nextInt(60))
    }.toDF("bid", "b_lo", "b_hi")
    val grid = RangeJoin.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10.0)
      .select("aid", "bid")
    val naive = a.crossJoin(b)
      .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("aid", "bid")
    assertSameRows(grid, naive)
    // no duplicates: every surviving pair appears exactly once
    assert(grid.count() == grid.distinct().count())
    assert(grid.count() > 0)
  }

  test("salted join == plain join (skew-spread correctness)") {
    // heavily skewed fact: 90% of rows share one key
    val fact = spark.range(0, 2000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN CAST(1 AS BIGINT) ELSE id END AS k",
      "id AS payload")
    val dim = Seq((1L, "hot"), (7L, "cold"), (13L, "cold2"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salt = 8)
    assertSameRows(plain, salted)
  }

  test("salted join: left outer, key-only fact, and outer-type guard") {
    val fact = spark.range(0, 100).selectExpr(
      "CASE WHEN id % 2 = 0 THEN CAST(1 AS BIGINT) ELSE id END AS k")
    val dim = Seq((1L, "hot")).toDF("k", "label")
    // key-only fact (no non-key columns to hash) must still analyze
    val out = SkewJoin.saltedJoin(fact, dim, "k", salt = 4, joinType = "left")
    assert(out.count() == 100)                       // no fact row lost/duplicated
    assert(out.where($"label".isNull).count() == 49) // odd ids (except 1) unmatched
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", salt = 4, joinType = "right")
    }
  }
}
