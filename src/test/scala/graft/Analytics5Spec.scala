package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphRank, GroupOls, RankFusion, Skyline}

/** Unit semantics for the fifth analytics pack (q124–q128). The
  * DuckDB oracle gates end-to-end parity; these pin the operator
  * semantics on crafted inputs. */
class Analytics5Spec extends SparkSpec {

  test("rrf: fuses ranks across lists, missing entries contribute 0") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val got = RankFusion.rrf(Seq(a, b), k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(10L) == 1.0 / 61 + 1.0 / 62)
    assert(got(20L) == 1.0 / 62 + 1.0 / 61)
    assert(got(30L) == 1.0 / 63) // only in list a
    assert(got(40L) == 1.0 / 63) // only in list b
    // 10 and 20 tie exactly (same rank multiset) — two-operand double
    // addition is commutative, the operator's order-safety claim
    assert(got(10L) == got(20L))
  }

  test("skyline: dominance semantics incl. duplicates and same-x ties") {
    import spark.implicits._
    // minimize x, maximize y
    val rows = Seq(
      (1L, 1.0, 5), // frontier (cheapest, best y at x=1)
      (2L, 1.0, 3), // dominated: same x, smaller y
      (3L, 2.0, 7), // frontier (y 7 > rmax 5)
      (4L, 2.0, 7), // duplicate point — survives with 3
      (5L, 3.0, 7), // dominated: 3/7 loses to 2/7 on price (strict)
      (6L, 4.0, 9), // frontier
      (7L, 5.0, 8)  // dominated by (4.0, 9)
    ).toDF("id", "x", "y")
    val got = Skyline.pareto2d(rows, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 4L, 6L))
  }

  test("khop: frontier expansion matches hand-computed reach on a path") {
    import spark.implicits._
    // path graph 1-2-3-4-5-6 (undirected), seeds 1 and 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("seed")
    val got = GraphRank.kHopReach(edges, seeds, hops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // from 1: {2,3,4}; from 3: {1,2,4,5,6} (6 at distance 3)
    assert(got == Map(1L -> 3L, 3L -> 5L))
  }

  test("khop: reach never double-counts re-reached nodes") {
    import spark.implicits._
    // triangle 1-2-3: from seed 1 every node is re-reached each hop
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = GraphRank.kHopReach(edges, Seq(1L).toDF("seed"), hops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L))
  }

  test("ols: exact fit recovered, per group, order-independently") {
    import spark.implicits._
    // group a: y = 2x + 1 exactly; group b: y = -0.5x + 10 exactly
    val rows = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 4.0, 9.0),
      ("b", 2.0, 9.0), ("b", 6.0, 7.0), ("b", 10.0, 5.0), ("b", 0.0, 10.0))
    val got = GroupOls.fit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got("a") == ((3L, 2.0, 1.0)))
    assert(got("b") == ((4L, -0.5, 10.0)))
    // permutation invariance: decimal accumulation is order-free
    val shuffled = GroupOls.fit(rows.reverse.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(shuffled == got)
  }

  test("interpolate: linear fill between neighbors, edges stay null") {
    import spark.implicits._
    val rows = Seq(
      ("a", 0L, Some(10.0)), ("a", 10L, None), ("a", 20L, None),
      ("a", 30L, Some(40.0)), ("a", 40L, None),
      ("b", 0L, None), ("b", 10L, Some(5.0)))
    val df = rows.toDF("g", "t", "v")
    val got = graft.operators.GapFill.interpolate(df, Seq("g"), "t", "v")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("a", 10L)) == Some(20.0)) // 10 + (40-10) * 1/3
    assert(got(("a", 20L)) == Some(30.0))
    assert(got(("a", 0L)) == Some(10.0))  // observed passes through
    assert(got(("a", 40L)) == None)       // no right neighbor
    assert(got(("b", 0L)) == None)        // no left neighbor
    assert(got(("b", 10L)) == Some(5.0))
  }

  test("phrase search: overlapping starts count, cross-doc isolation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x a a a y"),     // "a a" at positions 1 and 2 → 2
      (2L, "a b a b a"),     // "a b" twice, "b a" twice
      (3L, "a"),             // too short
      (4L, "b a")            // phrase reversed only
    ).toDF("doc_id", "text")
    val aa = graft.text.Relevance.phraseSearch(docs, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(aa == Map(1L -> 2L))
    val ab = graft.text.Relevance.phraseSearch(docs, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ab == Map(2L -> 2L))
    val aba = graft.text.Relevance.phraseSearch(docs, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(aba == Map(2L -> 2L)) // overlapping at positions 0 and 2
  }

  test("lpa: two dense clusters converge to their min labels") {
    import spark.implicits._
    // triangles {1,2,3} and {10,11,12} bridged by 3-10
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val edges = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = graft.operators.GraphRank.labelPropagation(edges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hand-traced sync rounds: cluster one settles on 1; the bridge
    // leaks label 3 into cluster two, which settles on it — two clean
    // communities with deterministic (if non-obvious) labels
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("weighted median: crossing point respects exact weights") {
    import spark.implicits._
    // weights 1,1,10 on prices 10,20,30 → median 30 (10 of 12 mass);
    // weights 3,3 on prices 5,6 → first crossing at 5 (cw=3 >= tw-cw=3)
    val rows = Seq(
      ("A", 10.0, 1L, 1, 1.0), ("A", 20.0, 2L, 1, 1.0), ("A", 30.0, 3L, 1, 10.0),
      ("B", 5.0, 4L, 1, 3.0), ("B", 6.0, 5L, 1, 3.0))
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber",
        "l_quantity")
    rows.createOrReplaceTempView("wm_rows")
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Long.MinValue, 0)
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))
    val got = rows
      .select(col("l_returnflag").as("flag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(12,2)").as("w"))
      .withColumn("cw", sum(col("w")).over(w1))
      .withColumn("tw", sum(col("w")).over(w2))
      .where(col("cw") >= col("tw") - col("cw"))
      .groupBy(col("flag")).agg(min(col("l_extendedprice")).as("m"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("A" -> 30.0, "B" -> 5.0))
  }

  test("ols: zero x-variance group yields null slope, not a crash") {
    import spark.implicits._
    val rows = Seq(("c", 5.0, 1.0), ("c", 5.0, 2.0))
    val r = GroupOls.fit(rows.toDF("g", "x", "y"), "g", "x", "y").collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }
}
