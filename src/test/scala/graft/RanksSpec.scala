package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ranks

/** Ranks = the distributed replacement for unpartitioned windows.
  * Every helper is pinned EXACTLY against the single-partition window
  * form it replaces — same rows, same values — on data that exercises
  * partition boundaries (many range partitions, duplicate sort values
  * with tiebreakers, skewed groups, n not divisible by k). */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables()

  private def Tables() =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))

  test("withGlobalRank == row_number over the same total order") {
    val viaWindow = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
    val viaRanks = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")),
      "rn", parts = 7)
    assertSameRows(viaWindow, viaRanks)
  }

  test("withGlobalRank is exact with heavy duplicate sort values") {
    // 1000 rows, only 3 distinct primary sort values → partitions
    // must cut inside runs of equal keys; the tiebreaker keeps the
    // total order unique
    val df = (1 to 1000).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "g")
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(col("g"), col("id"))).cast("long"))
    val viaRanks = Ranks.withGlobalRank(df, Seq(col("g"), col("id")),
      "rn", parts = 16)
    assertSameRows(viaWindow, viaRanks)
  }

  test("ntileFromRank == NTILE(k) including uneven buckets") {
    for (k <- Seq(3, 4, 10, 7)) {
      val viaWindow = orders.withColumn("bin",
        ntile(k).over(Window.orderBy(col("v"), col("k"))))
      val n = orders.count()
      val viaRanks = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")),
          "rn", parts = 5)
        .withColumn("bin", Ranks.ntileFromRank(col("rn"), lit(n), k))
        .drop("rn")
      assertSameRows(viaWindow, viaRanks)
    }
  }

  test("ntileFromRank handles n < k (bucket per row)") {
    val df = (1 to 3).map(_.toLong).toDF("id")
    val got = Ranks.withGlobalRank(df, Seq(col("id")), "rn", parts = 2)
      .withColumn("bin", Ranks.ntileFromRank(col("rn"), lit(3L), 10))
      .select("id", "bin").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("withPrefixSum == grouped running SUM + group total (decimal)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"),
        col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
        col("l_quantity").cast(DecimalType(12, 2)).as("w"))
    val wcum = Window.partitionBy(col("g"))
      .orderBy(col("v"), col("k1"), col("k2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(col("g"))
    val viaWindow = li
      .withColumn("cw", sum(col("w")).over(wcum).cast(DecimalType(38, 2)))
      .withColumn("tw", sum(col("w")).over(wall).cast(DecimalType(38, 2)))
    val viaRanks = Ranks.withPrefixSum(li, Seq(col("g")),
        Seq(col("v"), col("k1"), col("k2")), col("w"), "cw", "tw", parts = 9)
      .withColumn("cw", col("cw").cast(DecimalType(38, 2)))
      .withColumn("tw", col("tw").cast(DecimalType(38, 2)))
    assertSameRows(viaWindow, viaRanks)
  }

  test("withPrefixSum global form (no groups) == running sum") {
    val df = (1 to 500).map(i => (i.toLong, (i % 11 + 1).toLong)).toDF("id", "w")
    val wcum = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df
      .withColumn("cw", sum(col("w")).over(wcum))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy()))
    val viaRanks = Ranks.withPrefixSum(df, Seq.empty, Seq(col("id")),
      col("w"), "cw", "tw", parts = 8)
    assertSameRows(viaWindow, viaRanks)
  }

  test("withPrefixSum global form: DECIMAL and DOUBLE weights through " +
      "the prefix_offsets aggregate == window sums") {
    // the global path runs offsets through PrefixOffsetsAgg — pin its
    // decimal (exact BigDecimal accumulation at Sum's p+10 precision)
    // and double kinds against the single-partition window form
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice").cast(DecimalType(12, 2)).as("wd"),
        col("l_quantity").cast("double").as("wf"),
        col("l_orderkey").as("k1"), col("l_linenumber").as("k2"))
    val wcum = Window.orderBy(col("k1"), col("k2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = li
      .withColumn("cwd", sum(col("wd")).over(wcum).cast(DecimalType(38, 2)))
      .withColumn("twd", sum(col("wd")).over(Window.partitionBy())
        .cast(DecimalType(38, 2)))
      .withColumn("cwf", sum(col("wf")).over(wcum))
    val viaRanks = Ranks.withPrefixSums(li, Seq.empty,
        Seq(col("k1"), col("k2")),
        Seq((col("wd"), "cwd", "twd"), (col("wf"), "cwf", "_twf")),
        parts = 9)
      .withColumn("cwd", col("cwd").cast(DecimalType(38, 2)))
      .withColumn("twd", col("twd").cast(DecimalType(38, 2)))
      .drop("_twf")
    // (k1, k2) is NOT unique in this generator's lineitem (duplicate
    // full rows exist), so per-row cums are tie-ambiguous — but tied
    // rows are IDENTICAL, so the multiset of (row, cum) is exact in
    // both forms. The double sums are over integral quantities
    // (< 2^53), hence exact too — multiset compare is precise.
    assertSameRows(viaWindow, viaRanks)
  }

  test("ranks are an exact permutation of 1..n (layout-consistency)") {
    // regression: before the localCheckpoint layout freeze, the offset
    // census and the rank join could see DIFFERENT range boundaries
    // (RangePartitioner samples per materialization) → ranks > n
    val stats = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")), "rn")
      .agg(count(lit(1)).as("n"), countDistinct(col("rn")).as("d"),
        min(col("rn")).as("lo"), max(col("rn")).as("hi"))
      .as[(Long, Long, Long, Long)].head()
    assert(stats._1 == stats._2 && stats._3 == 1L && stats._4 == stats._1,
      s"rank set not 1..n: $stats")
  }

  test("NO unpartitioned window in the plan — global rank & global " +
      "prefix sum (prefix_offsets aggregate replaced the census window)") {
    val rankPlan = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")), "rn")
      .queryExecution.executedPlan
    val psPlan = Ranks.withPrefixSum(orders, Seq.empty, Seq(col("v"), col("k")),
        col("v"), "cw", "tw")
      .queryExecution.executedPlan
    Seq("withGlobalRank" -> rankPlan, "withPrefixSum(global)" -> psPlan)
      .foreach { case (name, plan) =>
        val offenders = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        assert(offenders.isEmpty,
          s"$name plans an unpartitioned WindowExec:\n" +
            offenders.mkString("\n"))
      }
  }

  test("reliable checkpoint mode: identical ranks/prefix sums, " +
      "lineage written to the checkpoint dir") {
    val dir = tmpDir("ranks-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.ranks.checkpoint", "reliable")
    try {
      val viaWindow = orders.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      val viaRanks = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")),
        "rn", parts = 7)
      assertSameRows(viaWindow, viaRanks)
      val df = (1 to 500).map(i => (i.toLong, (i % 11 + 1).toLong))
        .toDF("id", "w")
      val wcum = Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val viaW2 = df
        .withColumn("cw", sum(col("w")).over(wcum))
        .withColumn("tw", sum(col("w")).over(Window.partitionBy()))
      val viaR2 = Ranks.withPrefixSum(df, Seq.empty, Seq(col("id")),
        col("w"), "cw", "tw", parts = 8)
      assertSameRows(viaW2, viaR2)
      // the frozen layout must actually live in reliable storage: the
      // checkpoint dir is non-empty after the actions above
      def anyFile(f: java.io.File): Boolean = {
        val kids = Option(f.listFiles).getOrElse(Array.empty)
        kids.exists(k => k.isFile || anyFile(k))
      }
      assert(anyFile(new java.io.File(dir)),
        s"reliable mode wrote nothing under $dir")
    } finally {
      spark.conf.set("spark.graft.ranks.checkpoint", "local")
    }
  }

  test("empty input yields empty output (rank + prefix sum + midrank)") {
    val empty = orders.where(lit(false))
    assert(Ranks.withGlobalRank(empty, Seq(col("v"), col("k")), "rn")
      .count() == 0)
    assert(Ranks.withPrefixSum(empty, Seq.empty, Seq(col("v"), col("k")),
      col("v"), "cw", "tw").count() == 0)
    assert(Ranks.withMidrank2(empty, Seq(col("k")), col("v"), "r2")
      .count() == 0)
  }

  test("withMidrank2s rejects mixed value types loudly") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Ranks.withMidrank2s(df, Seq.empty,
        Seq((col("a"), "ra"), (col("b"), "rb")))
    }
    assert(e.getMessage.contains("share one data type"))
  }

  test("ranks permutation invariance holds in BOTH checkpoint modes") {
    val dir = tmpDir("ranks-ckpt2")
    spark.sparkContext.setCheckpointDir(dir)
    for (mode <- Seq("local", "reliable")) {
      spark.conf.set("spark.graft.ranks.checkpoint", mode)
      try {
        val stats = Ranks.withGlobalRank(orders, Seq(col("v"), col("k")), "rn")
          .agg(count(lit(1)).as("n"), countDistinct(col("rn")).as("d"),
            min(col("rn")).as("lo"), max(col("rn")).as("hi"))
          .as[(Long, Long, Long, Long)].head()
        assert(stats._1 == stats._2 && stats._3 == 1L && stats._4 == stats._1,
          s"[$mode] rank set not 1..n: $stats")
      } finally {
        spark.conf.set("spark.graft.ranks.checkpoint", "local")
      }
    }
  }
}
