package graft

import org.apache.spark.sql.functions._

import graft.operators.GapFill

/** Gap filling: dense per-group axis, fill values, boundary ticks. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("per-group dense axis with custom fill; spans do not leak across groups") {
    // group a: events at t=0 and t=25 (step 10 → ticks 0,10,20)
    // group b: single event at t=100 → exactly one tick
    val df = Seq(("a", 0L), ("a", 25L), ("b", 100L))
      .toDF("g", "sec").withColumn("ts", col("sec").cast("timestamp"))
    val got = GapFill.fillTimeSeries(df, "ts", Seq("g"),
        aggs = Map("n" -> count(lit(1)), "mx" -> max(col("sec"))),
        stepSec = 10L, fill = Map("mx" -> lit(-1L)))
      .select(col("g"), unix_timestamp(col("tick")).as("t"), col("n"), col("mx"))
      .orderBy("g", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 0L, 1L, 0L),     // observed
      ("a", 10L, 0L, -1L),   // gap: count default 0, custom fill -1
      ("a", 20L, 1L, 25L),   // 25 floors into tick 20
      ("b", 100L, 1L, 100L)  // single-event group: a one-tick axis
    ), got.toSeq.toString)
  }

  test("negative epochs floor to the tick at-or-before the event") {
    // -30 s (1969-12-31T23:59:30) with step 60 belongs to tick -60
    // (23:59:00), not 0 — truncation toward zero would bucket it FORWARD
    val df = Seq(("a", -30L), ("a", -90L), ("a", 30L))
      .toDF("g", "sec").withColumn("ts", col("sec").cast("timestamp"))
    val got = GapFill.fillTimeSeries(df, "ts", Seq("g"),
        aggs = Map("n" -> count(lit(1))), stepSec = 60L)
      .select(unix_timestamp(col("tick")).as("t"), col("n"))
      .orderBy("t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((-120L, 1L), (-60L, 1L), (0L, 1L)),
      got.toSeq.toString)
  }

  test("invalid arguments fail loudly") {
    val df = Seq(("a", 0L)).toDF("g", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    intercept[IllegalArgumentException] {
      GapFill.fillTimeSeries(df, "ts", Seq("g"), Map("n" -> count(lit(1))), 0L)
    }
    intercept[IllegalArgumentException] {
      GapFill.fillTimeSeries(df, "ts", Seq("g"), Map.empty, 10L)
    }
  }

  test("timeDecayedAvg: recency dominates; equal times degenerate to plain avg") {
    import graft.operators.Decay
    def run(rows: Seq[(String, Double, Double)]): Map[String, Double] =
      Decay.timeDecayedAvg(rows.toDF("g", "tsec", "v"), "tsec", "v",
          Seq("g"), tauSec = 10.0)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = run(Seq(
      ("same", 100.0, 2.0), ("same", 100.0, 4.0),   // equal ts → plain avg
      ("rec", 0.0, 1000.0), ("rec", 200.0, 1.0)))   // 20τ gap → old ~ 0
    assert(math.abs(got("same") - 3.0) < 1e-12)
    assert(math.abs(got("rec") - 1.0) < 1e-5,
      s"stale value must decay away, got ${got("rec")}")
    intercept[IllegalArgumentException] {
      Decay.timeDecayedAvg(Seq(("a", 1.0, 1.0)).toDF("g", "tsec", "v"),
        "tsec", "v", Seq("g"), tauSec = 0.0)
    }
  }
}
