package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Funnel
import graft.sources.Tables

/** WindowFunnel aggregate: differential vs an in-memory reference
  * implementation of the documented anchored-greedy strict-increase
  * semantics, boundary behavior, partial-agg merge invariance, the SQL
  * registration, and the retention flags. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val week = 7L * 86400 * 1000000

  private val steps = Seq("signup", "view", "click", "purchase")

  /** Plain-Scala reference: t1 = min step-1 ts; t_{i+1} = min step-(i+1)
    * ts with ts > t_i and ts <= t1 + window. */
  private def refLevel(events: Seq[(Long, String)], window: Long): Int = {
    val t1 = events.collect { case (t, e) if e == steps.head => t }
      .minOption.getOrElse(return 0)
    var lvl = 1
    var cur = t1
    var advanced = true
    while (lvl < steps.size && advanced) {
      val next = events.collect {
        case (t, e) if e == steps(lvl) && t > cur && t <= t1 + window => t
      }.minOption
      next match {
        case Some(t) => cur = t; lvl += 1
        case None => advanced = false
      }
    }
    lvl
  }

  private def funnelOf(df: DataFrame, window: Long): DataFrame =
    df.groupBy(col("user_id"))
      .agg(Funnel.windowFunnel(col("tus"), window,
        steps.map(col("event_type") === _)).as("level"))

  test("differential vs reference semantics on the events table") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val got = funnelOf(ev, week).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level")).toMap

    val raw = ev.collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("tus"), r.getAs[String]("event_type"))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).toSeq }
    val want = raw.map { case (u, evs) => u -> refLevel(evs, week) }

    assert(got == want)
  }

  test("merge invariance: level is a pure function of the event set") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val base = funnelOf(ev, week)
    for (parts <- Seq(1, 7)) {
      assertSameRows(base, funnelOf(ev.repartition(parts), week))
    }
  }

  test("boundaries: window end inclusive, strict increase, no anchor") {
    def lvl(rows: (Long, Long, String)*): Map[Long, Int] =
      funnelOf(rows.toSeq.toDF("user_id", "tus", "event_type"), 100L)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level"))
        .toMap

    val got = lvl(
      // u1: step2 exactly at anchor+window → counts (<=)
      (1L, 0L, "signup"), (1L, 100L, "view"),
      // u2: step2 just past the window → level stays 1
      (2L, 0L, "signup"), (2L, 101L, "view"),
      // u3: same timestamp cannot chain (strict >)
      (3L, 50L, "signup"), (3L, 50L, "view"),
      // u4: no step-1 event at all → 0
      (4L, 10L, "view"), (4L, 20L, "click"),
      // u5: anchor is the EARLIEST signup; the later signup at t=90
      //     does not re-anchor, so the view at t=150 is out of window
      (5L, 0L, "signup"), (5L, 90L, "signup"), (5L, 150L, "view"),
      // u6: steps may interleave with noise and later steps before
      //     earlier ones are ignored
      (6L, 0L, "click"), (6L, 10L, "signup"), (6L, 11L, "error"),
      (6L, 20L, "view"), (6L, 30L, "click"), (6L, 40L, "purchase"))

    assert(got == Map(1L -> 2, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 4))
  }

  test("SQL registration: window_funnel(ts, bits, window, steps)") {
    GraftExtensions.register(spark)
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    ev.createOrReplaceTempView("funnel_events")
    val bits = steps.zipWithIndex.map { case (e, i) =>
      s"IF(event_type = '$e', ${1 << i}, 0)"
    }.mkString(" | ")
    val viaSql = spark.sql(
      s"""SELECT user_id, window_funnel(tus, $bits, ${week}L, 4) AS level
         |FROM funnel_events GROUP BY user_id""".stripMargin)
    assertSameRows(viaSql, funnelOf(ev, week))
  }

  test("retention flags: anchor + co-occurrence, not ordering") {
    val rows = Seq(
      // u1: anchor + both conditions
      (1L, "signup"), (1L, "click"), (1L, "purchase"),
      // u2: purchase BEFORE signup still counts (co-occurrence)
      (2L, "purchase"), (2L, "signup"),
      // u3: no anchor → all flags 0 even though conditions fired
      (3L, "click"), (3L, "purchase"),
      // u4: anchor only
      (4L, "signup"))
      .toDF("user_id", "event_type")
    val flags = Funnel.retentionFlags(Seq(
      col("event_type") === "signup",
      col("event_type") === "click",
      col("event_type") === "purchase"))
    val got = rows.groupBy("user_id")
      .agg(flags(0).as("r1"), flags(1).as("r2"), flags(2).as("r3"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("r1"), r.getAs[Int]("r2"), r.getAs[Int]("r3"))))
      .toMap
    assert(got == Map(
      1L -> ((1, 1, 1)), 2L -> ((1, 0, 1)), 3L -> ((0, 0, 0)),
      4L -> ((1, 0, 0))))
  }

  /** Greedy non-overlapping subsequence counter — the documented
    * SequenceCount semantics, re-implemented trivially. */
  private def refSeqCount(events: Seq[(Long, String)], chain: Seq[String]): Long = {
    val bitsOf = chain.zipWithIndex.toMap
    val sorted = events.flatMap { case (t, e) =>
      bitsOf.get(e).map(i => (t, 1 << i)) }
      .sortBy(identity)
    var lvl = 0; var count = 0L
    sorted.foreach { case (_, b) =>
      if ((b & (1 << lvl)) != 0) {
        lvl += 1
        if (lvl == chain.size) { count += 1; lvl = 0 }
      }
    }
    count
  }

  test("sequence_count: differential vs reference on the events table") {
    val chain = Seq("view", "click", "purchase")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val got = ev.groupBy(col("user_id"))
      .agg(Funnel.sequenceCount(col("tus"),
        chain.map(col("event_type") === _)).as("c"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("c")).toMap
    val want = ev.collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("tus"), r.getAs[String]("event_type"))))
      .groupBy(_._1).map { case (u, rows) =>
        u -> refSeqCount(rows.map(_._2).toSeq, chain) }
    assert(got == want)
    // sequenceMatch is count >= 1
    val matched = ev.groupBy(col("user_id"))
      .agg(Funnel.sequenceMatch(col("tus"),
        chain.map(col("event_type") === _)).as("m"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("m")).toMap
    assert(matched == want.map { case (u, c) => u -> (c >= 1) })
  }

  test("sequence_count: non-overlapping greedy boundaries") {
    def run(evs: Seq[(Long, Long, String)]): Map[Long, Long] =
      evs.toDF("user_id", "tus", "e")
        .groupBy("user_id")
        .agg(Funnel.sequenceCount(col("tus"),
          Seq(col("e") === "a", col("e") === "b")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(Seq(
      // u1: a b a b — two disjoint completions
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      // u2: a a b b — chains don't interleave: one completion
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "b"), (2L, 4L, "b"),
      // u3: b a — order matters: zero
      (3L, 1L, "b"), (3L, 2L, "a"),
      // u4: equal timestamps chain in deterministic (ts, bits) order
      (4L, 5L, "a"), (4L, 5L, "b")))
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("sequence_count: merge invariance across partitionings") {
    val chain = Seq("view", "click", "purchase")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    def run(parts: Int): Map[Long, Long] =
      ev.repartition(parts).groupBy(col("user_id"))
        .agg(Funnel.sequenceCount(col("tus"),
          chain.map(col("event_type") === _)).as("c"))
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("c")).toMap
    // the greedy scan runs on a sorted buffer, so the partial-merge
    // arrival order (which varies with partitioning) must not matter
    assert(run(1) == run(7))
  }

  test("SQL registration: sequence_count(ts, bits, steps)") {
    graft.GraftExtensions.register(spark)
    Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 1), (1L, 4L, 2))
      .toDF("u", "tus", "bits").createOrReplaceTempView("seq_ev")
    val c = spark.sql(
      "SELECT sequence_count(tus, bits, 2) AS c FROM seq_ev GROUP BY u")
      .head().getLong(0)
    assert(c == 2L)
  }

  test("sequence_count_t: unconstrained gaps reproduce sequence_count exactly") {
    val chain = Seq("view", "click", "purchase")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val conds = chain.map(col("event_type") === _)
    val both = ev.groupBy(col("user_id"))
      .agg(Funnel.sequenceCount(col("tus"), conds).as("plain"),
        Funnel.sequenceCountTimed(col("tus"), conds,
          Seq(Long.MaxValue, Long.MaxValue)).as("timed"))
      .where(col("plain") =!= col("timed"))
    assert(both.count() == 0,
      "MaxValue gaps must degenerate to the untimed operator")
  }

  test("sequence_count_t: timeout kills the chain; timed-out event can restart") {
    def run(evs: Seq[(Long, Long, String)], g1: Long, g2: Long): Map[Long, Long] =
      evs.toDF("user_id", "tus", "e")
        .groupBy("user_id")
        .agg(Funnel.sequenceCountTimed(col("tus"),
          Seq(col("e") === "a", col("e") === "b", col("e") === "c"),
          Seq(g1, g2)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(Seq(
      // u1: a(0) b(5) c(10) — both gaps within 10: one completion
      (1L, 0L, "a"), (1L, 5L, "b"), (1L, 10L, "c"),
      // u2: a(0) b(20) — first gap 20 > 10: b cannot chain; zero
      (2L, 0L, "a"), (2L, 20L, "b"), (2L, 25L, "c"),
      // u3: a(0) b(5) c(30) — second gap 25 > 10: dies at level 2
      (3L, 0L, "a"), (3L, 5L, "b"), (3L, 30L, "c"),
      // u4: a(0) ... a(50) b(55) c(60) — first chain times out; the
      // SECOND a restarts and completes
      (4L, 0L, "a"), (4L, 50L, "a"), (4L, 55L, "b"), (4L, 60L, "c"),
      // u5: boundary — gap exactly equal is allowed (<=)
      (5L, 0L, "a"), (5L, 10L, "b"), (5L, 20L, "c")),
      g1 = 10L, g2 = 10L)
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L), s"$got")
  }

  test("sequence_count_t: merge invariance + SQL registration") {
    graft.GraftExtensions.register(spark)
    val chain = Seq("view", "click", "purchase")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val conds = chain.map(col("event_type") === _)
    def run(parts: Int): Map[Long, Long] =
      ev.repartition(parts).groupBy(col("user_id"))
        .agg(Funnel.sequenceCountTimed(col("tus"), conds,
          Seq(1800000000L, 3600000000L)).as("n"))
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(run(1) == run(7))

    Seq((1L, 0L, 1), (1L, 5L, 2), (1L, 100L, 1), (1L, 102L, 2))
      .toDF("u", "tus", "bits").createOrReplaceTempView("seqt_ev")
    val c = spark.sql(
      "SELECT sequence_count_t(tus, bits, 2, 6L) AS c FROM seqt_ev GROUP BY u")
      .head().getLong(0)
    assert(c == 2L, "both pairs chain within gap 6")
  }
}
