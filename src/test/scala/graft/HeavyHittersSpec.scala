package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters
import graft.sources.Tables

/** SpaceSaving heavy hitters (`approx_top_k`): exactness under
  * capacity, the frequency guarantee under eviction, and one-sided
  * (over-)estimation — across real partition merges. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables.load(spark, sfDir, "documents")
    .select(explode(split(col("text"), " ")).as("token"))

  test("exact when vocabulary fits capacity, across partial-agg merges") {
    val sketch = tokens.repartition(7)
      .agg(HeavyHitters.approxTopK(col("token"), 20, 4096).as("tk"))
      .select(posexplode(col("tk")))
      .select(($"pos" + 1).as("rank"), $"col.item".as("token"),
        $"col.cnt".as("cnt"), $"col.err".as("err"))
    val got = sketch.collect()
    assert(got.forall(_.getAs[Long]("err") == 0L), "expected exact sketch")

    val exact = tokens.groupBy("token").count()
      .orderBy($"count".desc, $"token").limit(20)
      .withColumn("rank", monotonically_increasing_id() + 1)
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("count")))
    val gotPairs = got.sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
    assert(gotPairs.toSeq == exact.toSeq, "sketch != exact top-20")
  }

  test("eviction: items above n/capacity are guaranteed present") {
    // 600 of 'hot', 60 each of 9 warm items, 600 distinct cold singletons
    val data = (Seq.fill(600)("hot") ++
      (1 to 9).flatMap(w => Seq.fill(60)(s"warm$w")) ++
      (1 to 600).map(c => s"cold$c"))
    val df = data.toDF("token").repartition(5)
    val n = data.size
    val cap = 64
    val got = df.agg(HeavyHitters.approxTopK(col("token"), 10, cap).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select($"e.item".as("item"), $"e.cnt".as("cnt"), $"e.err".as("err"))
      .collect()
    val items = got.map(_.getAs[String]("item")).toSet
    // guarantee: true count > n/cap (= ~28) → present
    assert(items.contains("hot"))
    (1 to 9).foreach(w => assert(items.contains(s"warm$w"), s"warm$w missing"))
    // one-sided estimation: reported >= true, overshoot bounded by err
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { r =>
      val t = truth(r.getAs[String]("item"))
      val c = r.getAs[Long]("cnt"); val e = r.getAs[Long]("err")
      assert(c >= t, s"${r.getAs[String]("item")}: undercount $c < $t")
      assert(c - e <= t, s"${r.getAs[String]("item")}: err bound violated")
    }
  }

  test("zero-weight insert is a no-op — no eviction at capacity") {
    val ss = new graft.functions.SpaceSaving(2)
    ss.add("a", 5L); ss.add("b", 3L)
    ss.add("c", 0L) // at capacity: must not displace an established counter
    assert(ss.sorted.map(_._1).toSet == Set("a", "b"),
      ss.sorted.mkString(", "))
    assert(ss.floor == 0L, "zero-weight insert must not raise the floor")
  }

  test("weighted: exact under capacity; one-sided overestimate under eviction") {
    // weights make the ranking differ from occurrence counts: 'light'
    // appears often with tiny weights, 'heavy' rarely with large ones
    val data = Seq.fill(50)(("light", 1L)) ++ Seq.fill(2)(("heavy", 1000L)) ++
      (1 to 30).map(i => (s"mid$i", 10L))
    val df = data.toDF("item", "w").repartition(4)

    val exactTop = df.agg(
        HeavyHitters.approxTopKWeighted($"item", $"w", 3, 1024).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.cnt", $"e.err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exactTop.head == (("heavy", 2000L, 0L)), s"got ${exactTop.head}")
    assert(exactTop(1) == (("light", 50L, 0L)))
    assert(exactTop.forall(_._3 == 0L), "under capacity the sketch is exact")

    // under eviction (capacity 8 << 32 items) the guarantee holds:
    // reported weight >= true weight, overshoot bounded by err
    val truth = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val evicted = df.agg(
        HeavyHitters.approxTopKWeighted($"item", $"w", 8, 8).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.cnt", $"e.err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    evicted.foreach { case (i, c, e) =>
      assert(c >= truth(i), s"$i: undercount $c < ${truth(i)}")
      assert(c - e <= truth(i), s"$i: err bound violated")
    }
    assert(evicted.map(_._1).contains("heavy"),
      "dominant-weight item must survive eviction")

    // SQL registration
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("tkw_in")
    val viaSql = spark.sql(
      "SELECT approx_top_k_weighted(item, w, 1, 1024)[0].item AS top FROM tkw_in")
      .head().getString(0)
    assert(viaSql == "heavy")
  }
}
