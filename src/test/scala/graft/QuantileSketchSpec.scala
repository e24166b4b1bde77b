package graft

import org.apache.spark.sql.functions._

import graft.functions.{DDSketchBuf, QuantileSketch}
import graft.sources.Tables

/** DDSketch quantiles: the relative-error guarantee against exact
  * order statistics, merge == build-over-union across real partition
  * merges, the SQL surface, empty/negative/zero handling, and per-key
  * quantile state in the sketch store (quantileState/quantileMerge). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("relative-error guarantee vs exact order statistic, skewed data") {
    val buf = new DDSketchBuf(0.01, 4096)
    // log-uniform spread over 6 decades + negatives + zeros
    val xs = (1 to 20000).map(i => math.exp(i % 137 / 10.0)) ++
      (1 to 500).map(i => -i * 3.7) ++ Seq.fill(100)(0.0)
    xs.foreach(buf.add)
    val sorted = xs.sorted.toIndexedSeq
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val exact = sorted(((q * (xs.size - 1))).toInt)
      val est = buf.quantile(q)
      val tol = 0.0101 * math.max(math.abs(exact), 1e-12)
      assert(math.abs(est - exact) <= tol ||
        // rank can straddle two order stats; accept either neighbor
        math.abs(est - sorted(math.min(((q * (xs.size - 1))).toInt + 1,
          xs.size - 1))) <= tol,
        s"q=$q exact=$exact est=$est")
    }
  }

  test("sparse data: interpolates between bracketing order statistics") {
    // {1, 3}: the median is 2 under percentile_cont semantics; the
    // floor-rank statistic alone would answer ~1 (a 50% error no α
    // bound excuses)
    val buf = new DDSketchBuf(0.01, 4096)
    Seq(1.0, 3.0).foreach(buf.add)
    assert(math.abs(buf.quantile(0.5) - 2.0) <= 0.04,
      s"expected ~2.0, got ${buf.quantile(0.5)}")
    // endpoints stay exact order statistics (within α)
    assert(math.abs(buf.quantile(0.0) - 1.0) <= 0.011)
    assert(math.abs(buf.quantile(1.0) - 3.0) <= 0.031)
  }

  test("merge == build-over-union; aggregate folds across partitions") {
    val xs = (1 to 10000).map(i => (i % 997) * 0.37 + 1.0)
    val whole = new DDSketchBuf(0.01, 4096)
    xs.foreach(whole.add)
    val (l, r) = xs.splitAt(3000)
    val a = new DDSketchBuf(0.01, 4096); l.foreach(a.add)
    val b = new DDSketchBuf(0.01, 4096); r.foreach(b.add)
    a.mergeFrom(b)
    assert(a.count == whole.count)
    for (q <- (0 to 20).map(_ * 0.05))
      assert(a.quantile(q) == whole.quantile(q), s"merge diverges at q=$q")

    // through the aggregate, across a real repartition (partial merges)
    val fromAgg = xs.toDF("x").repartition(7)
      .agg(QuantileSketch.sketchAgg($"x").as("sk"))
      .select(QuantileSketch.quantile($"sk", 0.5).as("p50"))
      .head().getDouble(0)
    assert(fromAgg == whole.quantile(0.5))
  }

  test("NaN inputs are skipped, not misfiled as zeros") {
    val buf = new DDSketchBuf(0.01, 1024)
    Seq(5.0, Double.NaN, 7.0, Double.NaN).foreach(buf.add)
    assert(buf.count == 2 && buf.zeroCount == 0)
    assert(math.abs(buf.quantile(1.0) - 7.0) <= 0.08)
  }

  test("serialization roundtrip; empty sketch reads null") {
    val buf = new DDSketchBuf(0.02, 1024)
    Seq(1.0, -2.5, 0.0, 1e9, 1e-9).foreach(buf.add)
    val back = DDSketchBuf.deserialize(buf.serialize())
    for (q <- Seq(0.0, 0.5, 1.0))
      assert(back.quantile(q) == buf.quantile(q))

    val nullOut = Seq.empty[Double].toDF("x")
      .agg(QuantileSketch.sketchAgg($"x").as("sk"))
      .select(QuantileSketch.quantile($"sk", 0.5).as("p50"))
      .head()
    assert(nullOut.isNullAt(0), "empty sketch must read as null quantile")

    // an empty-group MERGE output is empty bytes, and re-merging it is
    // a no-op — it must never invent an alpha that poisons real states
    val viaMerge = Seq.empty[Array[Byte]].toDF("sk")
      .agg(QuantileSketch.merge($"sk").as("m"))
      .select(QuantileSketch.quantile($"m", 0.5).as("p50")).head()
    assert(viaMerge.isNullAt(0))
    val alpha05 = new DDSketchBuf(0.05, 1024); Seq(3.0, 9.0).foreach(alpha05.add)
    val remerged = Seq(Array.emptyByteArray, alpha05.serialize())
      .toDF("sk").agg(QuantileSketch.merge($"sk").as("m"))
      .select(QuantileSketch.quantile($"m", 1.0).as("mx")).head()
    assert(math.abs(remerged.getDouble(0) - 9.0) <= 9.0 * 0.051,
      "empty state merged with a non-default-alpha sketch must not throw")
  }

  test("SQL surface: dd_sketch_agg / dd_sketch_merge / dd_sketch_quantile") {
    GraftExtensions.register(spark)
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("qs_li")
    val row = spark.sql(
      """SELECT dd_sketch_quantile(dd_sketch_merge(sk), 0.5d) AS p50 FROM (
        |  SELECT l_returnflag, dd_sketch_agg(l_extendedprice, 0.01d) AS sk
        |  FROM qs_li GROUP BY l_returnflag
        |)""".stripMargin).head()
    val est = row.getDouble(0)
    val exact = Tables.load(spark, sfDir, "lineitem")
      .selectExpr("percentile(l_extendedprice, 0.5) AS p").head().getDouble(0)
    assert(math.abs(est - exact) / exact <= 0.021,
      s"merged-sketch p50 $est vs exact $exact")
  }

  test("sketch store: per-key quantile state merges across batches") {
    import graft.streaming.SketchStateStore
    val state = tmpDir("graft-ddstate")
    val store = new SketchStateStore(state, Seq("k"), Seq("lat"),
      buckets = 4, mergeAgg = _ => QuantileSketch.merge)
    def batchOf(rows: (String, Double)*) = rows.toSeq.toDF("k", "v")
      .groupBy("k").agg(QuantileSketch.sketchAgg($"v").as("lat"))
    assert(store.mergeOnce(batchOf(
      ("a", 10.0), ("a", 20.0), ("b", 5.0)), batchId = 0))
    assert(store.mergeOnce(batchOf(
      ("a", 30.0), ("a", 40.0), ("b", 7.0)), batchId = 1))
    val got = store.read(spark).get
      .select($"k", QuantileSketch.quantile($"lat", 0.5).as("p50"),
        QuantileSketch.quantile($"lat", 1.0).as("max"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // α=1% buckets, percentile_cont semantics: median of {10,20,30,40}
    // interpolates to 25, of {5,7} to 6; max stays the top statistic
    assert(math.abs(got("a")._1 - 25.0) <= 0.5, s"got ${got("a")}")
    assert(math.abs(got("a")._2 - 40.0) <= 0.5)
    assert(math.abs(got("b")._1 - 6.0) <= 0.12)
  }
}
