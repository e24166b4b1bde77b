package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMin, CountMinBuf}
import graft.sources.Tables

/** Count-Min sketch: distributed merge == sequential single-buffer
  * ingest (bit-exact, not just within bounds), the one-sided estimate
  * guarantee, serde round-trip, and weighted/zero-weight semantics. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables.load(spark, sfDir, "documents")
    .select(explode(split(col("text"), " ")).as("tok"))

  private def localBuf(items: Seq[(String, Long)], depth: Int = 4,
                       width: Int = 512): CountMinBuf = {
    val b = new CountMinBuf(depth, width, 42L)
    items.foreach { case (t, w) => b.add(t, w) }
    b
  }

  test("distributed sketch == sequential ingest, estimates one-sided") {
    val toks = tokens.as[String].collect().toSeq
    val reference = localBuf(toks.map(_ -> 1L))

    val skBytes = tokens.repartition(7)
      .agg(CountMin.sketchAgg(col("tok"), lit(1L)).as("sk"))
      .as[Array[Byte]].head()
    val distributed = CountMinBuf.deserialize(skBytes)

    assert(distributed.cells.toSeq == reference.cells.toSeq,
      "partition merge diverged from sequential ingest")

    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, c) =>
      val est = distributed.estimate(t)
      assert(est >= c, s"under-estimate for '$t': $est < $c")
      assert(est == reference.estimate(t))
    }
  }

  test("estimate expression matches buffer math through codegen") {
    val sk = tokens.agg(CountMin.sketchAgg(col("tok"), lit(1L)).as("sk"))
    val probes = tokens.distinct().limit(10)
    val viaExpr = probes.crossJoin(broadcast(sk))
      .select(col("tok"), CountMin.estimate(col("sk"), col("tok")).as("est"))
      .as[(String, Long)].collect().toMap
    val buf = CountMinBuf.deserialize(sk.as[Array[Byte]].head())
    viaExpr.foreach { case (t, est) => assert(est == buf.estimate(t)) }
  }

  test("serde round-trip preserves cells") {
    val b = localBuf(Seq("a" -> 3L, "b" -> 1L, "c" -> 7L), depth = 3, width = 16)
    val back = CountMinBuf.deserialize(CountMinBuf.serialize(b))
    assert(back.depth == 3 && back.width == 16 && back.seed == 42L)
    assert(back.cells.toSeq == b.cells.toSeq)
  }

  test("weighted updates add; zero weight is a no-op") {
    val b = new CountMinBuf(4, 64, 42L)
    b.add("x", 5L)
    val snapshot = b.cells.clone()
    b.add("y", 0L)
    assert(b.cells.toSeq == snapshot.toSeq, "zero-weight update mutated cells")
    b.add("x", 2L)
    assert(b.estimate("x") >= 7L)
  }

  test("merge rejects shape or seed mismatch") {
    val a = new CountMinBuf(4, 64, 42L)
    intercept[IllegalArgumentException](a.mergeFrom(new CountMinBuf(4, 32, 42L)))
    intercept[IllegalArgumentException](a.mergeFrom(new CountMinBuf(4, 64, 7L)))
  }

  test("unseen item estimate equals replayed collision mass") {
    val b = localBuf(Seq("alpha" -> 10L, "beta" -> 4L))
    // deterministic: whatever lands in 'zzz-unseen's cells is exactly
    // what an independent replay computes — no probabilistic assertion
    val replay = localBuf(Seq("alpha" -> 10L, "beta" -> 4L))
    assert(b.estimate("zzz-unseen") == replay.estimate("zzz-unseen"))
    assert(b.estimate("zzz-unseen") >= 0L)
  }
}
