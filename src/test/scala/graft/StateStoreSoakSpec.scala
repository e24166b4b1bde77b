package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.ParquetStateStore

/** Endurance evidence for the ReplacingMergeTree-analog claim
  * (`streaming/ParquetStateStore`): the per-feature specs in
  * StreamingSpec prove restart/fence/vacuum correctness once each;
  * this soak drives ONE THOUSAND fenced micro-batches through the
  * merge path — the reference's high-volume CDC intent
  * (`large_dbtable_example/start-high-volume-cdc.sh` sustains a
  * change firehose for minutes) — with periodic vacuum and tombstone
  * compaction, and asserts the three things that only show up under
  * endurance:
  *
  *  1. EXACT state after 1000 merges (driver-tracked last-writer-wins
  *     oracle, ~10% deletes mixed in);
  *  2. BOUNDED storage: after the final vacuum every on-disk bucket
  *     dir is manifest-referenced — 1000 epochs of superseded copies
  *     were actually reclaimed, not leaked;
  *  3. STABLE latency: the median merge near the end is within 3× of
  *     the median near the start — merge cost tracks dirty-bucket
  *     bytes, not batch count (no epoch-list or manifest growth term).
  *
  * `SPARK_GRAFT_SOAK_BATCHES` overrides the batch count (dev loop).
  */
class StateStoreSoakSpec extends SparkSpec {
  import spark.implicits._

  private val nBatches =
    sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "1000").toInt

  test(s"$nBatches-micro-batch soak: exact state, bounded storage, stable latency") {
    val state = tmpDir("graft-soak")
    val store = new ParquetStateStore(state, keys = Seq("id"),
      versionCols = Seq("v"), deletedCol = Some("__deleted"), buckets = 8)

    val rng = new scala.util.Random(20260815L)
    val keyspace = 400
    // driver-side oracle: id -> (version, payload, deleted)
    val expect = scala.collection.mutable.Map.empty[Int, (Long, String, Boolean)]
    val latency = new Array[Double](nBatches)
    var v = 0L
    for (b <- 0 until nBatches) {
      val rows = (0 until 20).map { _ =>
        val id = rng.nextInt(keyspace)
        v += 1
        val del = rng.nextInt(10) == 0
        val row = (id, v, s"p$v", del)
        expect(id) = (v, s"p$v", del)
        row
      }
      val df = rows.toDF("id", "v", "payload", "__deleted")
      val t0 = System.nanoTime()
      assert(store.mergeOnce(df, b), s"fence rejected fresh batch $b")
      latency(b) = (System.nanoTime() - t0) / 1e9
      // periodic maintenance, the cadence a production sink would run:
      // vacuum often (cheap, file deletes), compact tombstones rarely
      // (rewrites live state). Versions only grow here, so forgetting
      // every tombstone is safe (safeToForget = true).
      if (b % 64 == 63) store.purgeTombstones(spark, lit(true))
      if (b % 8 == 7) store.vacuum(spark, graceMs = 0L)
    }
    store.vacuum(spark, graceMs = 0L)

    // 1. exact state (tombstones hidden from read)
    val got = store.read(spark).get
      .select(col("id").cast("int"), col("v").cast("long"), col("payload"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getString(2))))
      .toMap
    val want = expect.collect {
      case (id, (ver, p, deleted)) if !deleted => (id, (ver, p))
    }.toMap
    assert(got == want,
      s"state diverged after $nBatches merges: " +
        s"${(got.keySet -- want.keySet).size} extra, " +
        s"${(want.keySet -- got.keySet).size} missing, " +
        s"${want.count { case (k, p) => got.get(k).exists(_ != p) }} stale")

    // 2. bounded storage: nothing on disk but the live buckets
    import scala.jdk.CollectionConverters._
    val onDisk = Files.walk(Paths.get(state)).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("__gbucket="))
      .size
    val live = scala.io.Source.fromFile(s"$state/_CURRENT").getLines()
      .drop(1).count(_.nonEmpty)
    assert(onDisk == live,
      s"$onDisk bucket dirs on disk, $live referenced — " +
        s"soak leaked superseded epochs")

    // 3. stable latency: median of the last 100 vs the first 100
    // (medians are robust to one-off GC pauses; a per-batch cost that
    // grows with batch count — epoch scans, manifest bloat — would
    // blow far past 3x over a 10x-longer run than any feature spec)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val head = median(latency.take(100).toSeq)
    val tail = median(latency.takeRight(100).toSeq)
    assert(tail <= head * 3.0 + 0.05,
      f"per-merge latency drifted: first-100 median $head%.3fs -> " +
        f"last-100 median $tail%.3fs")
    info(f"soak: $nBatches merges, median head $head%.3fs tail $tail%.3fs, " +
      f"final state ${want.size} keys, $live live buckets")
  }
}
